package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Hive-style partitioning (Sinks.writePartitioned) prunes on ONE
  * column hierarchy; range-sorting a file prunes on ONE sort key.
  * Z-ordering interleaves the bits of several keys' range-bucket ids
  * so that rows close in EVERY dimension land close in the file order
  * — parquet row-group min/max zone maps then stay narrow for all the
  * interleaved columns at once, and a scan filtering on ANY of them
  * skips most row groups. This is the standard lakehouse layout trick
  * for 100 TB fact tables queried along several independent keys.
  *
  * Everything here is deterministic integer math (equi-width bucketing
  * over the global min/max, bit interleave) — no sampling, no RDD
  * `zipWithIndex`, so the layout reproduces bit-for-bit on any cluster
  * and the z-value doubles as an engine-portable oracle surface.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * longs: bit i of `x` → bit 2i, bit i of `y` → bit 2i+1. Pure
    * bitwise Column ops — codegen'd, no UDF. */
  def interleaveBits(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Equi-width bucket id in [0, 2^bits) of an integer column over the
    * closed global range [mn, mx]: `(v - mn) * 2^bits div (mx - mn + 1)`
    * — and < 2^bits for every in-range v without clamping. Both the
    * product and the division run in DECIMAL(38,0): the product can
    * never overflow (≤ 2^63 · 2^31 < 10^38) and the integral division
    * is exact at any magnitude, so the result matches DuckDB's integer
    * `//` bit-for-bit with no double-rounding regime to validate.
    * Operands are non-negative, so truncating division == floor. */
  def rangeBucket(v: Column, mn: Column, mx: Column, bits: Int): Column = {
    // operands enter decimal BEFORE any arithmetic: even the (v - mn)
    // difference can overflow a long when the key range spans most of
    // the long domain
    val d = (c: Column) => c.cast("decimal(38,0)")
    val exact = call_function("div",
      (d(v) - d(mn)) * lit(1L << bits),
      d(mx) - d(mn) + lit(1L))
    // Fast path: when (mx-mn+1)·2^bits fits a long — every realistic
    // key range — the same quotient in pure long arithmetic, which
    // codegens to two integer ops instead of a Decimal128 chain. The
    // decimal branch only evaluates (codegen if/else) on ranges wider
    // than 2^(63-bits), where long math would overflow.
    // the guard itself must not overflow: a range spanning most of the
    // long domain overflows even the (mx - mn) difference under ANSI
    val safe = (d(mx) - d(mn)) < lit((Long.MaxValue >> bits) - 1)
    when(safe, call_function("div", (v - mn) * lit(1L << bits), mx - mn + lit(1L)))
      .otherwise(exact.cast("long"))
  }

  /** Adds `zval` — the interleave of the two keys' range-bucket ids
    * (`bits` bits each, so zval < 2^(2·bits)). One global min/max
    * aggregate (a single scalar row) broadcasts back over the data;
    * the bucket+interleave itself is map-side arithmetic. */
  def zValue(df: DataFrame, c1: String, c2: String, bits: Int): DataFrame = {
    val bounds = df.agg(
      min(col(c1).cast("long")).as("__mn1"), max(col(c1).cast("long")).as("__mx1"),
      min(col(c2).cast("long")).as("__mn2"), max(col(c2).cast("long")).as("__mx2"))
    // bucket ids materialize in their own projection: the interleave
    // references each bucket `bits` times, and inlining would make
    // every bit term re-run the whole bucket division chain (the
    // non-cheap expressions also keep CollapseProject from re-inlining)
    df.crossJoin(broadcast(bounds))
      .withColumn("__b1",
        rangeBucket(col(c1).cast("long"), col("__mn1"), col("__mx1"), bits))
      .withColumn("__b2",
        rangeBucket(col(c2).cast("long"), col("__mn2"), col("__mx2"), bits))
      .withColumn("zval", interleaveBits(col("__b1"), col("__b2"), bits))
      .drop("__mn1", "__mx1", "__mn2", "__mx2", "__b1", "__b2")
  }

  /** Writes `df` as parquet z-ordered on (c1, c2): range-partitioned
    * into `numFiles` contiguous z-ranges, z-sorted within each — so
    * row-group zone maps are narrow in BOTH keys and scans filtering
    * on either skip most of the table. */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
                    bits: Int = 12, numFiles: Int = 64,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    zValue(df, c1, c2, bits)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode(mode).parquet(path)

  /** SQL fragment mirroring [[interleaveBits]] over bucket-id
    * expressions (for the DuckDB oracle): a sum of disjoint-bit
    * terms. */
  def interleaveSql(bx: String, by: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($bx) // ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"((($by) // ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }.mkString("(", " + ", ")")
}
