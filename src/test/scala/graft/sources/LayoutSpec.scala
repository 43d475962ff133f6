package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Z-order layout's reason to exist is row-group skipping: a scan
  * filtering on EITHER interleaved key must read a small fraction of a
  * z-ordered table, where an unsorted layout reads all of it. This spec
  * proves the skip with parquet scan metrics, and pins rangeBucket's
  * exact-arithmetic contract at key ranges a double (or a long product)
  * could not survive. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("rangeBucket is exact at extreme long magnitudes") {
    val s = spark
    import s.implicits._
    // range spanning most of the long domain: (v - mn) overflows a
    // long, (v - mn) << bits overflows anything short of 128-bit —
    // the regimes the decimal formulation exists for
    val mn = Long.MinValue + 3
    val mx = Long.MaxValue - 5
    val bits = 16
    val vs = Seq(mn, mn + 1, -1L, 0L, 1L, mx / 3, mx - 1, mx)
    val got = vs.toDF("v")
      .select(Layout.rangeBucket(col("v"), lit(mn), lit(mx), bits).as("b"))
      .collect().map(_.getLong(0))
    val width = (BigInt(mx) - BigInt(mn) + 1)
    val want = vs.map(v => ((BigInt(v) - BigInt(mn)) * BigInt(1L << bits) / width).toLong)
    assert(got.toSeq == want)
    assert(got.forall(b => b >= 0 && b < (1L << bits)))
  }

  test("zValue matches a driver-side Morton reference on small keys") {
    val s = spark
    import s.implicits._
    val rows = for { x <- 0 until 8; y <- 0 until 8 } yield (x.toLong, y.toLong)
    val got = Layout.zValue(rows.toDF("x", "y"), "x", "y", 3)
      .select("x", "y", "zval").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    def morton(x: Long, y: Long): Long =
      (0 until 3).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum
    rows.foreach { case (x, y) =>
      // keys span [0,7] so bucket id == key with bits=3
      assert(got((x, y)) == morton(x, y), s"($x,$y)")
    }
  }

  /** Rows the scan node actually emitted (post row-group/page skip). */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case scan: org.apache.spark.sql.execution.FileSourceScanExec =>
        scan.metrics("numOutputRows").value
    }.sum
  }

  test("z-ordered layout skips >=4x row groups on BOTH filter dimensions") {
    val s = spark
    import s.implicits._
    val n = 1 << 18 // 256k rows, two independent uniform keys in [0, 4096)
    val df = spark.range(n.toLong).select(
      col("id"),
      pmod(graft.functions.Hashing.hash60(concat(lit("k1:"), col("id"))), lit(4096L)).as("k1"),
      pmod(graft.functions.Hashing.hash60(concat(lit("k2:"), col("id"))), lit(4096L)).as("k2"))
    val base = java.nio.file.Files.createTempDirectory("layout_skip").toString
    val zPath = s"$base/zorder"
    val uPath = s"$base/unsorted"
    Layout.writeZOrdered(df, zPath, "k1", "k2", bits = 12, numFiles = 64)
    df.repartition(64, col("id")).write.parquet(uPath)

    val zdf = spark.read.parquet(zPath)
    val udf = spark.read.parquet(uPath)
    for (key <- Seq("k1", "k2")) {
      val pred = col(key) < 64 // 1/64 of the key range
      val zRead = scanRows(zdf.filter(pred))
      val uRead = scanRows(udf.filter(pred))
      // identical answers either way
      assert(zdf.filter(pred).count() == udf.filter(pred).count())
      assert(uRead >= 4 * zRead,
        s"$key: z-ordered scan read $zRead rows vs unsorted $uRead — no skip")
    }
  }
}
