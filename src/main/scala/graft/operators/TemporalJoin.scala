package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal joins the reference lacks entirely (SURVEY.md §2 "absent
  * categories" — joins): as-of join and point-in-interval range join,
  * both formulated to avoid the inequality-join trap.
  *
  * A naive `a.join(b, a.ts >= b.ts)` plans as a broadcast-nested-loop
  * or cartesian range product — O(|a|·|b|) and a guaranteed 100 TB
  * wreck. Both operators here reduce to equi-join/window machinery:
  * one hash shuffle + one sort, fully whole-stage-codegen'd.
  */
object TemporalJoin {

  /** As-of join (DuckDB `ASOF JOIN` / kdb `aj` semantics): for every
    * left row, attach the single most recent right row with
    * `right.ts <= left.ts` (ties at equal ts match) within the same
    * key. Left rows with no earlier right row get nulls — filter on a
    * carried column for inner semantics.
    *
    * Scale shape: union both sides tagged (right sorts before left at
    * equal ts), then `last(right-values, ignoreNulls)` over a running
    * window per key — ONE shuffle by key + ONE sort, linear scan,
    * instead of an inequality join. Right values are carried as a
    * single struct so all output columns come from the SAME right row.
    *
    * Right rows should be unique per (key, ts) — pre-aggregate the
    * right side if not, or the tie-winner is unspecified.
    *
    * @param rightValCols right columns to carry; each appears in the
    *                     output as `asof_<name>`
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               rightValCols: Seq[String]): DataFrame = {
    val reserved = Set("__ts", "__side", "__rv", "__asof")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"asofJoin reserves column names ${reserved.mkString(", ")}; " +
        s"rename ${clash.mkString(", ")} before calling")
    require(rightValCols.nonEmpty, "rightValCols must name at least one right column")
    val missing = rightValCols.filterNot(right.columns.contains)
    require(missing.isEmpty,
      s"rightValCols not found on the right side: ${missing.mkString(", ")} " +
        "(right columns outside rightValCols are intentionally not carried)")
    val outClash = rightValCols.map(c => s"asof_$c").filter(left.columns.contains)
    require(outClash.isEmpty,
      s"output columns ${outClash.mkString(", ")} collide with left columns")
    val leftPayload = left.columns.filterNot(_ == keyCol).toSeq
    val rvStruct = StructType(rightValCols.map(c => right.schema(c)))
    val l = left.select(
      col(keyCol) +: col(leftTsCol).as("__ts") +: lit(1).as("__side") +:
        lit(null).cast(rvStruct).as("__rv") +: leftPayload.map(col): _*)
    val r = right.select(
      col(keyCol) +: col(rightTsCol).as("__ts") +: lit(0).as("__side") +:
        struct(rightValCols.map(col): _*).as("__rv") +:
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keyCol).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col(keyCol) +: leftPayload.map(col) :++
        rightValCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }

  /** Point-in-interval range join: every (point, interval) pair with
    * the same key and `start <= ts <= end`.
    *
    * Scale shape: each interval is exploded to the time buckets it
    * overlaps (width `bucketWidth` in the ts unit), each point maps to
    * exactly one bucket, and the join becomes an equi-join on
    * (key, bucket) + an exact residual filter. Candidate volume is
    * |points| + Σ interval-spans/bucketWidth — pick bucketWidth near
    * the typical interval length so most intervals hit 1-2 buckets.
    *
    * Key columns must be named differently on the two sides (rename
    * before calling); output carries all columns of both inputs.
    */
  def pointInInterval(points: DataFrame, pKeyCol: String, pTsCol: String,
                      intervals: DataFrame, iKeyCol: String,
                      startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = points.columns.intersect(intervals.columns)
    require(overlap.isEmpty,
      s"point and interval columns must be disjoint (rename ${overlap.mkString(", ")}: " +
        "the output carries all columns of both sides unqualified)")
    val reserved = Set("__pb", "__ib")
    val clash = (points.columns ++ intervals.columns).filter(reserved)
    require(clash.isEmpty,
      s"pointInInterval reserves ${reserved.mkString(", ")}; rename ${clash.mkString(", ")}")
    val pb = points
      .withColumn("__pb", expr(s"$pTsCol div $bucketWidth")).alias("p")
    val ib = intervals
      .withColumn("__ib", explode(sequence(
        expr(s"$startCol div $bucketWidth"), expr(s"$endCol div $bucketWidth"))))
      .alias("iv")
    pb.join(ib,
        col("p.__pb") === col("iv.__ib") &&
          col(s"p.$pKeyCol") === col(s"iv.$iKeyCol") &&
          col(s"p.$pTsCol") >= col(s"iv.$startCol") &&
          col(s"p.$pTsCol") <= col(s"iv.$endCol"))
      .drop(col("p.__pb")).drop(col("iv.__ib"))
  }
}
