package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed parquet tables — the storage-level answer to repeated
  * big-big equi-joins. A table written with `bucketBy(n, key)` is
  * pre-hash-partitioned ON DISK: every scan knows each file's bucket
  * id, so an equi-join of two tables bucketed the same way needs NO
  * Exchange on either side — the single most expensive operator of a
  * repeated-join workload disappears from every downstream query.
  *
  * At 100 TB this is the difference between shuffling both fact tables
  * once per query and shuffling them once EVER (at write time): pick
  * the dominant join key (user_id, order key), a bucket count sized so
  * one bucket ≈ one task's worth of data (buckets = tableBytes /
  * ~256 MB), and co-bucket every table that joins on that key with the
  * SAME count so bucket i only ever meets bucket i.
  *
  * The reference has no join at all (its one dataflow is rule-filtered
  * aggregation, SURVEY.md §2 "absent categories") — this is part of the
  * extension surface, expressed entirely through the catalog so
  * Catalyst's bucketing rules do the planning. */
object Bucketing {

  /** Write `df` as a catalog-registered bucketed parquet table at
    * `path`: `buckets` files, rows routed by `Murmur3(key) % buckets`
    * (Spark's fixed bucket hash — stable across writers, which is what
    * makes two independently-written tables co-joinable), each bucket
    * sorted by `key`.
    *
    * The pre-shuffle by the same hash puts each bucket's rows in
    * exactly one task, so every bucket is ONE file — the layout that
    * also lets the scan report per-bucket sort order (a single-file
    * bucket's sortBy metadata is trusted; multi-file buckets would
    * need a merge-sort the reader doesn't do). */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    df.repartition(buckets, col(key))
      .write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }

  /** The bucketed table as a DataFrame (catalog scan — carries the
    * bucket spec Catalyst's join planning consumes). */
  def readBucketed(s: SparkSession, table: String): DataFrame = s.table(table)
}
