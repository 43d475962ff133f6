package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair for ITERATIVE training caches.
  *
  * A narrow training source — one small parquet file, a filtered
  * bounded slice — arrives with as few as 1-3 scan partitions
  * (`maxSplitBytes` floors at `spark.sql.files.openCostInBytes`), and
  * a `persist` inherits that width. Every level/round of an iterative
  * fit then re-scans the cache on 1-3 cores while the rest of the
  * machine idles: the measured ~0.8s per-level histogram "floor" at
  * local[32] (OPTIMIZATION_r21.md, GenBench) was exactly this — a
  * 3-partition cache scan, not the job shape.
  *
  * `toParallelism` round-robin-repartitions the frame up to the
  * session's default parallelism BEFORE it is persisted, so the
  * one-time narrow shuffle (the projection is attrs+label wide, never
  * table-wide) is amortized over every subsequent scan. It is a
  * strict NO-OP whenever the input is already at least that wide —
  * the corpus-scale case: a real 100 TB scan arrives with orders of
  * magnitude more partitions than cores, and nothing is reshuffled.
  * The width derives from `defaultParallelism` (cluster-sized), never
  * a constant, so the same code sizes itself on any deployment.
  *
  * Safe for every caller here by construction: the fits/trainers
  * consume the cache through exact integer aggregations, HLL
  * sketches, and per-row expressions — all documented
  * partitioning-independent (their DuckDB oracles replay them from a
  * completely different execution engine). */
object Widen {

  def toParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
