package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink surface: columnar parquet (optionally hive-style partitioned —
  * the layout that makes partition pruning free for every downstream
  * query filtering on the partition columns), plus csv/json for
  * interchange. The reference's only sink is `key \t value` text parts
  * (MyReducer context.write / queue files, SURVEY.md S4); model text
  * output lives in C45Model.saveRules. */
object Sinks {

  /** Partitioned parquet: one directory per partition-column value.
    * At 100 TB choose low-cardinality, frequently-filtered columns
    * (date, category) — each partition should still hold many row
    * groups, and queries with `WHERE pcol = …` scan only matching
    * directories (PartitionFilters in the plan, zero data read
    * elsewhere). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  def writeParquet(df: DataFrame, path: String,
                   mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  def writeCsv(df: DataFrame, path: String, sep: String = "\t",
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("sep", sep).option("header", "false").csv(path)

  def writeJson(df: DataFrame, path: String,
                mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** ORC — the other columnar interchange format (built into Spark;
    * same predicate-pushdown and column-pruning story as parquet).
    * Exercised end-to-end by q_orc_roundtrip: typed values must
    * survive write→read bit-exactly. */
  def writeOrc(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)
}
