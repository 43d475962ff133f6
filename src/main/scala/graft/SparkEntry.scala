package graft

import graft.queries.{C45Queries, CorpusQueries, ExtQueries, RelQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented SURVEY.md §2 operator (and the
  * extension surface) to a named DataFrame query over an sf directory;
  * `oracleSql` holds the equivalent DuckDB SQL the driver hash-compares
  * against (queries absent from `oracleSql` get a rows-only check). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0: root-level gain-ratio ranking of every attribute of the
    * C4.5 training view — the reference's level-0 decision end to end
    * (categorical stats + one-pass numeric boundary scan). */
  def entry(spark: SparkSession): DataFrame =
    C45Queries.rootRank(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    C45Queries.all ++ ExtQueries.all ++ RelQueries.all ++ CorpusQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    C45Queries.oracles ++ ExtQueries.oracles ++ RelQueries.oracles ++
      CorpusQueries.oracles
}
