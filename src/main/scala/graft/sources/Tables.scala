package graft.sources

import graft.meta.C45Schema
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source surface (SURVEY.md S1-S3): columnar parquet for the testdata
  * tables, plus the reference's native row format — tab-separated text
  * with the class label positionally last (consumed by TextInputFormat
  * in the reference, Main.java:200 / MyMapper.java:28-31) — read through
  * Spark's csv source with an explicit schema (schema-on-read, never
  * inference, matching the reference's external attributes file). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet SCHEMA memo, keyed by file path: every `load` without an
    * explicit schema pays a footer-inference pass (a one-task Spark
    * job + driver planning) before the real scan — pure fixed overhead
    * repeated by all ~200 bench queries × reps over the same static
    * files. The memo caches METADATA only (a StructType, bytes-stable
    * for static testdata), never rows: each query still computes its
    * result from the parquet scan. All sessions in this repo read
    * under the same parquet confs (nanosAsLong), so one schema per
    * path is well-defined. */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Load one testdata table: `dir/name.parquet`. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaMemo.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Session timezones under which a TIMESTAMP_NTZ→TIMESTAMP cast is the
    * identity on the underlying micros (what the epoch helpers rely on). */
  private val UtcNames = Set("UTC", "Etc/UTC", "GMT", "Z", "+00:00", "GMT0", "Etc/GMT")

  private def requireUtc(spark: SparkSession, what: String): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(UtcNames.contains(tz),
      s"$what needs spark.sql.session.timeZone=UTC for an exact " +
        s"TIMESTAMP_NTZ epoch conversion, but the session is pinned to '$tz'. " +
        "Set .config(\"spark.sql.session.timeZone\", \"UTC\") on the builder.")
  }

  /** TESTDATA CONTRACT — event-time column shapes this engine accepts.
    *
    * The driver has shipped `events.ts` in different parquet physical
    * shapes across regenerations (TIMESTAMP(NANOS) → `timestamp[us]` on
    * 2026-08-13); nothing upstream guarantees stability. Every consumer
    * therefore derives epoch values through these adapters, which accept:
    *   - LongType        — TIMESTAMP(NANOS) surfaced as ns-since-epoch
    *                       longs under spark.sql.legacy.parquet.nanosAsLong
    *   - TimestampNTZType — parquet `timestamp[us]` without timezone;
    *                       wall time IS the instant (UTC sessions only)
    *   - TimestampType   — tz-adjusted µs timestamps
    * and fail LOUDLY (naming the type found) on anything else, so the next
    * silent contract change surfaces as one clear error, not a dozen
    * scattered analysis failures. */
  /** Backtick-quote a column name for safe interpolation into
    * `expr(...)` SQL (a raw name with a space, dot or hyphen would
    * break parsing or resolve a nested field). */
  private def q(name: String): String = s"`${name.replace("`", "``")}`"

  def epochUs(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      // integer div keeps ns→µs exact (a double divide of ~1e18 would not)
      case LongType => expr(s"${q(tsCol)} div 1000")
      case TimestampNTZType =>
        requireUtc(df.sparkSession, s"events.$tsCol: TIMESTAMP_NTZ")
        unix_micros(col(tsCol).cast(TimestampType))
      case TimestampType => unix_micros(col(tsCol))
      case other => throw new IllegalArgumentException(
        s"events.$tsCol has unsupported type $other — the testdata contract " +
          "changed. Supported: LongType (ns under nanosAsLong), " +
          "TIMESTAMP_NTZ (µs), TIMESTAMP (µs). Extend Tables.epochUs/epochMs.")
    }

  /** Exact epoch-milliseconds for an event-time column (floor, matching
    * DuckDB `epoch_ms` on the post-1970 testdata domain). See [[epochUs]]
    * for the accepted on-disk shapes. */
  def epochMs(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case LongType => expr(s"${q(tsCol)} div 1000000")
      case TimestampNTZType =>
        requireUtc(df.sparkSession, s"events.$tsCol: TIMESTAMP_NTZ")
        unix_millis(col(tsCol).cast(TimestampType))
      case TimestampType => unix_millis(col(tsCol))
      case other => throw new IllegalArgumentException(
        s"events.$tsCol has unsupported type $other — the testdata contract " +
          "changed. Supported: LongType (ns under nanosAsLong), " +
          "TIMESTAMP_NTZ (µs), TIMESTAMP (µs). Extend Tables.epochUs/epochMs.")
    }

  /** The events table with an exact `ts_ms` epoch-millis column — THE
    * single batch entry point for event-time consumers (as-of/range
    * joins, sessionize, funnel, windows, anomaly profiling). */
  def loadEventsMs(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
    ev.withColumn("ts_ms", epochMs(ev, "ts"))
  }

  /** Reference-native TSV training table under an explicit C45 schema. */
  def loadTsv(spark: SparkSession, path: String, schema: C45Schema): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "false")
      .schema(schema.toStructType)
      .csv(path)
}
