package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** TESTDATA CONTRACT PROBE — /root/testdata has been regenerated with a
  * different `events.ts` parquet shape before (TIMESTAMP(NANOS) →
  * `timestamp[us]` on 2026-08-13), silently breaking every event-time
  * consumer. This spec (a) asserts the on-disk shape is one the
  * adapters in Tables support, so the NEXT silent regeneration fails
  * here with the type named, and (b) pins the adapters' exactness on
  * each supported shape. */
class TestdataContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("events.ts on-disk type is a supported shape (loud contract gate)") {
    val t = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType).contains(t),
      s"events.ts arrived as $t — the testdata contract changed AGAIN; " +
        "extend Tables.epochUs/epochMs and this probe")
  }

  test("loadEventsMs yields plausible epoch-ms whatever the on-disk shape") {
    val ev = Tables.loadEventsMs(spark, sf)
    val r = ev.agg(min("ts_ms"), max("ts_ms"), count(lit(1))).first()
    assert(r.getLong(2) > 0)
    // epoch-ms sanity window: 2000-01-01 .. 2100-01-01. A ns-read-as-µs
    // (or µs-read-as-ns) mistake lands ~1970 or ~year-52000 — far out.
    assert(r.getLong(0) > 946684800000L && r.getLong(1) < 4102444800000L,
      s"ts_ms range [${r.getLong(0)}, ${r.getLong(1)}] is outside any " +
        "plausible event-time window — unit mix-up (ns vs µs vs ms)?")
  }

  test("epochMs/epochUs are exact on every supported shape") {
    import spark.implicits._
    val usVal = 1700000000123456L // 2023-11-14T22:13:20.123456Z
    // ns-as-long shape
    val nsDf = Seq(usVal * 1000).toDF("ts")
    assert(nsDf.select(Tables.epochMs(nsDf, "ts")).first().getLong(0)
      == usVal / 1000)
    assert(nsDf.select(Tables.epochUs(nsDf, "ts")).first().getLong(0) == usVal)
    // TIMESTAMP_NTZ µs shape (UTC session: wall time IS the instant)
    val ntzDf = Seq(usVal).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(ntzDf.schema("ts").dataType == TimestampNTZType)
    assert(ntzDf.select(Tables.epochMs(ntzDf, "ts")).first().getLong(0)
      == usVal / 1000)
    assert(ntzDf.select(Tables.epochUs(ntzDf, "ts")).first().getLong(0) == usVal)
    // tz-adjusted TIMESTAMP µs shape
    val tzDf = Seq(usVal).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(tzDf.schema("ts").dataType == TimestampType)
    assert(tzDf.select(Tables.epochMs(tzDf, "ts")).first().getLong(0)
      == usVal / 1000)
    assert(tzDf.select(Tables.epochUs(tzDf, "ts")).first().getLong(0) == usVal)
  }

  test("an unsupported ts type fails loudly, naming the type") {
    import spark.implicits._
    val bad = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalArgumentException] {
      bad.select(Tables.epochMs(bad, "ts"))
    }
    assert(e.getMessage.contains("StringType"))
    assert(e.getMessage.contains("testdata contract"))
  }
}
