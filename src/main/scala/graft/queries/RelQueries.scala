package graft.queries

import graft.operators.{GraphRank, Profiling, Sessionize, Sketches, SkewTools, TemporalJoin}
import graft.sources.{Layout, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational/temporal engine surface beyond the reference (SURVEY.md
  * §2 "absent categories"): as-of join, point-in-interval range join,
  * pivot, grouping sets, semi/anti joins, ranking windows, date/time
  * functions, and the salted-join skew path — each with a DuckDB
  * oracle under the same parity conventions as C45Queries. */
object RelQueries {

  private def r6x(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** events with an exact epoch-ms column — schema-adaptive across the
    * testdata's ts shapes (ns-as-long, TIMESTAMP_NTZ µs, TIMESTAMP µs);
    * see the contract note on Tables.epochUs. */
  private def eventsMs(s: SparkSession, dir: String): DataFrame =
    Tables.loadEventsMs(s, dir)

  // ---- as-of join: each click joined to the user's most recent
  //      purchase at or before it (inner asof semantics) ----
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsMs(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_ms")
    // unique (user, ts) on the right: deterministic tie-winner
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_ms").as("purchase_ms"))
      .agg(max("value").as("purchase_value"))
    TemporalJoin.asofJoin(clicks, purchases, "user_id",
        "ts_ms", "purchase_ms", Seq("purchase_ms", "purchase_value"))
      .filter(col("asof_purchase_ms").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("asof_purchase_ms").as("purchase_ms"),
        col("asof_purchase_value").as("purchase_value"))
      .orderBy("event_id")
  }
  val qAsofJoinSql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type, value FROM events),
      |c AS (SELECT event_id, user_id, ts_ms FROM e WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts_ms AS purchase_ms, max(value) AS purchase_value
      |  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id, c.ts_ms, p.purchase_ms, p.purchase_value
      |FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts_ms >= p.purchase_ms
      |ORDER BY c.event_id""".stripMargin

  // ---- range join: assign every event to the session interval that
  //      contains it (bucketed point-in-interval equi-join) ----
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val sessions = Sessionize.sessionize(Tables.load(s, dir, "events"))
      .select(col("user_id").as("s_user"), col("session_id"),
        col("start_ms"), col("end_ms"))
    val points = eventsMs(s, dir).select("event_id", "user_id", "ts_ms")
    TemporalJoin.pointInInterval(points, "user_id", "ts_ms",
        sessions, "s_user", "start_ms", "end_ms", bucketWidth = 3600000L)
      .select(col("event_id"), col("user_id"), col("session_id"))
      .orderBy("event_id")
  }
  val qRangeJoinSql: String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events),
       |l AS (SELECT *, lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_ms FROM e),
       |f AS (SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > ${Sessionize.DefaultGapMs} THEN 1 ELSE 0 END AS is_new FROM l),
       |s AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM f),
       |sess AS (SELECT user_id, session_id, min(ts_ms) AS start_ms, max(ts_ms) AS end_ms FROM s GROUP BY 1, 2)
       |SELECT e.event_id, e.user_id, sess.session_id
       |FROM e JOIN sess ON e.user_id = sess.user_id
       |  AND e.ts_ms BETWEEN sess.start_ms AND sess.end_ms
       |ORDER BY e.event_id""".stripMargin

  // ---- pivot: per-day event-type counts as columns ----
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  def qPivot(s: SparkSession, dir: String): DataFrame =
    eventsMs(s, dir)
      .groupBy(expr("ts_ms div 86400000").as("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .select(col("day") +: EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("day")
  val qPivotSql: String = {
    val cols = EventTypes
      .map(t => s"count(*) FILTER (event_type = '$t') AS $t").mkString(",\n  ")
    s"""SELECT epoch_ms(ts) // 86400000 AS day,
       |  $cols
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---- grouping sets (the general form; rollup/cube live in
  //      C45Queries) with grouping_id ----
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("li_gsets")
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM li_gsets
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY gid, rf, ls""".stripMargin)
  }
  val qGroupingSetsSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
      |ORDER BY gid, rf, ls""".stripMargin

  // ---- semi/anti joins: per segment, customers with vs without
  //      orders (existence joins never replicate the probe side) ----
  def qSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with_orders"))
    val withoutO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without_orders"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
      .orderBy("c_mktsegment")
  }
  val qSemiAntiSql: String =
    """WITH f AS (SELECT c_mktsegment,
      |    EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS has_o
      |  FROM customer c)
      |SELECT c_mktsegment,
      |  count(*) FILTER (has_o) AS n_with_orders,
      |  count(*) FILTER (NOT has_o) AS n_without_orders
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- ranking window functions: rank/dense_rank/percent_rank/
  //      cume_dist over a COARSE key (real ties, tie-stable functions);
  //      ntile/row_number over a unique ordering (ntile splits ties
  //      arbitrarily, so it only matches an oracle when the ordering
  //      is total) ----
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val band = expr("CAST(floor(o_totalprice / 1000) AS BIGINT)")
    val wTies = Window.partitionBy("o_orderpriority").orderBy(desc("band"))
    val wUnique = Window.partitionBy("o_orderpriority")
      .orderBy(desc("band"), asc("o_orderkey"))
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), band.as("band"))
      .withColumn("rnk", rank().over(wTies).cast("long"))
      .withColumn("drnk", dense_rank().over(wTies).cast("long"))
      .withColumn("prnk", r6x(percent_rank().over(wTies)))
      .withColumn("cdist", r6x(cume_dist().over(wTies)))
      .withColumn("rn", row_number().over(wUnique).cast("long"))
      .withColumn("tile4", ntile(4).over(wUnique).cast("long"))
      .orderBy("o_orderpriority", "o_orderkey")
  }
  val qWindowRankSql: String =
    """WITH b AS (SELECT o_orderkey, o_orderpriority,
      |    CAST(floor(o_totalprice / 1000) AS BIGINT) AS band
      |  FROM orders)
      |SELECT o_orderkey, o_orderpriority, band,
      |  CAST(rank() OVER wt AS BIGINT) AS rnk,
      |  CAST(dense_rank() OVER wt AS BIGINT) AS drnk,
      |  floor(percent_rank() OVER wt * 1000000 + 0.5) / 1000000 AS prnk,
      |  floor(cume_dist() OVER wt * 1000000 + 0.5) / 1000000 AS cdist,
      |  CAST(row_number() OVER wu AS BIGINT) AS rn,
      |  CAST(ntile(4) OVER wu AS BIGINT) AS tile4
      |FROM b
      |WINDOW wt AS (PARTITION BY o_orderpriority ORDER BY band DESC),
      |  wu AS (PARTITION BY o_orderpriority ORDER BY band DESC, o_orderkey)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  // ---- z-order layout: per-coarse-z-bucket key ranges. The output IS
  //      the zone-map narrowing proof — every bucket's (min,max) span
  //      in BOTH interleaved keys is a fraction of the table's range,
  //      which is exactly what lets a filtered scan skip row groups ----
  private val ZBits = 8
  def qZorder(s: SparkSession, dir: String): DataFrame =
    Layout.zValue(Tables.load(s, dir, "lineitem"), "l_partkey", "l_suppkey", ZBits)
      .withColumn("zbucket", shiftright(col("zval"), 2 * ZBits - 6).cast("long"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
        min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
      .orderBy("zbucket")
  val qZorderSql: String = {
    val w = 1L << ZBits
    s"""WITH b AS (SELECT min(l_partkey) AS mn1, max(l_partkey) AS mx1,
       |    min(l_suppkey) AS mn2, max(l_suppkey) AS mx2 FROM lineitem),
       |k AS (SELECT l_partkey, l_suppkey,
       |    ((l_partkey - mn1) * $w) // (mx1 - mn1 + 1) AS b1,
       |    ((l_suppkey - mn2) * $w) // (mx2 - mn2 + 1) AS b2
       |  FROM lineitem, b),
       |z AS (SELECT l_partkey, l_suppkey,
       |    ${Layout.interleaveSql("b1", "b2", ZBits)} AS zval FROM k)
       |SELECT zval // ${1L << (2 * ZBits - 6)} AS zbucket, count(*) AS n,
       |  min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
       |  min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---- window frames: lead / nth_value / first-last over an explicit
  //      centered ROWS frame, plus a value-based time-RANGE frame (the
  //      sliding 1-hour aggregate without sessionizing). Sums ride
  //      DECIMAL inside the frame (order-independent), cast to double
  //      only at the end; the centered mean divides two doubles, so
  //      both engines compute the identical quotient ----
  def qWindowFrames(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsMs(s, dir).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("value").cast("decimal(18,2)").as("v"))
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val wCenter = wOrd.rowsBetween(-2, 2)
    val wRange = Window.partitionBy("user_id").orderBy(col("ts_ms"))
      .rangeBetween(-3600000L, 0L)
    ev.select(col("event_id"), col("user_id"), col("ts_ms"),
        lead(col("v"), 1).over(wOrd).cast("double").as("next_v"),
        nth_value(col("v"), 2).over(wOrd).cast("double").as("second_v"),
        first(col("v")).over(wCenter).cast("double").as("win_first"),
        last(col("v")).over(wCenter).cast("double").as("win_last"),
        r6x(sum(col("v")).over(wCenter).cast("double")
          / count(lit(1)).over(wCenter)).as("centered_avg"),
        sum(col("v")).over(wRange).cast("double").as("hour_sum"),
        count(lit(1)).over(wRange).cast("long").as("hour_n"))
      .orderBy("event_id")
  }
  val qWindowFramesSql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events WHERE event_type = 'purchase')
      |SELECT event_id, user_id, ts_ms,
      |  CAST(lead(v) OVER wo AS DOUBLE) AS next_v,
      |  CAST(nth_value(v, 2) OVER wo AS DOUBLE) AS second_v,
      |  CAST(first_value(v) OVER wc AS DOUBLE) AS win_first,
      |  CAST(last_value(v) OVER wc AS DOUBLE) AS win_last,
      |  floor(CAST(sum(v) OVER wc AS DOUBLE) / (count(*) OVER wc)
      |    * 1000000 + 0.5) / 1000000 AS centered_avg,
      |  CAST(sum(v) OVER wr AS DOUBLE) AS hour_sum,
      |  CAST(count(*) OVER wr AS BIGINT) AS hour_n
      |FROM e
      |WINDOW wo AS (PARTITION BY user_id ORDER BY ts_ms, event_id),
      |  wc AS (PARTITION BY user_id ORDER BY ts_ms, event_id
      |         ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING),
      |  wr AS (PARTITION BY user_id ORDER BY ts_ms
      |         RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---- date/time function surface (exact day arithmetic; dow as
  //      explicit epoch-day modulus — no engine-specific week rules) ----
  def qDatetime(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("yr"),
      quarter(col("o_orderdate")).cast("long").as("qtr"),
      month(col("o_orderdate")).cast("long").as("mon"),
      dayofmonth(col("o_orderdate")).cast("long").as("dom"),
      (datediff(col("o_orderdate").cast("date"), to_date(lit("1970-01-01"))) % 7)
        .cast("long").as("dow_idx"),
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
        .as("month_start"),
      date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
      date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
        .as("plus30"))
      .orderBy("o_orderkey")
  val qDatetimeSql: String =
    """SELECT o_orderkey,
      |  year(o_orderdate)::BIGINT AS yr,
      |  quarter(o_orderdate)::BIGINT AS qtr,
      |  month(o_orderdate)::BIGINT AS mon,
      |  day(o_orderdate)::BIGINT AS dom,
      |  ((o_orderdate::DATE - DATE '1970-01-01') % 7)::BIGINT AS dow_idx,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
      |  strftime(o_orderdate::DATE + 30, '%Y-%m-%d') AS plus30
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---- salted join (skew path): result must equal the plain join —
  //      the oracle IS the plain join ----
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    // DECIMAL(18,4): a 2-decimal price × 2-decimal factor is EXACTLY a
    // 4-decimal value, so scale-4 casting never rounds — scale-2 would
    // hit .005 boundaries where Spark (decimal-string HALF_UP) and
    // DuckDB (binary-double nearest) disagree
    SkewTools.saltedJoin(li, o, "l_orderkey", "l_partkey", nSalts = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }
  val qSaltedJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- numeric column profiling: equi-width histograms over three
  //      lineitem measures — the pre-training distribution check ----
  private val ProfCols = Seq("l_quantity", "l_extendedprice", "l_discount")
  private val ProfBuckets = 10
  def qProfile(s: SparkSession, dir: String): DataFrame =
    Profiling.numericHistogram(Tables.load(s, dir, "lineitem"),
      ProfCols, ProfBuckets)
      .orderBy("col_name", "bucket")
  val qProfileSql: String = {
    val arms = ProfCols.map { c =>
      val mn = s"(SELECT CAST(min($c) AS DOUBLE) FROM lineitem)"
      val mx = s"(SELECT CAST(max($c) AS DOUBLE) FROM lineitem)"
      val w = s"(($mx - $mn) / ${ProfBuckets}.0)"
      s"""SELECT '$c' AS col_name,
         |    CAST(CASE WHEN $w = 0 THEN 0
         |      ELSE least(floor((CAST($c AS DOUBLE) - $mn) / $w), ${ProfBuckets - 1})
         |      END AS BIGINT) AS bucket
         |  FROM lineitem""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""SELECT col_name, bucket, count(*) AS n FROM (
       |$arms
       |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ---- per-type daily anomaly flags: |z| > 2 on exact DECIMAL daily
  //      sums (the post-ingest monitoring check) ----
  private val AnomalyZ = 2.0
  def qEventAnomaly(s: SparkSession, dir: String): DataFrame =
    Profiling.periodAnomalies(eventsMs(s, dir), "event_type",
      expr("ts_ms div 86400000"), "value", AnomalyZ)
      .select(col("key").as("event_type"), col("period").as("day"),
        round(col("s"), 2).as("daily_sum"), r6x(col("z")).as("z"))
      .orderBy("event_type", "day")
  val qEventAnomalySql: String =
    s"""WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS dsum
       |  FROM events GROUP BY 1, 2),
       |st AS (SELECT event_type, count(*) AS n,
       |    CAST(sum(dsum) AS DOUBLE) AS sx,
       |    CAST(sum(dsum * dsum) AS DOUBLE) AS sxx
       |  FROM d GROUP BY 1),
       |z AS (SELECT d.event_type, day, CAST(dsum AS DOUBLE) AS s,
       |    CASE WHEN sqrt(greatest((sxx - sx * sx / n) / n, 0)) = 0 THEN 0
       |      ELSE (CAST(dsum AS DOUBLE) - sx / n) /
       |        sqrt(greatest((sxx - sx * sx / n) / n, 0)) END AS z
       |  FROM d JOIN st USING (event_type))
       |SELECT event_type, day, round(s, 2) AS daily_sum,
       |  ${r6xSqlFrag("z")} AS z
       |FROM z WHERE abs(z) > $AnomalyZ ORDER BY event_type, day""".stripMargin
  private def r6xSqlFrag(x: String): String =
    s"floor(($x) * 1000000 + 0.5) / 1000000"

  // ---- semi-structured extraction: typed JSON-path access over the
  //      events.props payload — from_json with an explicit schema (the
  //      100 TB shape: schema-on-read typed extraction; malformed or
  //      missing keys become NULLs, never task failures — pinned in
  //      JsonExtractSpec) aggregated per event_type. `n_k` counts the
  //      extractable rows separately from `n`, the audit a lossy
  //      payload column needs. ----
  def qJsonExtract(s: SparkSession, dir: String): DataFrame = {
    val k = from_json(col("props"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))).getField("k")
    Tables.load(s, dir, "events")
      .select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
        sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")
  }
  val qJsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
      |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- unpivot (wide → long): the inverse of q_pivot, via the native
  //      Dataset.unpivot (Spark's UNPIVOT relational op — one map-side
  //      explode, no shuffle beyond the feeding aggregation). Measures
  //      are integer-valued doubles, so sums are exact and
  //      order-independent. ----
  def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables.load(s, dir, "lineitem").groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).cast("double").as("qty"),
        count(lit(1)).cast("double").as("cnt"),
        sum(col("l_linenumber")).cast("double").as("lines"))
    wide.unpivot(Array(col("l_returnflag")),
        Array(col("qty"), col("cnt"), col("lines")), "measure", "value")
      .orderBy("l_returnflag", "measure")
  }
  val qUnpivotSql: String =
    """WITH w AS (SELECT l_returnflag,
      |    CAST(sum(l_quantity) AS DOUBLE) AS qty,
      |    CAST(count(*) AS DOUBLE) AS cnt,
      |    CAST(sum(l_linenumber) AS DOUBLE) AS lines
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, 'qty' AS measure, qty AS value FROM w
      |UNION ALL SELECT l_returnflag, 'cnt', cnt FROM w
      |UNION ALL SELECT l_returnflag, 'lines', lines FROM w
      |ORDER BY l_returnflag, measure""".stripMargin

  // ---- bucketed co-located join: both sides written bucketed on the
  //      join key (graft.sources.Bucketing), so the equi-join plans
  //      with NO Exchange on either side — the storage-level shuffle
  //      elimination a repeated-join workload wants at 100 TB (shuffle
  //      the fact tables once at write time, never per query).
  //      BucketJoinSpec pins the exchange-free SortMergeJoin plan. ----
  private val bucketRuns = new java.util.concurrent.atomic.AtomicInteger()
  def qBucketJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Bucketing
    val n = bucketRuns.incrementAndGet()
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucket_$n"
    Bucketing.writeBucketed(Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      s"graft_bk_orders_$n", s"$base/orders", "o_custkey", 8)
    Bucketing.writeBucketed(Tables.load(s, dir, "customer")
        .select("c_custkey", "c_mktsegment"),
      s"graft_bk_customer_$n", s"$base/customer", "c_custkey", 8)
    val o = Bucketing.readBucketed(s, s"graft_bk_orders_$n")
    val c = Bucketing.readBucketed(s, s"graft_bk_customer_$n")
    // merge hint: the demo is the co-located SMJ (broadcast would win
    // at this tier and hide the bucketing; at fact×fact scale there is
    // no broadcast side and SMJ is what the planner picks unaided)
    o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("sum_total"))
      .orderBy("c_mktsegment")
  }
  val qBucketJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---- ordered-step funnel (view → click → purchase): stage times as
  //      cumulative conditional window minimums — ONE shuffle for the
  //      whole funnel regardless of step count (the per-step self-join
  //      formulation the oracle uses costs a shuffle per step) ----
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val steps = Seq("view", "click", "purchase")
    val ev = eventsMs(s, dir)
      .filter(col("event_type").isin(steps: _*))
      .select("user_id", "event_id", "ts_ms", "event_type")
    graft.operators.Funnel.funnel(ev, "user_id", "event_type",
        "ts_ms", "event_id", steps, r6x)
      .orderBy("step")
  }
  val qFunnelSql: String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type FROM events),
       |a AS (SELECT user_id, min(ts_ms) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
       |b AS (SELECT e.user_id, min(ts_ms) AS t2 FROM e JOIN a ON e.user_id = a.user_id
       |  WHERE event_type = 'click' AND ts_ms > t1 GROUP BY 1),
       |c AS (SELECT e.user_id, min(ts_ms) AS t3 FROM e JOIN b ON e.user_id = b.user_id
       |  WHERE event_type = 'purchase' AND ts_ms > t2 GROUP BY 1),
       |n AS (SELECT (SELECT count(*) FROM a) AS n1,
       |  (SELECT count(*) FROM b) AS n2, (SELECT count(*) FROM c) AS n3)
       |SELECT 1 AS step, 'view' AS step_name, n1 AS n_users,
       |  ${r6xSqlFrag("n1::DOUBLE / n1")} AS conv_rate FROM n
       |UNION ALL SELECT 2, 'click', n2, ${r6xSqlFrag("n2::DOUBLE / n1")} FROM n
       |UNION ALL SELECT 3, 'purchase', n3, ${r6xSqlFrag("n3::DOUBLE / n1")} FROM n
       |ORDER BY step""".stripMargin

  // ---- incremental aggregate maintenance (materialized-view update):
  //      the standing per-(day, type) state absorbs the newest 20% of
  //      the stream via MergeOps.mergeAggState — O(delta) + O(state
  //      merge), history never rescanned. The ORACLE is the full batch
  //      recompute over everything, so the hash match itself proves
  //      incremental == recompute (sum/count/max are distributive;
  //      exact DECIMAL sums keep the equality bit-level). ----
  def qIncrAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.MergeOps
    val ev = eventsMs(s, dir)
      .select(col("event_type"), col("ts_ms"), col("value"))
      .withColumn("day", expr("ts_ms div 86400000"))
    // refresh boundary at 80% of the observed time range — driver-side
    // O(1) bounds read (the same one-row pattern intervalJoin uses)
    val b = ev.agg(min("ts_ms").as("mn"), max("ts_ms").as("mx")).first()
    val cutoff = b.getLong(0) + ((b.getLong(1) - b.getLong(0)) * 4) / 5
    def aggState(df: DataFrame): DataFrame =
      df.groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("sum_v"),
          max(col("value")).as("max_v"))
    val state = aggState(ev.filter(col("ts_ms") < cutoff))
    val delta = aggState(ev.filter(col("ts_ms") >= cutoff))
    MergeOps.mergeAggState(state, delta, Seq("day", "event_type"),
        Seq(("n", "sum"), ("sum_v", "sum"), ("max_v", "max")))
      .select(col("day"), col("event_type"), col("n"),
        col("sum_v").cast("double").as("sum_value"),
        col("max_v").as("max_value"))
      .orderBy("day", "event_type")
  }
  val qIncrAggSql: String =
    """WITH e AS (SELECT epoch_ms(ts) AS ts_ms, event_type, value FROM events)
      |SELECT ts_ms // 86400000 AS day, event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  max(value) AS max_value
      |FROM e GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  // ---- exact per-group top-k WITHOUT a window: the k-bounded
  //      partial-combining aggregate (graft.operators.GroupTopK) trims
  //      map-side, so a hot key never serializes its whole group into
  //      one partition — the skew-proof replacement for row_number()
  //      at corpus scale. Top-3 customers per nation by balance. ----
  def qGroupTopK(s: SparkSession, dir: String): DataFrame =
    graft.operators.GroupTopK.topKByKey(Tables.load(s, dir, "customer"),
        col("c_nationkey").cast("long"), col("c_custkey"),
        round(col("c_acctbal"), 2), k = 3)
      .select(col("key").as("nation_key"), col("rank").cast("long").as("rnk"),
        col("id").as("c_custkey"), col("score").as("acctbal"))
      .orderBy("nation_key", "rnk")
  val qGroupTopKSql: String =
    """WITH r AS (SELECT CAST(c_nationkey AS BIGINT) AS nation_key,
      |    c_custkey, round(c_acctbal, 2) AS acctbal,
      |    row_number() OVER (PARTITION BY c_nationkey
      |      ORDER BY round(c_acctbal, 2) DESC, c_custkey) AS rnk
      |  FROM customer)
      |SELECT nation_key, rnk, c_custkey, acctbal
      |FROM r WHERE rnk <= 3 ORDER BY nation_key, rnk""".stripMargin

  // ---- exact-quantile binning (QuantileDiscretizer): 8 equal-mass
  //      buckets of l_extendedprice at its own quantile edges, each
  //      profiled (count, observed [min, max]). nBins = 8 keeps every
  //      probability k/8 exactly representable, so the edge
  //      probabilities parse to identical doubles in both engines;
  //      the edges themselves ride the q_quantiles-pinned
  //      percentile == quantile_cont pair ----
  private val QbBins = 8
  def qQuantileBin(s: SparkSession, dir: String): DataFrame =
    Profiling.quantileBin(Tables.load(s, dir, "lineitem"),
        "l_extendedprice", QbBins)
      .orderBy("bin")
  val qQuantileBinSql: String = {
    val probs = (1 until QbBins).map(_.toDouble / QbBins).mkString(", ")
    s"""WITH v AS (SELECT l_extendedprice::DOUBLE AS v FROM lineitem
       |  WHERE l_extendedprice IS NOT NULL),
       |e AS (SELECT quantile_cont(v, [$probs]) AS edges FROM v),
       |b AS (SELECT v, CAST(len(list_filter(edges, x -> v > x)) AS BIGINT) AS bin
       |  FROM v, e)
       |SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |  round(min(v), 6) AS lo, round(max(v), 6) AS hi
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---- robust outlier screen: median/MAD instead of mean/sigma —
  //      the screen that still works when outliers inflate sigma and
  //      hide themselves. Exact percentiles both sides (the
  //      q_quantiles-pinned percentile == quantile_cont pair), so the
  //      flagged set hash-matches ----
  private val MadThr = 6.0
  def qMadOutliers(s: SparkSession, dir: String): DataFrame =
    Profiling.madOutliers(Tables.load(s, dir, "events"),
        "event_type", "event_id", "value", MadThr)
      .orderBy("key", "id")
  val qMadOutliersSql: String =
    s"""WITH e AS (SELECT event_type AS key, event_id AS id, value AS v FROM events),
       |m1 AS (SELECT key, quantile_cont(v, 0.5) AS med FROM e GROUP BY 1),
       |d AS (SELECT e.key, id, v, med, abs(v - med) AS dev FROM e JOIN m1 USING (key)),
       |m2 AS (SELECT key, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1)
       |SELECT d.key, id, v AS value, round(med, 6) AS med, round(mad, 6) AS mad
       |FROM d JOIN m2 USING (key) WHERE dev > $MadThr * mad
       |ORDER BY key, id""".stripMargin

  // ---- per-group cardinality profiling via the mergeable KMV
  //      sketch: distinct users per event type with state capped at
  //      k longs per group (exact countDistinct shuffles every
  //      distinct key); exact below k, deterministic estimator ----
  private val KgK = 64
  def qKmvGroups(s: SparkSession, dir: String): DataFrame =
    Sketches.kmvPerGroup(Tables.load(s, dir, "events"),
        "event_type", "user_id", KgK)
      .withColumnRenamed("key", "event_type")
      .orderBy("event_type")
  val qKmvGroupsSql: String =
    s"""WITH d AS (SELECT DISTINCT event_type, ${graft.functions.Hashing.hash60Sql("user_id")} AS h FROM events),
       |r AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM d),
       |a AS (SELECT event_type,
       |    CAST(sum(CASE WHEN rn <= $KgK THEN 1 ELSE 0 END) AS BIGINT) AS k_actual,
       |    max(CASE WHEN rn <= $KgK THEN h END) AS kth_hash FROM r GROUP BY 1)
       |SELECT event_type, k_actual, kth_hash,
       |  floor((CASE WHEN k_actual < $KgK THEN k_actual::DOUBLE
       |    ELSE ${KgK - 1}.0 * 1152921504606846976.0 / kth_hash END) * 1000000 + 0.5) / 1000000 AS est_distinct
       |FROM a ORDER BY event_type""".stripMargin

  // ---- ORC source/sink round trip: write a typed lineitem slice
  //      (int64/int32/double/string/timestamp-µs) to ORC, read it
  //      back, and emit the rows — the oracle is the PLAIN table
  //      select, so a hash match proves the format preserves every
  //      value bit-exactly. Timestamps emit as epoch-µs through the
  //      schema-adaptive Tables.epochUs (UTC session contract) ----
  /** Deterministic scratch dir for write-then-read-back queries. The
    * result DataFrame reads the path LAZILY (the harness materializes
    * it after this function returns), so the dir can't be deleted
    * here — instead the path is fixed per query name and any previous
    * invocation's output is wiped before writing, so repeated
    * sweeps/benches (median-of-3, 3 tiers) never accumulate orphaned
    * dirs: disk is bounded at one copy per query. */
  private def scratchDir(name: String): String = {
    val p = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_scratch", name)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(p.toFile)
    java.nio.file.Files.createDirectories(p.getParent)
    p.toString
  }

  def qOrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val slice = Tables.load(s, dir, "lineitem")
      .filter(col("l_orderkey") < 200)
    val tmp = scratchDir("orc_roundtrip")
    graft.sources.Sinks.writeOrc(slice, tmp)
    val back = s.read.orc(tmp)
    back.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"), col("l_linestatus"),
        Tables.epochUs(back, "l_shipdate").as("ship_us"))
      .orderBy("l_orderkey", "l_linenumber")
  }
  val qOrcRoundtripSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  l_returnflag, l_linestatus, epoch_us(l_shipdate) AS ship_us
      |FROM lineitem WHERE l_orderkey < 200
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- schema evolution on read (mergeSchema): two parquet batches
  //      with different widths — an early (doc_id, lang) snapshot and
  //      a later one that added n_chars — read as ONE table with the
  //      union schema, missing columns NULL. The 100 TB reality:
  //      long-lived datasets widen over time, and the engine must
  //      read across the boundary without rewriting history. The
  //      oracle replays the union with typed NULLs, so the hash pins
  //      exact null/value placement ----
  def qSchemaMerge(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val tmp = scratchDir("schema_merge")
    graft.sources.Sinks.writeParquet(
      d.filter(col("doc_id") % 2 === 0).select("doc_id", "lang"),
      s"$tmp/batch=1")
    graft.sources.Sinks.writeParquet(
      d.filter(col("doc_id") % 2 === 1).select("doc_id", "lang", "n_chars"),
      s"$tmp/batch=2")
    s.read.option("mergeSchema", "true").parquet(tmp)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }
  val qSchemaMergeSql: String =
    """SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
      |FROM documents WHERE doc_id % 2 = 0
      |UNION ALL
      |SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 1
      |ORDER BY doc_id""".stripMargin

  // ---- mergeable sample-quantile sketch: per-day bottom-64 uniform
  //      row samples of event values (sketch-as-data, the
  //      distribution member of the HLL/KMV/CMS/Bloom family) merged
  //      across all days into per-type p50/p90 estimates, reported
  //      NEXT TO the exact percentiles so the estimator's error is
  //      visible in-row — the same QA convention as q_hll_union /
  //      q_dedup_eval. Merge = re-prune to the global bottom-k by
  //      hash, provably identical to one-shot sampling ----
  private val SqK = 64
  def qSampleQuantiles(s: SparkSession, dir: String): DataFrame = {
    val base = eventsMs(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("value"),
        expr("ts_ms div 86400000").as("day"))
    val sk = Sketches.sampleBottomK(base, "day", "event_type",
      "event_id", "value", SqK)
    val est = Sketches.sampleMergeQuantiles(sk, SqK,
      Seq("50" -> 0.5, "90" -> 0.9))
    val exact = base.groupBy(col("event_type").as("key"))
      .agg(count(lit(1)).as("n_total"),
        floor(percentile(col("value").cast("double"), lit(0.5)) * lit(1e6)
          + lit(0.5)).cast("long").as("exact_p50_micros"),
        floor(percentile(col("value").cast("double"), lit(0.9)) * lit(1e6)
          + lit(0.5)).cast("long").as("exact_p90_micros"))
    est.join(exact, "key")
      .select(col("key"), col("n_total"), col("n_sample"),
        col("est_p50_micros"), col("est_p90_micros"),
        col("exact_p50_micros"), col("exact_p90_micros"))
      .orderBy("key")
  }
  val qSampleQuantilesSql: String = {
    val h = graft.functions.Hashing.hash60Sql("CAST(event_id AS VARCHAR)")
    s"""WITH e AS (SELECT event_type AS key, event_id,
       |    CAST(value AS DOUBLE) AS v, epoch_ms(ts) // 86400000 AS day
       |  FROM events WHERE value IS NOT NULL),
       |hh AS (SELECT day, key, $h AS h,
       |    CAST(floor(v * 1e6 + 0.5) AS BIGINT) AS vm FROM e),
       |sk AS (SELECT day, key, h, vm FROM (SELECT *,
       |    row_number() OVER (PARTITION BY day, key ORDER BY h, vm) AS rn
       |  FROM hh) WHERE rn <= $SqK),
       |mg AS (SELECT key, h, vm FROM (SELECT key, h, vm,
       |    row_number() OVER (PARTITION BY key ORDER BY h, vm) AS rn
       |  FROM sk) WHERE rn <= $SqK),
       |srt AS (SELECT key, list(vm ORDER BY vm) AS vs,
       |    CAST(count(*) AS BIGINT) AS n_sample FROM mg GROUP BY 1),
       |ex AS (SELECT key, CAST(count(*) AS BIGINT) AS n_total,
       |    CAST(floor(quantile_cont(v, 0.5) * 1e6 + 0.5) AS BIGINT) AS exact_p50_micros,
       |    CAST(floor(quantile_cont(v, 0.9) * 1e6 + 0.5) AS BIGINT) AS exact_p90_micros
       |  FROM e GROUP BY 1)
       |SELECT srt.key, ex.n_total, srt.n_sample,
       |  vs[CAST(greatest(ceil(0.5 * n_sample), 1) AS INT)] AS est_p50_micros,
       |  vs[CAST(greatest(ceil(0.9 * n_sample), 1) AS INT)] AS est_p90_micros,
       |  ex.exact_p50_micros, ex.exact_p90_micros
       |FROM srt JOIN ex USING (key) ORDER BY key""".stripMargin
  }

  // ---- rendezvous shard routing (highest-random-weight, Thaler &
  //      Ravishankar 1998) with the stability property MEASURED: the
  //      customer keyspace assigned to 8 shards and to the same ring
  //      with shard 7 removed. Only the removed shard's keys move
  //      (each to its runner-up shard; n_moved_in sums to exactly
  //      shard 7's n_before, spec-asserted as the HRW property) — vs
  //      `hash mod n`, where losing a shard remaps (n-1)/n of ALL
  //      keys. Pure map-side Column arithmetic, no boundary table ----
  private val RdvShards = 8
  private val RdvSalt = 400
  def qRendezvous(s: SparkSession, dir: String): DataFrame = {
    val assigned = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("k")).distinct()
      .select(col("k"),
        graft.operators.Sharding.rendezvousShard(col("k"), RdvShards, RdvSalt).as("b"),
        graft.operators.Sharding.rendezvousShard(col("k"), RdvShards - 1, RdvSalt).as("a"))
    val before = assigned.groupBy(col("b").as("shard"))
      .agg(count(lit(1)).as("n_before"))
    val after = assigned.groupBy(col("a").as("shard"))
      .agg(count(lit(1)).as("n_after"),
        sum(when(col("b") =!= col("a"), 1L).otherwise(0L)).as("n_moved_in"))
    before.join(after, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("n_moved_in"), lit(0L)).as("n_moved_in"))
      .orderBy("shard")
  }
  val qRendezvousSql: String = {
    val h = s"CAST(('0x' || substr(md5(concat(CAST($RdvSalt + s.i AS VARCHAR), '|', kk)), 1, 15)) AS BIGINT)"
    s"""WITH k AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS kk FROM customer),
       |h AS (SELECT kk, s.i AS s, $h AS h
       |  FROM k CROSS JOIN generate_series(0, ${RdvShards - 1}) s(i)),
       |b AS (SELECT kk, s AS b FROM (SELECT kk, s,
       |    row_number() OVER (PARTITION BY kk ORDER BY h DESC, s ASC) AS rn
       |  FROM h) WHERE rn = 1),
       |a AS (SELECT kk, s AS a FROM (SELECT kk, s,
       |    row_number() OVER (PARTITION BY kk ORDER BY h DESC, s ASC) AS rn
       |  FROM h WHERE s < ${RdvShards - 1}) WHERE rn = 1),
       |j AS (SELECT b.kk, b.b, a.a FROM b JOIN a USING (kk)),
       |nb AS (SELECT b AS shard, CAST(count(*) AS BIGINT) AS n_before
       |  FROM j GROUP BY 1),
       |na AS (SELECT a AS shard, CAST(count(*) AS BIGINT) AS n_after,
       |    CAST(sum(CASE WHEN b <> a THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_in
       |  FROM j GROUP BY 1)
       |SELECT coalesce(nb.shard, na.shard) AS shard,
       |  coalesce(n_before, 0) AS n_before, coalesce(n_after, 0) AS n_after,
       |  coalesce(n_moved_in, 0) AS n_moved_in
       |FROM nb FULL JOIN na ON nb.shard = na.shard ORDER BY shard""".stripMargin
  }

  // ---- winsorization profile (heavy-tail taming for feature
  //      cleaning): per return flag, the p05/p95 clipping bounds for
  //      extended price, counts clipped each side, and the exact
  //      micros mean before/after — what the clip WOULD do, reported
  //      before anyone applies it. Exact percentiles (the pinned
  //      percentile == quantile_cont pair); means are micros-floored
  //      integer sums, partition-order independent ----
  private val WinsPLow = 0.05
  private val WinsPHigh = 0.95
  def qWinsorize(s: SparkSession, dir: String): DataFrame =
    Profiling.winsorizeProfile(Tables.load(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice", WinsPLow, WinsPHigh)
      .orderBy("key")
  val qWinsorizeSql: String =
    s"""WITH v AS (SELECT l_returnflag AS key,
       |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
       |pc AS (SELECT key, quantile_cont(v, $WinsPLow) AS lo,
       |    quantile_cont(v, $WinsPHigh) AS hi FROM v GROUP BY 1),
       |j AS (SELECT v.key, v.v, pc.lo, pc.hi,
       |    least(greatest(v.v, pc.lo), pc.hi) AS w FROM v JOIN pc USING (key))
       |SELECT key, CAST(count(*) AS BIGINT) AS n,
       |  round(lo, 6) AS lo, round(hi, 6) AS hi,
       |  CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
       |  CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high,
       |  CAST(sum(CAST(floor(v * 1e6 + 0.5) AS BIGINT)) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_raw_micros,
       |  CAST(sum(CAST(floor(w * 1e6 + 0.5) AS BIGINT)) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_wins_micros
       |FROM j GROUP BY key, lo, hi ORDER BY key""".stripMargin

  // ---- Bloom-filter semi-join reduction with MEASURED false-positive
  //      rate: a kilobyte filter built from the dimension-side keys
  //      (BUILDING customers) prunes the fact side (orders) MAP-SIDE —
  //      zero joins, zero shuffles at probe time, the runtime-filter
  //      shape that keeps a 100 TB probe from shuffling rows that join
  //      nothing. The exact semi-join runs alongside so the output
  //      reports, per order priority, how many rows the filter passed,
  //      how many truly matched, and the realized FPR in micros —
  //      no false negatives is part of the contract (asserted by spec;
  //      visible here as n_pass >= n_match in every row) ----
  private val BloomM = 4096
  private val BloomK = 4
  private val BloomSalt = 77
  def qBloomSemi(s: SparkSession, dir: String): DataFrame = {
    val bkeys = Tables.load(s, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val words = Sketches.bloomWords(bkeys, "c_custkey", BloomM, BloomK, BloomSalt)
    val pass = Sketches.bloomMightContain(words, col("o_custkey"),
      BloomM, BloomK, BloomSalt)
    val truth = bkeys.distinct()
      .select(col("c_custkey").as("o_custkey"), lit(1L).as("__m"))
    Tables.load(s, dir, "orders")
      .withColumn("bloom_pass", pass)
      .join(broadcast(truth), Seq("o_custkey"), "left")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_pass"),
        sum(coalesce(col("__m"), lit(0L))).as("n_match"))
      .select(col("priority"), col("n_rows"), col("n_pass"), col("n_match"),
        (col("n_pass") - col("n_match")).as("n_false_pos"),
        when(col("n_rows") === col("n_match"), lit(0L))
          .otherwise(expr("((n_pass - n_match) * 1000000L) div (n_rows - n_match)"))
          .as("fpr_micros"))
      .orderBy("priority")
  }
  val qBloomSemiSql: String = {
    def h(expr: String, saltExpr: String): String =
      s"CAST(('0x' || substr(md5(concat($saltExpr, '|', $expr)), 1, 15)) AS BIGINT)"
    val salted = h("kk", s"CAST($BloomSalt + s.i AS VARCHAR)")
    val saltedP = h("CAST(pk.o_custkey AS VARCHAR)", s"CAST($BloomSalt + s.i AS VARCHAR)")
    s"""WITH bk AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS kk
       |  FROM customer WHERE c_mktsegment = 'BUILDING'),
       |hs AS (SELECT $salted % $BloomM AS pos
       |  FROM bk CROSS JOIN (VALUES (0), (1), (2), (3)) s(i)),
       |wd AS (SELECT pos // 32 AS word_idx,
       |    bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word
       |  FROM hs GROUP BY 1),
       |pk AS (SELECT DISTINCT o_custkey FROM orders),
       |pp AS (SELECT pk.o_custkey, $saltedP % $BloomM AS pos
       |  FROM pk CROSS JOIN (VALUES (0), (1), (2), (3)) s(i)),
       |pv AS (SELECT o_custkey,
       |    bool_and((coalesce(wd.word, 0) & (1::BIGINT << CAST(pos % 32 AS INT))) <> 0) AS pass
       |  FROM pp LEFT JOIN wd ON pp.pos // 32 = wd.word_idx GROUP BY 1),
       |tv AS (SELECT DISTINCT c_custkey FROM customer
       |  WHERE c_mktsegment = 'BUILDING'),
       |ag AS (SELECT o.o_orderpriority AS priority,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CASE WHEN pv.pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |    CAST(sum(CASE WHEN tv.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_match
       |  FROM orders o JOIN pv ON o.o_custkey = pv.o_custkey
       |  LEFT JOIN tv ON o.o_custkey = tv.c_custkey
       |  GROUP BY 1)
       |SELECT priority, n_rows, n_pass, n_match,
       |  n_pass - n_match AS n_false_pos,
       |  CASE WHEN n_rows = n_match THEN 0
       |    ELSE ((n_pass - n_match) * 1000000) // (n_rows - n_match) END AS fpr_micros
       |FROM ag ORDER BY priority""".stripMargin
  }

  // ---- frequent part pairs with exact integer lift (size-2 A-priori
  //      over order baskets): which parts sell TOGETHER more than
  //      their popularities predict. The item-support prune runs
  //      before the within-basket self-join — the pass that keeps the
  //      quadratic explode bounded at catalog scale ----
  private val BpMinItemSup = 5L
  private val BpMinPairSup = 2L
  def qBasketPairs(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("b"), col("l_partkey").as("it"))
      .distinct()
    graft.operators.Assoc.pairLift(m, "b", "it", BpMinItemSup, BpMinPairSup)
      .orderBy("item1", "item2")
  }
  val qBasketPairsSql: String =
    s"""WITH m AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS it FROM lineitem),
       |nb AS (SELECT count(DISTINCT b) AS n FROM m),
       |sup AS (SELECT it, count(*) AS n_it FROM m GROUP BY 1
       |  HAVING count(*) >= $BpMinPairSup AND count(*) >= $BpMinItemSup),
       |k AS (SELECT m.b, m.it, sup.n_it FROM m JOIN sup USING (it)),
       |p AS (SELECT a.it AS item1, c.it AS item2, a.n_it AS n_a, c.n_it AS n_b,
       |    count(*) AS n_ab
       |  FROM k a JOIN k c ON a.b = c.b AND a.it < c.it
       |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= $BpMinPairSup)
       |SELECT item1, item2, n_ab, n_a, n_b,
       |  (n_ab * (SELECT n FROM nb) * 1000000) // (n_a * n_b) AS lift_micros
       |FROM p ORDER BY item1, item2""".stripMargin

  // ---- first-order Markov transition matrix over per-user event
  //      sequences: step counts + exact row-normalized probabilities
  //      (micros). The output is event-vocabulary², independent of
  //      corpus rows; the only corpus-sized stage is one window
  //      shuffle by user ----
  def qEventTransitions(s: SparkSession, dir: String): DataFrame =
    Sessionize.transitionMatrix(Tables.load(s, dir, "events"))
      .orderBy("from_type", "to_type")
  val qEventTransitionsSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type FROM events),
      |st AS (SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS to_type
      |  FROM e),
      |m AS (SELECT from_type, to_type, count(*) AS n FROM st
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |w AS (SELECT from_type, to_type, n,
      |    CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from
      |  FROM m)
      |SELECT from_type, to_type, n, n_from,
      |  (n * 1000000) // n_from AS p_micros
      |FROM w ORDER BY from_type, to_type""".stripMargin

  // ---- HITS hub/authority co-ranking (Kleinberg 1999) over the
  //      DIRECTED customer→supplier purchase graph (orders⋈lineitem,
  //      bounded customer slice; supplier keys offset by 10^6 to keep
  //      the two key spaces disjoint): a hub is a customer whose
  //      purchases concentrate on well-endorsed suppliers, an
  //      authority a supplier favored by exactly those customers —
  //      the deterministic max-rescaled integer variant, unrolled
  //      rounds replayed by the oracle ----
  private val HitsIters = 5
  private val HitsCustBound = 300L
  def qHits(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_custkey") < HitsCustBound)
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val e = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey").cast("long").as("u"),
        (col("l_suppkey").cast("long") + lit(1000000L)).as("v"))
    GraphRank.hits(e, HitsIters)
      .select(col("id").as("node_id"), col("hub_micros"),
        col("auth_micros"))
      .orderBy("node_id")
  }
  val qHitsSql: String = {
    val rounds = (1 to HitsIters).map { r =>
      val p = r - 1
      s"""ar$r AS (SELECT e.v AS id, sum(h.s) AS raw
         |  FROM e JOIN h$p h ON e.u = h.id GROUP BY 1),
         |a$r AS MATERIALIZED (SELECT nd.id,
         |    (coalesce(raw, 0) * 1000000) // (SELECT max(raw) FROM ar$r) AS s
         |  FROM nd LEFT JOIN ar$r USING (id)),
         |hr$r AS (SELECT e.u AS id, sum(a.s) AS raw
         |  FROM e JOIN a$r a ON e.v = a.id GROUP BY 1),
         |h$r AS MATERIALIZED (SELECT nd.id,
         |    (coalesce(raw, 0) * 1000000) // (SELECT max(raw) FROM hr$r) AS s
         |  FROM nd LEFT JOIN hr$r USING (id))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey AS u, l_suppkey + 1000000 AS v
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  WHERE o_custkey < $HitsCustBound),
       |nd AS MATERIALIZED (SELECT u AS id FROM e UNION SELECT v FROM e),
       |h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS s FROM nd),
       |$rounds
       |SELECT h.id AS node_id, CAST(h.s AS BIGINT) AS hub_micros,
       |  CAST(a.s AS BIGINT) AS auth_micros
       |FROM h$HitsIters h JOIN a$HitsIters a USING (id)
       |ORDER BY node_id""".stripMargin
  }

  // ---- out-of-fold target encoding (the CatBoost/Micci-Barreca
  //      trick): replace a categorical with the smoothed mean of a
  //      binary target computed EXCLUDING the row's own fold, so the
  //      encoding never leaks a row's label into its own feature.
  //      enc = (pos_oof + m·prior) / (n_oof + m) in exact integer
  //      micros, prior = the global positive rate, folds keyed by
  //      o_orderkey % k. Output is category×fold-sized — the lookup
  //      table a trainer broadcast-joins back onto the corpus; the
  //      only corpus-sized stage is one partial-agg groupBy ----
  private val TeFolds = 5L
  private val TeSmooth = 20L
  def qTargetEncode(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select(
      col("o_orderpriority").as("priority"),
      (col("o_orderkey") % TeFolds).cast("long").as("fold"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
    val pf = o.groupBy("priority", "fold")
      .agg(count(lit(1)).as("n_f"), sum("y").as("s_f"))
    val g = o.agg(count(lit(1)).as("n_all"), sum("y").as("s_all"))
    val w = Window.partitionBy("priority")
    pf.withColumn("n_c", sum("n_f").over(w))
      .withColumn("s_c", sum("s_f").over(w))
      .crossJoin(broadcast(g))
      .select(col("priority"), col("fold"),
        (col("n_c") - col("n_f")).as("n_oof"),
        (col("s_c") - col("s_f")).as("pos_oof"),
        expr(s"((s_c - s_f) * 1000000L + ${TeSmooth}L * ((s_all * 1000000L) div n_all))" +
          s" div (n_c - n_f + ${TeSmooth}L)").as("enc_micros"))
      .orderBy("priority", "fold")
  }
  val qTargetEncodeSql: String =
    s"""WITH o AS (SELECT o_orderpriority AS priority,
       |    o_orderkey % $TeFolds AS fold,
       |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
       |pf AS (SELECT priority, fold, count(*) AS n_f, sum(y) AS s_f
       |  FROM o GROUP BY 1, 2),
       |g AS (SELECT count(*) AS n_all, sum(y) AS s_all FROM o),
       |w AS (SELECT priority, fold, n_f, s_f,
       |    sum(n_f) OVER (PARTITION BY priority) AS n_c,
       |    sum(s_f) OVER (PARTITION BY priority) AS s_c FROM pf)
       |SELECT priority, CAST(fold AS BIGINT) AS fold,
       |  CAST(n_c - n_f AS BIGINT) AS n_oof,
       |  CAST(s_c - s_f AS BIGINT) AS pos_oof,
       |  CAST(((s_c - s_f) * 1000000 + $TeSmooth * ((s_all * 1000000) // n_all))
       |    // (n_c - n_f + $TeSmooth) AS BIGINT) AS enc_micros
       |FROM w, g ORDER BY priority, fold""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_json_extract" -> (qJsonExtract _),
    "q_unpivot" -> (qUnpivot _),
    "q_profile" -> (qProfile _),
    "q_event_anomaly" -> (qEventAnomaly _),
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _),
    "q_pivot" -> (qPivot _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_semi_anti" -> (qSemiAnti _),
    "q_window_rank" -> (qWindowRank _),
    "q_window_frames" -> (qWindowFrames _),
    "q_zorder" -> (qZorder _),
    "q_datetime" -> (qDatetime _),
    "q_salted_join" -> (qSaltedJoin _),
    "q_bucket_join" -> (qBucketJoin _),
    "q_funnel" -> (qFunnel _),
    "q_group_topk" -> (qGroupTopK _),
    "q_incr_agg" -> (qIncrAgg _),
    "q_orc_roundtrip" -> (qOrcRoundtrip _),
    "q_schema_merge" -> (qSchemaMerge _),
    "q_mad_outliers" -> (qMadOutliers _),
    "q_quantile_bin" -> (qQuantileBin _),
    "q_kmv_groups" -> (qKmvGroups _),
    "q_basket_pairs" -> (qBasketPairs _),
    "q_event_transitions" -> (qEventTransitions _),
    "q_bloom_semi" -> (qBloomSemi _),
    "q_winsorize" -> (qWinsorize _),
    "q_rendezvous" -> (qRendezvous _),
    "q_sample_quantiles" -> (qSampleQuantiles _),
    "q_hits" -> (qHits _),
    "q_target_encode" -> (qTargetEncode _),
  )

  val oracles: Map[String, String] = Map(
    "q_json_extract" -> qJsonExtractSql,
    "q_unpivot" -> qUnpivotSql,
    "q_profile" -> qProfileSql,
    "q_event_anomaly" -> qEventAnomalySql,
    "q_asof_join" -> qAsofJoinSql,
    "q_range_join" -> qRangeJoinSql,
    "q_pivot" -> qPivotSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_semi_anti" -> qSemiAntiSql,
    "q_window_rank" -> qWindowRankSql,
    "q_window_frames" -> qWindowFramesSql,
    "q_zorder" -> qZorderSql,
    "q_datetime" -> qDatetimeSql,
    "q_salted_join" -> qSaltedJoinSql,
    "q_bucket_join" -> qBucketJoinSql,
    "q_funnel" -> qFunnelSql,
    "q_group_topk" -> qGroupTopKSql,
    "q_incr_agg" -> qIncrAggSql,
    "q_orc_roundtrip" -> qOrcRoundtripSql,
    "q_schema_merge" -> qSchemaMergeSql,
    "q_mad_outliers" -> qMadOutliersSql,
    "q_quantile_bin" -> qQuantileBinSql,
    "q_kmv_groups" -> qKmvGroupsSql,
    "q_basket_pairs" -> qBasketPairsSql,
    "q_event_transitions" -> qEventTransitionsSql,
    "q_bloom_semi" -> qBloomSemiSql,
    "q_winsorize" -> qWinsorizeSql,
    "q_rendezvous" -> qRendezvousSql,
    "q_sample_quantiles" -> qSampleQuantilesSql,
    "q_hits" -> qHitsSql,
    "q_target_encode" -> qTargetEncodeSql,
  )
}
