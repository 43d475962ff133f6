package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV sketch result: how many distinct hashes the buffer holds (≤ k)
  * and the k-th smallest (0 when fewer than one). */
case class KmvSketch(kActual: Int, kth: Long)

/** HLL sketch result: occupied-register count and the cardinality
  * estimate (see [[Hll.estimate]]). */
case class HllSketch(nBucketsSet: Long, estDistinct: Long)

/** HyperLogLog register math (Flajolet et al. 2007), pinned to the
  * engine-portable form BOTH Spark and DuckDB replay bit-exactly:
  *
  *  - hash  = the salted-md5 60-bit family ([[graft.functions.Hashing]])
  *  - bucket = hash mod 256, w = hash div 256 (a 52-bit remainder)
  *  - rho    = leading-zero rank of w in 52 bits, i.e. 53 − bitlen(w)
  *             (SQL: `53 - length(bin(w))` — `bin` prints without
  *             leading zeros in both engines; w = 0 → 53)
  *  - register r_j = max rho per bucket; empty buckets hold 0
  *  - S = Σ_j 2^(53 − r_j) — an EXACT long (≤ 256·2^53 = 2^61), the
  *    harmonic-mean denominator scaled by 2^53 so no per-bucket float
  *    division happens: Z = S / 2^53 and E_raw = α·m² / Z =
  *    [[AlphaM2TwoPow53]] / S — ONE double division of exact inputs
  *  - small-range branch (E_raw ≤ 2.5m and V > 0 empty buckets):
  *    linear counting m·ln(m/V). ln is libm territory (engines may
  *    disagree in the last ulp), so the 256 possible values are
  *    PRECOMPUTED into [[LinearCount]] and both engines read the same
  *    table — the replay path contains no transcendental call.
  *
  * Where KMV ([[KmvAggregator]]) keeps k·8 bytes and is exact below
  * k, HLL keeps a flat 256 bytes per group at ~6.5% standard error —
  * the cheaper sketch when profiling millions of groups. */
object Hll {
  val M = 256
  val MaxRho = 53

  /** α_m·m²·2^53 for m = 256 — the raw-estimate numerator. The value
    * is a plain double constant; its shortest decimal repr round-trips
    * identically into DuckDB's DOUBLE parser. */
  val AlphaM2TwoPow53: Double =
    0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0

  /** Linear-counting table: index V (empty buckets, 1..256) →
    * floor(m·ln(m/V) + 0.5). Index 0 unused. */
  val LinearCount: Array[Long] = (0 to M).map {
    case 0 => 0L
    case v => math.floor(M.toDouble * math.log(M.toDouble / v) + 0.5).toLong
  }.toArray

  /** rho of the 52-bit remainder (w = hash div 256). */
  def rho(w: Long): Int =
    if (w == 0L) MaxRho else java.lang.Long.numberOfLeadingZeros(w) - 11

  /** Cardinality estimate from the exact scaled harmonic sum S and
    * the empty-bucket count V. */
  def estimate(s: Long, v: Int): Long = {
    val raw = AlphaM2TwoPow53 / s.toDouble
    if (raw <= 2.5 * M && v > 0) LinearCount(v)
    else math.floor(raw + 0.5).toLong
  }

  /** (S, V) from a 256-byte register array. */
  def harmonics(regs: Array[Byte]): (Long, Int) = {
    var s = 0L
    var v = 0
    var j = 0
    while (j < M) {
      val r = regs(j).toInt
      s += 1L << (MaxRho - r)
      if (r == 0) v += 1
      j += 1
    }
    (s, v)
  }
}

/** 256-register HLL as a mergeable Aggregator over [[Hashing.hash60]]
  * values: state is a flat 256-byte array per group no matter the
  * cardinality, partial aggregation merges map-side, and the merge is
  * an elementwise register max — associative, commutative,
  * deterministic. */
private[graft] class HllAggregator
  extends Aggregator[Long, Array[Byte], HllSketch] {

  override def zero: Array[Byte] = new Array[Byte](Hll.M)

  override def reduce(buf: Array[Byte], h: Long): Array[Byte] = {
    val bucket = (h % Hll.M).toInt // hash60 is non-negative
    val r = Hll.rho(h / Hll.M)
    if (r > buf(bucket)) buf(bucket) = r.toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < Hll.M) {
      if (b(j) > a(j)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def finish(regs: Array[Byte]): HllSketch = {
    val (s, v) = Hll.harmonics(regs)
    HllSketch(Hll.M.toLong - v, Hll.estimate(s, v))
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[HllSketch] = Encoders.product[HllSketch]
}

/** Bottom-k-distinct-hashes buffer as a mergeable Aggregator — the
  * KMV distinct-count sketch ([[Sampling.kmvDistinct]]'s math) in
  * UDAF form, so it composes with ANY grouping, including streaming
  * windows: state per group is capped at k longs no matter the
  * cardinality, partial aggregation merges map-side, and the merge is
  * a sorted distinct union — associative, commutative, deterministic.
  * When fewer than k distinct hashes exist the sketch IS the exact
  * count. */
private[graft] class KmvAggregator(k: Int)
  extends Aggregator[Long, List[Long], KmvSketch] {
  require(k >= 2, s"k must be at least 2: $k")

  override def zero: List[Long] = Nil

  override def reduce(buf: List[Long], h: Long): List[Long] =
    if (buf.lengthCompare(k) >= 0 && h >= buf.last) buf
    else {
      val (pre, post) = buf.span(_ < h)
      if (post.headOption.contains(h)) buf // distinct: drop repeats
      else (pre ::: h :: post).take(k)
    }

  override def merge(a: List[Long], b: List[Long]): List[Long] = {
    val out = List.newBuilder[Long]
    var (l, r, n) = (a, b, 0)
    var last = Long.MinValue
    var first = true
    while (n < k && (l.nonEmpty || r.nonEmpty)) {
      val next =
        if (r.isEmpty || (l.nonEmpty && l.head <= r.head)) { val v = l.head; l = l.tail; v }
        else { val v = r.head; r = r.tail; v }
      if (first || next != last) { out += next; n += 1; last = next; first = false }
    }
    out.result()
  }

  override def finish(b: List[Long]): KmvSketch =
    KmvSketch(b.length, if (b.isEmpty) 0L else b.last)

  override def bufferEncoder: Encoder[List[Long]] = Encoders.kryo[List[Long]]
  override def outputEncoder: Encoder[KmvSketch] = Encoders.product[KmvSketch]
}

/** Mergeable frequency sketch: count-min (Cormode & Muthukrishnan,
  * "An improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 2005).
  *
  * The exact heavy-hitter pass (TextAnalysis — `q_heavy_hitters`)
  * shuffles a vocabulary-sized count table; at 100 TB with a web-scale
  * vocabulary even that partial-agg table is billions of keys. The CMS
  * bounds the shuffled state to depth × width counters NO MATTER the
  * corpus or vocabulary size: each token occurrence increments `depth`
  * cells picked by independent salted hashes, partial aggregation
  * collapses per-partition sketches map-side, and the merged sketch is
  * an elementwise sum — order- and partition-independent, so estimates
  * are deterministic. Point estimate = min over the depth rows; it
  * never under-counts, and over-counts by at most εN (ε = e/width)
  * with probability 1 − e^−depth.
  *
  * Hashes are the engine-portable salted-md5 family (Hashing.hash60,
  * salt = row index), so the whole sketch replays in the DuckDB
  * oracle. */
/** Count-min sketch (Cormode & Muthukrishnan 2005) as a mergeable
  * Aggregator over raw token strings: state is ONE flat depth×width
  * long matrix per group (row r, column c at index r·width+c), partial
  * aggregation merges map-side, and the merge is elementwise SUM —
  * associative, commutative, deterministic, and (unlike the HLL/KMV
  * estimates) LOSSLESS under sharding: summed shard cells equal the
  * single-shot cells exactly, so sketch-as-data rollups pay zero
  * accuracy for incremental builds. Hashes are the engine-portable
  * salted-md5 family ([[Hashing.hash60Jvm]], row r salted with r), the
  * same cells [[Sketches.cmsBuild]]'s relational path and the DuckDB
  * oracle compute. */
private[graft] class CmsAggregator(width: Int, depth: Int)
  extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], v: String): Array[Long] = {
    var r = 0
    while (r < depth) {
      buf(r * width + (Hashing.hash60Jvm(v, salt = r) % width).toInt) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(cells: Array[Long]): Array[Long] = cells

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object Sketches {

  val CmsDepth = 4

  /** Lower-cased whitespace tokens of a text column. */
  private def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** Builds the merged corpus sketch: one row per non-empty cell,
    * (row, cell, n) with row < depth, cell < width. Occurrences
    * explode once; the depth hashes are computed map-side from the
    * SAME token value (no extra pass), and the groupBy partial-agg is
    * the sketch merge. */
  def cmsBuild(df: DataFrame, textCol: String, width: Int,
               depth: Int = CmsDepth): DataFrame = {
    require(width >= 2 && depth >= 1, s"bad cms shape $depth x $width")
    val tok = df.select(explode(toks(col(textCol))).as("__tok"))
    val rows = (0 until depth).map(r =>
      struct(lit(r).as("row"), pmod(Hashing.hash60(col("__tok"), salt = r),
        lit(width.toLong)).as("cell")))
    tok.select(explode(array(rows: _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-group count-min sketches via the mergeable [[CmsAggregator]]:
    * one partial-aggregated shuffle carrying a flat depth×width long
    * matrix per (group, partition) — the UDAF form composes with ANY
    * grouping (shards, days, streaming windows), where [[cmsBuild]]'s
    * relational cells build one global sketch. Output: (key, cms)
    * with cms the flattened matrix. */
  def cmsPerGroup(df: DataFrame, keyCol: String, textCol: String,
                  width: Int, depth: Int = CmsDepth): DataFrame = {
    require(width >= 2 && depth >= 1, s"bad cms shape $depth x $width")
    val agg = org.apache.spark.sql.functions.udaf(
      new CmsAggregator(width, depth), Encoders.STRING)
    df.select(col(keyCol).as("key"), explode(toks(col(textCol))).as("__tok"))
      .groupBy("key")
      .agg(agg(col("__tok")).as("cms"))
  }

  /** Merge flattened CMS matrices across groups — elementwise sum via
    * a higher-order fold over the collected sketch list (the list is
    * #groups entries of depth×width longs: sketch-sized, never
    * data-sized). Lossless: equals the single-shot sketch exactly. */
  def cmsMerge(sketches: Column): Column =
    aggregate(sketches,
      lit(Array.empty[Long]),
      (acc, x) => when(size(acc) === 0, x)
        .otherwise(zip_with(acc, x, (a, b) => a + b)))

  /** Point-estimate a token against a flattened CMS matrix column:
    * min over the depth rows of the token's cell — pure codegen'd
    * Columns (element_at is 1-indexed). */
  def cmsPointEstimate(cms: Column, token: Column, width: Int,
                       depth: Int = CmsDepth): Column =
    least((0 until depth).map(r =>
      element_at(cms, (lit(r * width) +
        pmod(Hashing.hash60(token, salt = r), lit(width.toLong)) + 1)
        .cast("int"))): _*)

  /** Point-estimates the probe tokens against a built sketch: joins
    * each probe's depth cells (a `depth × |probes|` build side — tiny,
    * broadcastable) and takes the row-wise min. Probes absent from the
    * corpus still return a row (their cells exist only via collisions;
    * min over empty matches → 0). */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, probeCol: String,
                  width: Int, depth: Int = CmsDepth): DataFrame = {
    val pcells = (0 until depth).foldLeft(Seq.empty[DataFrame]) { (acc, r) =>
      acc :+ probes.select(col(probeCol),
        lit(r).cast("long").as("row"),
        pmod(Hashing.hash60(col(probeCol), salt = r), lit(width.toLong)).as("cell"))
    }.reduce(_ unionAll _)
    pcells.join(cells, Seq("row", "cell"), "left")
      .groupBy(col(probeCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
  }

  /** KMV estimator columns from an aggregated [[KmvSketch]] struct
    * column: (k_actual, kth_hash, est_distinct) — `(k−1)·2^60 / h_(k)`
    * above k, the exact count below it ([[Sampling.kmvDistinct]]'s
    * math; shared by the batch per-group and streaming per-window
    * paths so the estimator is written once). */
  private[graft] def kmvColumns(kmv: Column, k: Int): Seq[Column] = {
    val twoPow60 = 1152921504606846976.0 // 2^60, exact in double
    Seq(kmv.getField("kActual").cast("long").as("k_actual"),
      kmv.getField("kth").as("kth_hash"),
      (floor(when(kmv.getField("kActual") < k,
        kmv.getField("kActual").cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(twoPow60) /
          kmv.getField("kth").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
        .as("est_distinct"))
  }

  /** Per-group distinct-count estimates via the mergeable KMV sketch
    * ([[KmvAggregator]]): one partial-aggregated shuffle carrying at
    * most k longs per (group, partition) — the bounded-state answer
    * to per-domain/per-day cardinality profiling where an exact
    * `countDistinct` shuffles every distinct key. Exact below k.
    * Output: (key, k_actual, kth_hash, est_distinct). */
  def kmvPerGroup(df: DataFrame, keyCol: String, valueCol: String,
                  k: Int): DataFrame = {
    val agg = org.apache.spark.sql.functions.udaf(
      new KmvAggregator(k), Encoders.scalaLong)
    // NULL values hash to NULL, which the primitive-Long UDAF input
    // can't represent; drop them up front — matching count(DISTINCT v)
    // semantics, which also ignores NULLs
    df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("key"),
        Hashing.hash60(col(valueCol).cast("string")).as("__h"))
      .groupBy("key")
      .agg(agg(col("__h")).as("kmv"))
      .select(col("key") +: kmvColumns(col("kmv"), k): _*)
  }

  /** Per-group distinct-count estimates via the mergeable 256-register
    * HLL sketch ([[HllAggregator]]): one partial-aggregated shuffle
    * carrying a flat 256 bytes per (group, partition) — constant where
    * KMV's k longs are already bounded, and the better fit when the
    * group count itself is huge (per-domain cardinality over millions
    * of domains). Output: (key, n_buckets_set, est_distinct). */
  def hllPerGroup(df: DataFrame, keyCol: String,
                  valueCol: String): DataFrame = {
    val agg = org.apache.spark.sql.functions.udaf(
      new HllAggregator, Encoders.scalaLong)
    // NULL values hash to NULL, which the primitive-Long UDAF input
    // can't represent (and the oracle's register CTE would count a
    // NULL-bucket row); drop them up front — count(DISTINCT v)
    // semantics, mirrored by `WHERE v IS NOT NULL` in hllEstSql
    df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("key"),
        Hashing.hash60(col(valueCol).cast("string")).as("__h"))
      .groupBy("key")
      .agg(agg(col("__h")).as("hll"))
      .select(col("key"),
        col("hll.nBucketsSet").as("n_buckets_set"),
        col("hll.estDistinct").as("est_distinct"))
  }

  // ---------------------------------------------------------------
  // Persisted / mergeable HLL register TABLES. hllPerGroup answers a
  // one-shot question; at 100 TB the pattern that matters is sketch-
  // AS-DATA: each ingest batch (a day, a crawl shard) reduces to a
  // register table bounded at batches × keys × 256 rows, persisted as
  // ordinary parquet, and any later question over any batch subset is
  // answered by merging REGISTERS (an elementwise max — associative,
  // commutative, lossless for HLL) without ever rescanning raw data.
  // The register math is the exact engine-portable form the Hll
  // scaladoc pins, expressed as pure Columns so the whole pipeline —
  // build, merge, estimate — replays in a SQL oracle.
  // ---------------------------------------------------------------

  /** Per-batch HLL register table: (batch, key, bucket, r) with
    * r = max rho over the batch's values — one partial-aggregated
    * shuffle, output bounded at batches × keys × 256 rows no matter
    * the corpus. Store it; merge any subset later. Absent buckets are
    * empty registers (rho ≥ 1 for every present row, so presence ≡
    * occupied — same convention as [[HllAggregator]]'s zero-filled
    * array). NULL values are dropped, matching count(DISTINCT). */
  def hllRegisters(df: DataFrame, batchCol: String, keyCol: String,
                   valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(col(batchCol).as("batch"), col(keyCol).as("key"),
        Hashing.hash60(col(valueCol).cast("string")).as("h"))
      // h div 256 must be an INTEGER division: h is up to 2^60, so a
      // double-precision `/` would round above 2^53
      .select(col("batch"), col("key"),
        pmod(col("h"), lit(Hll.M.toLong)).as("bucket"),
        expr(s"h div ${Hll.M}").as("w"))
      .select(col("batch"), col("key"), col("bucket"),
        when(col("w") === 0L, lit(Hll.MaxRho))
          .otherwise(lit(Hll.MaxRho) - length(bin(col("w"))).cast("int"))
          .as("rho"))
      .groupBy("batch", "key", "bucket")
      .agg(max(col("rho")).as("r"))

  /** Merges a register table across ALL its batches and estimates the
    * union cardinality per key: register merge = elementwise max (one
    * keys × 256-bounded shuffle), then the exact scaled-harmonic-sum
    * estimator of [[Hll.estimate]] as one Column expression (the 256
    * linear-counting values ride as an array literal, so the replay
    * path still contains no transcendental call). Output:
    * (key, n_buckets_set, est_distinct) — identical to what
    * [[hllPerGroup]] would report on the concatenated batches, which
    * is the mergeability contract callers should assert. */
  def hllMergeEstimate(regs: DataFrame): DataFrame = {
    val lcLit = array((1 to Hll.M).map(v => lit(Hll.LinearCount(v))): _*)
    val raw = lit(Hll.AlphaM2TwoPow53) / col("s").cast("double")
    regs.groupBy(col("key"), col("bucket"))
      .agg(max(col("r")).as("r"))
      .groupBy("key")
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${Hll.MaxRho} - r)"))
          .as("sp"),
        count(lit(1)).as("p"))
      .select(col("key"),
        (col("sp") + (lit(Hll.M.toLong) - col("p"))
          * lit(1L << Hll.MaxRho)).as("s"),
        (lit(Hll.M.toLong) - col("p")).as("nv"))
      .select(col("key"),
        (lit(Hll.M.toLong) - col("nv")).as("n_buckets_set"),
        when(raw <= lit(2.5 * Hll.M) && col("nv") > 0,
          element_at(lcLit, col("nv").cast("int")))
          .otherwise(floor(raw + lit(0.5)).cast("long"))
          .as("est_distinct"))
  }

  /** Builds a Bloom filter over the DISTINCT build-side keys as a
    * sparse word table `(word_idx, word)` — the runtime-filter
    * primitive behind semi-join reduction: at 100 TB the probe side
    * (fact rows) never shuffles to discover that most of it joins
    * nothing; a kilobyte-sized filter rides a broadcast and prunes
    * map-side. Stored as data (like [[hllRegisters]]) the filter is
    * also MERGEABLE: filters of two key batches over the same
    * (mBits, k, salt) geometry union by elementwise `bit_or` —
    * build once per ingest batch, merge cheaply forever.
    *
    * Geometry: `mBits` bits in 32-bit words (bit b of word w is bit
    * `pos = 32·w + b` where `pos = hash60(key, salt+i) mod mBits`,
    * i < k). Only 32 of each word's 64 bits are used so the
    * `1 << bit` never touches the BIGINT sign bit — both engines
    * agree without two's-complement edge cases. Absent words are
    * all-zero (the table is sparse).
    *
    * The classic contract holds by construction: NO false negatives
    * ever; the false-positive rate is ~(1 − e^(−k·n/m))^k and
    * saturates as n grows past m/k — size `mBits` to the build-side
    * cardinality, and measure (as `q_bloom_semi` does) rather than
    * trust the formula. */
  def bloomWords(keys: DataFrame, keyCol: String, mBits: Int, k: Int,
                 salt: Int = 0): DataFrame = {
    require(mBits >= 64 && mBits % 32 == 0, s"mBits must be a positive multiple of 32, got $mBits")
    require(k >= 1 && k <= 16, s"k hashes out of range: $k")
    val ks = keys.select(col(keyCol).cast("string").as("__k"))
      .where(col("__k").isNotNull).distinct()
    val pos = (0 until k).map(i =>
      pmod(Hashing.hash60(col("__k"), salt = salt + i), lit(mBits.toLong)))
    ks.select(explode(array(pos: _*)).as("pos"))
      .groupBy(shiftright(col("pos"), 5).as("word_idx"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        col("pos").bitwiseAND(lit(31L)).cast("int"))).as("word"))
  }

  /** Bottom-k uniform row sample per (batch, key) as DATA — the
    * distribution sketch that completes the mergeable family (HLL =
    * distinct, KMV = distinct/overlap, CMS = frequency, Bloom =
    * membership, this = quantiles): hashing each row's unique id and
    * keeping the k smallest hashes yields a uniform k-sample of the
    * rows that MERGES exactly — bottom-k of a union is the bottom-k
    * of the concatenated bottom-k tables — so per-ingest-batch sample
    * tables can be stored and quantile-estimated across any batch
    * subset without rescanning raw data.
    *
    * `idCol` must be row-unique (the contract that makes the sample
    * uniform and the merge deterministic; (hash, value) ordering
    * breaks the astronomically-unlikely hash tie). Values floor to
    * micros longs at sketch time, so everything downstream is exact
    * integer arithmetic. One window shuffle keyed by (batch, key);
    * output ≤ k rows per (batch, key): (batch, key, h, vm). */
  def sampleBottomK(df: DataFrame, batchCol: String, keyCol: String,
                    idCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("batch", "key").orderBy(col("h"), col("vm"))
    df.filter(col(valueCol).isNotNull)
      .select(col(batchCol).as("batch"), col(keyCol).as("key"),
        Hashing.hash60(col(idCol).cast("string")).as("h"),
        floor(col(valueCol).cast("double") * lit(1e6) + lit(0.5))
          .cast("long").as("vm"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k).drop("rn")
  }

  /** Merges bottom-k sample tables across ALL their batches and
    * estimates per-key quantiles: re-prune to the global bottom-k by
    * hash (THE merge — identical to one-shot sampling of the
    * concatenated batches, the mergeability contract callers assert),
    * then read the ceil(p·n)-th smallest sampled value (1-based,
    * clamped ≥ 1) for each probability. The collect_list is k-bounded
    * per key — nothing unbounded ever aggregates. Output: (key,
    * n_sample, est_p<label>_micros per probability). */
  def sampleMergeQuantiles(samples: DataFrame, k: Int,
                           probs: Seq[(String, Double)]): DataFrame = {
    require(k >= 1 && probs.nonEmpty, "need k >= 1 and probabilities")
    probs.foreach { case (_, p) =>
      require(p > 0.0 && p <= 1.0, s"probability out of (0, 1]: $p") }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("h"), col("vm"))
    val merged = samples
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
    val sorted = merged.groupBy("key")
      .agg(sort_array(collect_list(col("vm"))).as("vs"),
        count(lit(1)).as("n_sample"))
    val ests = probs.map { case (label, p) =>
      element_at(col("vs"),
        greatest(ceil(lit(p) * col("n_sample")), lit(1L)).cast("int"))
        .as(s"est_p${label}_micros")
    }
    sorted.select(col("key") +: col("n_sample") +: ests: _*)
  }

  /** Map-side membership test against a built filter: collects the
    * word table into a literal array (mBits/32 longs — a model-sized
    * collect, same discipline as centroid/codebook broadcasts) and
    * returns a boolean Column that probes all k bit positions with
    * ZERO joins and zero shuffles — exactly how an engine applies a
    * runtime filter under a scan. True = "might be in the build set"
    * (possible false positive), false = definitely absent. */
  def bloomMightContain(words: DataFrame, keyExpr: Column, mBits: Int,
                        k: Int, salt: Int = 0): Column = {
    val arr = new Array[Long](mBits / 32)
    words.collect().foreach { r =>
      val i = r.getAs[Long]("word_idx")
      require(i >= 0 && i < arr.length,
        s"word_idx $i outside the $mBits-bit geometry — filter built " +
          "with different mBits?")
      arr(i.toInt) = r.getAs[Long]("word")
    }
    val lits = array(arr.map(lit(_)): _*)
    (0 until k).map { i =>
      val pos = pmod(Hashing.hash60(keyExpr.cast("string"), salt = salt + i),
        lit(mBits.toLong))
      (element_at(lits, shiftright(pos, 5).cast("int") + lit(1))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pos.bitwiseAND(lit(31L)).cast("int"))) =!= lit(0L))
    }.reduce(_ && _)
  }
}
