package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // ---- chunking ----

  test("chunkDocs tiles text with overlap and clips the tail") {
    val s = spark
    import s.implicits._
    // len 10, size 4, stride 3 -> windows at 1,4,7 (last covers 7..10)
    val df = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    val got = Packing.chunkDocs(df, "doc_id", "text", 4, 3)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, "abcd", 4L), (1L, "defg", 4L), (2L, "ghij", 4L)))
  }

  test("chunkDocs emits one clipped chunk for short docs") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "ab")).toDF("doc_id", "text")
    val got = Packing.chunkDocs(df, "doc_id", "text", 4, 3).collect()
    assert(got.length == 1 && got(0).getString(2) == "ab")
  }

  test("chunkDocs at an exact window boundary emits no empty chunk") {
    val s = spark
    import s.implicits._
    // len 8 = size + stride: windows at 1 and 5 only (5..8 reaches end)
    val df = Seq((1L, "abcdefgh")).toDF("doc_id", "text")
    val got = Packing.chunkDocs(df, "doc_id", "text", 4, 4)
      .orderBy("chunk_id").collect().map(_.getString(2))
    assert(got.toSeq == Seq("abcd", "efgh"))
    assert(got.forall(_.nonEmpty))
  }

  test("chunkDocs covers every character: concat of stride-prefixes rebuilds the text") {
    val s = spark
    import s.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Packing.chunkDocs(df, "doc_id", "text", 20, 15)
      .orderBy("chunk_id").collect().map(_.getString(2))
    val rebuilt = chunks.init.map(_.take(15)).mkString + chunks.last
    assert(rebuilt == text)
  }

  // ---- packing ----

  private def packFrame = {
    val s = spark
    import s.implicits._
    // one shard; weights chosen to force a straddle (concat) and a
    // next-fit break + an oversized doc (greedy) at budget 10
    Seq((1L, 4L), (2L, 5L), (3L, 3L), (4L, 12L), (5L, 2L))
      .toDF("doc_id", "w")
  }

  test("packConcat lays docs end-to-end: straddles cut, offsets are mod-budget") {
    val got = Packing
      .packConcat(packFrame, "doc_id", col("w"), lit(0L), budget = 10L)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    // cum-before: 0,4,9,12,24 -> first 0,0,0,1,2 ; last covers w tokens
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 0L),   // tokens 0..3
      (2L, 0L, 0L, 4L),   // tokens 4..8
      (3L, 0L, 1L, 9L),   // tokens 9..11 -> straddles seq 0/1
      (4L, 1L, 2L, 2L),   // tokens 12..23 -> straddles seq 1/2
      (5L, 2L, 2L, 4L)))
  }

  test("packConcat with zero-weight doc stays within its boundary sequence") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L), (2L, 0L), (3L, 1L)).toDF("doc_id", "w")
    val got = Packing.packConcat(df, "doc_id", col("w"), lit(0L), 10L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
    // doc 2 has no tokens; it pins to the sequence its boundary is in
    assert(got.toSeq == Seq((1L, 0L, 0L), (2L, 1L, 1L), (3L, 1L, 1L)))
  }

  test("packGreedy next-fit: closes bins, isolates oversized docs, resets fill") {
    val got = Packing
      .packGreedy(packFrame, "doc_id", col("w"), lit(0L), budget = 10L)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
    // 4+5 fit bin 0 (fill 9); 3 overflows -> bin 1; 12 overflows -> own
    // bin 2 (over budget alone); 2 cannot join a 12-full bin -> bin 3
    assert(got.toSeq == Seq(
      (1L, 0L, 4L), (2L, 0L, 9L), (3L, 1L, 3L), (4L, 2L, 12L), (5L, 3L, 2L)))
  }

  test("packGreedy packs shards independently and never mixes them") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 6L), (1L, 6L), (2L, 6L), (3L, 6L)).toDF("doc_id", "w")
    val got = Packing
      .packGreedy(df, "doc_id", col("w"), col("doc_id") % 2, budget = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .sortBy(r => (r._1, r._2))
    // each shard sees two 6s: second one opens bin 1 in BOTH shards
    assert(got.toSeq == Seq(
      (0L, 0L, 0L), (0L, 2L, 1L), (1L, 1L, 0L), (1L, 3L, 1L)))
  }

  test("packGreedy never splits a doc and never overfills a multi-doc bin") {
    val s = spark
    import s.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val packed = Packing.packGreedy(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), col("doc_id") % 8, 256L)
    val bins = packed.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("n_docs"))
    assert(bins.filter(col("tot") > 256 && col("n_docs") > 1).count() == 0,
      "a bin over budget must be a single oversized doc")
    assert(packed.count() == docs.count(), "every doc packs exactly once")
  }

  // ---- quality filter ----

  test("qualityFilter flags each rule independently") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the cat sat on a mat with the dog and a bird by the door"), // clean
      (2L, "x y"),                                    // too short
      (3L, ("the a of " * 10).trim),                  // dup/top heavy, stopword rich
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")) // no stopwords
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityFilter(df, "doc_id", "text",
      minTokens = 5, maxTokens = 50, minStopRatio = 0.02,
      maxDupRatio = 0.6, maxTopRatio = 0.3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got(1L) == ((1L, 1L, 1L, 1L, 1L)), "clean doc keeps")
    assert(got(2L)._1 == 0L && got(2L)._5 == 0L, "short doc fails ok_len")
    assert(got(3L)._3 == 0L && got(3L)._5 == 0L, "repetitive doc fails ok_dup")
    assert(got(4L)._2 == 0L && got(4L)._5 == 0L, "stopword-free doc fails ok_stop")
  }

  // ---- merge ----

  test("merge applies upserts, inserts, deletes; null payload keeps base value") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "v", "n")
    val changes = Seq(
      (2L, "B", null.asInstanceOf[Integer], "U"),  // update v, keep n
      (4L, "d", Integer.valueOf(40), "U"),         // insert
      (3L, null.asInstanceOf[String], null.asInstanceOf[Integer], "D"))
      .toDF("id", "v", "n", "op")
    val got = MergeOps.merge(base, changes, "id", "op")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, "a", 10), (2L, "B", 20), (4L, "d", 40)))
  }

  test("merge with an empty changeset is the identity") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val changes = Seq.empty[(Long, String, String)].toDF("id", "v", "op")
    val got = MergeOps.merge(base, changes, "id", "op")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  // ---- token-budget cap ----

  test("tokenCapPerStratum keeps the maximal prefix per stratum, by id order") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 1L, 4L), ("a", 2L, 4L), ("a", 3L, 3L),  // 4+4=8, +3 busts 10
      ("b", 1L, 20L), ("b", 2L, 1L))                // first row busts alone
      .toDF("src", "id", "w")
    val got = Sampling.tokenCapPerStratum(df, "src", "id", "w", budget = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 1L), ("a", 2L)),
      "oversized first row takes nothing; prefix stops at the budget")
  }

  test("tokenCapPerStratum is partition-independent") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(i => (s"s${i % 4}", i, i % 7 + 1))
      .toDF("src", "id", "w")
    val once = Sampling.tokenCapPerStratum(df, "src", "id", "w", 50L)
      .collect().map(_.getLong(1)).toSet
    val again = Sampling.tokenCapPerStratum(df.repartition(13), "src", "id", "w", 50L)
      .collect().map(_.getLong(1)).toSet
    assert(once == again)
  }

  // ---- SCD-2 history ----

  test("scd2 closes matched rows, opens upserts, keeps history untouched") {
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, "old1", 0L, Some(50L)),   // closed history: must pass through
      (1L, "cur1", 50L, None),       // updated at ts=100
      (2L, "cur2", 0L, None),        // untouched
      (3L, "cur3", 0L, None))        // deleted at ts=100
      .toDF("id", "v", "valid_from", "valid_to")
    val changes = Seq(
      (1L, "new1", "U"), (3L, null.asInstanceOf[String], "D"),
      (4L, "ins4", "U"))
      .toDF("id", "v", "op")
    val got = MergeOps.scd2(base, changes, "id", "op", batchTs = 100L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == Set(
      (1L, "old1", 0L, 50L),    // history untouched
      (1L, "cur1", 50L, 100L),  // closed by the upsert
      (1L, "new1", 100L, -1L),  // new current version
      (2L, "cur2", 0L, -1L),    // untouched current
      (3L, "cur3", 0L, 100L),   // closed by the delete, nothing opened
      (4L, "ins4", 100L, -1L))) // insert opens with no closure
  }

  // ---- split assignment ----

  test("splitAssign puts every member of a cluster in the same split") {
    val s = spark
    import s.implicits._
    val df = (1L to 300L).map(i => (i, s"cluster${i % 30}")).toDF("id", "cl")
    val got = Sampling.splitAssign(df, "cl", testPermille = 200,
      valPermille = 200).select("cl", "split").distinct()
    // 30 clusters -> exactly 30 distinct (cluster, split) pairs
    assert(got.count() == 30)
    val splits = got.collect().map(_.getString(1)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.size >= 2,
      s"with 30 clusters at 20/20/60 expect >=2 splits hit, got $splits")
  }

  test("splitAssign fractions are rate-accurate on many clusters") {
    val s = spark
    import s.implicits._
    val df = (1L to 2000L).map(i => (i, s"c$i")).toDF("id", "cl")
    val byS = Sampling.splitAssign(df, "cl", 100, 100)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("test") > 140 && byS("test") < 260, s"~10% test: $byS")
    assert(byS("val") > 140 && byS("val") < 260, s"~10% val: $byS")
    assert(byS("train") > 1500, s"~80% train: $byS")
  }

  // ---- bigram LM scoring ----

  test("bigramLmScore: hand-checked Laplace bigram math on a toy corpus") {
    val s = spark
    import s.implicits._
    // corpus: "a b" (x2 docs), "a c". V=3. c(a b)=2, c(a c)=1, c(a .)=3
    // p(b|a) = (2+1)/(3+3) = 0.5 ; p(c|a) = (1+1)/(3+3) = 1/3
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got(1L)._1 == 1L && math.abs(got(1L)._2 - math.log(0.5)) < 1e-5)
    assert(got(3L)._1 == 1L && math.abs(got(3L)._2 - math.log(1.0 / 3)) < 1e-5)
  }

  test("bigramLmScore ranks a garbled doc below natural ones") {
    val s = spark
    import s.implicits._
    val natural = "the cat sat on the mat and the dog sat on the rug"
    val df = Seq(
      (1L, natural), (2L, natural), (3L, natural),
      (4L, "rug the on mat dog sat cat the and on the sat mat dog"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(4L) < got(1L),
      s"scrambled word order must score below the natural majority: $got")
  }

  test("bigramLmScore is partition-independent (integer-micros sum)") {
    val s = spark
    import s.implicits._
    val base = (1L to 60L).map(i =>
      (i, s"tok${i % 5} tok${(i + 1) % 5} tok${(i + 2) % 5} tok${i % 7}"))
    val a = TextAnalysis.bigramLmScore(base.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val b = TextAnalysis.bigramLmScore(
      base.toDF("doc_id", "text").repartition(17), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(a == b)
  }

  // ---- plan pins: the 100 TB shape claims ----

  test("chunkDocs plans no shuffle and no join — pure map-side explode") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(i => (i, "x" * (i.toInt % 300 + 10)))
      .toDF("doc_id", "text")
    val got = Packing.chunkDocs(df, "doc_id", "text", 64, 48)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange"),
      s"chunking must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"chunking must not join:\n$plan")
  }

  test("packGreedy plans exactly one hash shuffle (by shard) and no join") {
    val s = spark
    import s.implicits._
    val df = (1L to 200L).map(i => (i, i % 7 + 1)).toDF("doc_id", "w")
    val got = Packing.packGreedy(df, "doc_id", col("w"),
      col("doc_id") % 8, budget = 10L)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1,
      s"greedy packing must shuffle exactly once (got $shuffles):\n$plan")
    assert(!plan.contains("Join"), s"packing must not join:\n$plan")
  }

  test("merge plans one key-partitioned join and no nested-loop/cartesian") {
    val s = spark
    import s.implicits._
    val base = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val changes = (1L to 20L).map(i => (i * 5, s"u$i", "U"))
      .toDF("id", "v", "op")
    val got = MergeOps.merge(base, changes, "id", "op")
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"merge must be a key-partitioned join:\n$plan")
    for (bad <- Seq("BroadcastNestedLoopJoin", "CartesianProduct"))
      assert(!plan.contains(bad), s"unexpected $bad in merge plan:\n$plan")
  }

  // ---- end-to-end curation composition ----

  test("clean-corpus composition: redaction runs BEFORE dedup, quality gate applies") {
    val s = spark
    import s.implicits._
    // stopword-rich filler so the quality rules pass for the docs
    // that should survive
    // ≥ 20 tokens, stopword mass over 2%, and NO token above the
    // 12.5% dominance cap (the first draft had "the" at 17%)
    val filler = "the cat of a house and one dog by this barn is to " +
      "be seen while some bird on that tree may fly over green fields " +
      "and a small fish in our pond will swim under tall reeds near " +
      "my bank today with calm air around"
    val df = Seq(
      (1L, s"contact alice@example.com now $filler"),
      // same text except for the email: collapses with doc 1 only if
      // redaction happens before dedup — keeps min id 1
      (2L, s"contact bob@sample.org now $filler"),
      (3L, s"unique quality content here $filler"),
      (4L, "tiny"), // fails the min-token rule
      (5L, "spam " * 60)) // fails the dup/top rules
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("clean_corpus_docs")
    val red = df.withColumn("text", TextAnalysis.redactPii(col("text")))
    val canon = Dedup.exact(red, "doc_id", "text")
      .select(col("min_doc_id").as("doc_id"))
    val qual = TextAnalysis.qualityFilter(red, "doc_id", "text",
        20L, 90L, 0.02, 0.6, 0.125)
      .filter(col("keep") === 1).select(col("id").as("doc_id"))
    val kept = red.join(canon, Seq("doc_id"), "left_semi")
      .join(qual, Seq("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L))
  }

  // ---- inverted index ----

  test("invertedIndex counts df/tf and caps sorted postings") {
    val s = spark
    import s.implicits._
    val df = Seq((3L, "b a a"), (1L, "a b"), (2L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(df, "doc_id", "text", maxPostings = 2)
      .orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      ("a", 2L, 3L, "1,3"),      // df 2, tf 1+2, sorted ids
      ("b", 3L, 3L, "1,2")))     // postings capped at 2 of 3
  }

  test("extractPiiSpans: planted spans in order; email digits never double as phones") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "mail a.b@x.co or c@d.org, call +1 415-555-0123 now"),
      (2L, "digits12345678@example.com only"), // email digits, no phone
      (3L, "clean text, nothing here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.extractPiiSpans(d, "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("kind"),
        r.getAs[Long]("span_idx"), r.getAs[String]("span"))).toSet
    assert(got == Set(
      (1L, "email", 0L, "a.b@x.co"),
      (1L, "email", 1L, "c@d.org"),
      (1L, "phone", 0L, "+1 415-555-0123"),
      (2L, "email", 0L, "digits12345678@example.com")))
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, Some(10.0), "A"), (2L, Some(20.0), "B"),
      (3L, Some(30.0), "C"), (4L, Option.empty[Double], "D"))
      .toDF("k", "price", "st")
    val next = Seq((2L, Some(20.0), "B"), // unchanged -> dropped
      (3L, Some(99.0), "C"),              // price changed
      (4L, Some(40.0), "D"),              // NULL -> value = changed
      (5L, Some(50.0), "E"))              // added
      .toDF("k", "price", "st")
    val got = MergeOps.snapshotDiff(base, next, "k", Seq("price", "st"))
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[String]("status"))
      .toMap
    assert(got == Map(1L -> "removed", 3L -> "changed",
      4L -> "changed", 5L -> "added"))
  }

  test("snapshotDiff recovered changeset applied through merge rebuilds next") {
    val s = spark
    import s.implicits._
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    val base = o.filter(col("o_orderkey") < 2000)
    val next = o.filter(col("o_orderkey") >= 500 && col("o_orderkey") < 2500)
    val diff = MergeOps.snapshotDiff(base, next, "o_orderkey",
      Seq("o_totalprice", "o_orderstatus"))
    // the diff's key sets reconstruct next from base
    val st = diff.collect().groupBy(_.getAs[String]("status"))
      .view.mapValues(_.map(_.getAs[Long]("key")).toSet).toMap
    val baseKeys = base.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val nextKeys = next.select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(st.getOrElse("added", Set.empty) == nextKeys -- baseKeys)
    assert(st.getOrElse("removed", Set.empty) == baseKeys -- nextKeys)
    // identical overlapping payloads (same source table) -> no 'changed'
    assert(!st.contains("changed"))
  }
}
