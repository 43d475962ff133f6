package graft.fit

import graft.SparkTestSession
import graft.meta.{AttrMeta, C45Schema}
import graft.model.{CatEq, NumGT, NumLE, Rule}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RuleSimplifySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = C45Schema(Seq(
    AttrMeta("a", isNumeric = false), AttrMeta("x", isNumeric = true)),
    "cls", Seq("n", "p"))

  test("an irrelevant condition drops; a load-bearing one survives") {
    val s = spark
    import s.implicits._
    // class is decided ENTIRELY by a; the x<=5 conditions are noise the
    // tree happened to pick up. Dropping x from "a=t & x<=5 -> p"
    // widens it to all of a=t (still pure p -> same 0 observed error,
    // bigger n -> LOWER pessimistic rate). Dropping a instead would
    // admit the opposite class.
    val leaves = Vector(
      Rule(Vector(0 -> CatEq("t"), 1 -> NumLE(5.0)), Some("p")),
      Rule(Vector(0 -> CatEq("t"), 1 -> NumGT(5.0)), Some("p")),
      Rule(Vector(0 -> CatEq("u")), Some("n")))
    val model = C45Model(schema, leaves, "p")
    val rows = (1 to 50).map(i => ("t", i % 10 + 0.0, "p")) ++
      (1 to 50).map(i => ("u", i % 10 + 0.0, "n"))
    val out = C45RuleSimplify.simplify(model, rows.toDF("a", "x", "cls"))
    assert(out.leaves.map(_.encode).toSet == Set("0,t:p", "0,u:n"))
  }

  test("a necessary condition is never dropped") {
    val s = spark
    import s.implicits._
    // XOR structure: BOTH conditions of every rule are load-bearing —
    // dropping either admits an equal-sized wrong-class region and the
    // pessimistic rate jumps from ~0 to ~0.5.
    val leaves = Vector(
      Rule(Vector(0 -> CatEq("t"), 1 -> NumLE(5.0)), Some("p")),
      Rule(Vector(0 -> CatEq("t"), 1 -> NumGT(5.0)), Some("n")),
      Rule(Vector(0 -> CatEq("u"), 1 -> NumLE(5.0)), Some("n")),
      Rule(Vector(0 -> CatEq("u"), 1 -> NumGT(5.0)), Some("p")))
    val model = C45Model(schema, leaves, "p")
    val rows = for {
      a <- Seq("t", "u"); x <- 0 to 9; _ <- 1 to 5
    } yield (a, x + 0.0, if ((a == "t") == (x <= 5)) "p" else "n")
    val out = C45RuleSimplify.simplify(model, rows.toDF("a", "x", "cls"))
    assert(out.leaves.map(_.encode).toSet == leaves.map(_.encode).toSet)
  }

  test("dropSubsumed: strict, numeric-implication, label and tie cases") {
    val gen = Rule(Vector(0 -> CatEq("t")), Some("p"))
    val spec = Rule(Vector(0 -> CatEq("t"), 1 -> NumGT(3.0)), Some("p"))
    val other = Rule(Vector(0 -> CatEq("t"), 1 -> NumGT(3.0)), Some("n"))
    // strictly-more-general same-label rule absorbs the specific one;
    // a different-label rule is untouched
    assert(C45RuleSimplify.dropSubsumed(Vector(gen, spec, other)) ==
      Vector(gen, other))
    // numeric implication: x<=3 implies x<=5
    val le5 = Rule(Vector(1 -> NumLE(5.0)), Some("p"))
    val le3 = Rule(Vector(1 -> NumLE(3.0), 0 -> CatEq("t")), Some("p"))
    assert(C45RuleSimplify.dropSubsumed(Vector(le5, le3)) == Vector(le5))
    // mutually-equivalent (permuted conditions): the earlier one stays
    val ab = Rule(Vector(0 -> CatEq("t"), 1 -> NumLE(5.0)), Some("p"))
    val ba = Rule(Vector(1 -> NumLE(5.0), 0 -> CatEq("t")), Some("p"))
    assert(C45RuleSimplify.dropSubsumed(Vector(ab, ba)) == Vector(ab))
  }

  test("dropSubsumed: a LATER general rule does not remove the specific one") {
    // first-match order [specific p, other-label n, general p]: rows in
    // (a=t & x>3) hit the specific rule and predict p; removing it
    // would let the different-label rule at rank 1 capture them. The
    // specific rule is only dead code when the general rule PRECEDES it.
    val spec = Rule(Vector(0 -> CatEq("t"), 1 -> NumGT(3.0)), Some("p"))
    val other = Rule(Vector(0 -> CatEq("t")), Some("n"))
    val gen = Rule(Vector(1 -> NumGT(1.0)), Some("p"))
    assert(C45RuleSimplify.dropSubsumed(Vector(spec, other, gen)) ==
      Vector(spec, other, gen))
  }

  test("planted-noise fit: simplification recovers the exact XOR rule set") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val sch = C45Schema(
      Seq(AttrMeta("l_returnflag", isNumeric = false),
        AttrMeta("l_quantity", isNumeric = true),
        AttrMeta("l_discount", isNumeric = true)),
      "cls", Seq("N", "P"))
    val noisy = graft.functions.Hashing.hash60(
      concat_ws("|", col("l_orderkey"), col("l_linenumber"))) % 10 === 0
    val base = (col("l_returnflag") === "A") === (col("l_quantity") <= lit(25.0))
    val df = spark.read.parquet(s"$sf/lineitem.parquet").withColumn("cls",
      when(base =!= noisy, lit("P")).otherwise(lit("N")))
    val model = C45.fit(df, sch, C45Params(maxDepth = 4))
    val out = C45RuleSimplify.simplify(model, df)
    // every simplified rule is drop-only: its condition set is a subset
    // of some original leaf's (generalization never invents conditions)
    val origSets = model.leaves.map(_.conditions.toSet)
    assert(out.leaves.forall(r => origSets.exists(r.conditions.toSet.subsetOf(_))))
    // and the recovered set is exactly the planted 6-rule XOR structure
    assert(out.leaves.map(_.encode).toSet == Set(
      "1,<=25.0&0,A:P", "1,<=25.0&0,N:N", "1,<=25.0&0,R:N",
      "1,>25.0&0,A:N", "1,>25.0&0,N:P", "1,>25.0&0,R:P"))
  }

  test("simplified model carries first-match distributions; proba is " +
    "hand-computable") {
    val s = spark
    import s.implicits._
    // class decided by a, with 2 planted noise rows in the a=t region
    // (one per x-branch) so BOTH x-conditions drop (the widened rule's
    // pessimistic rate beats each noisy leaf's) and the merged rule's
    // first-match distribution is MIXED: {p: 48, n: 2}.
    val leaves = Vector(
      Rule(Vector(0 -> CatEq("t"), 1 -> NumLE(5.0)), Some("p")),
      Rule(Vector(0 -> CatEq("t"), 1 -> NumGT(5.0)), Some("p")),
      Rule(Vector(0 -> CatEq("u")), Some("n")))
    val model = C45Model(schema, leaves, "p")
    val rows = (1 to 50).map(i =>
      ("t", i % 10 + 0.0, if (i == 3 || i == 17) "n" else "p")) ++
      (1 to 50).map(i => ("u", i % 10 + 0.0, "n"))
    val out = C45RuleSimplify.simplify(model, rows.toDF("a", "x", "cls"))
    // pure a=u rule ranks first (lower pessimistic rate), then a=t
    assert(out.leaves.map(_.encode) == Vector("0,u:n", "0,t:p"))
    assert(out.leafDist == Vector(
      Map("n" -> 50000000L), Map("p" -> 48000000L, "n" -> 2000000L)))
    assert(out.leafMass == Vector(50000000L, 50000000L))
    // hand-computed micros: 48/50 -> 960000, 2/50 -> 40000
    val proba = out.transformProba(
        Seq(("t", 1.0), ("u", 9.0), ("z", 1.0)).toDF("a", "x"))
      .select("a", "prediction", "p_n", "p_p")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(proba == Seq(
      ("t", "p", 40000L, 960000L),
      ("u", "n", 1000000L, 0L),
      ("z", "p", 0L, 1000000L))) // no rule fires -> majority at 10^6
  }

  test("simplify -> save -> load -> proba round-trips bit-identically") {
    val s = spark
    import s.implicits._
    val leaves = Vector(
      Rule(Vector(0 -> CatEq("t"), 1 -> NumLE(5.0)), Some("p")),
      Rule(Vector(0 -> CatEq("t"), 1 -> NumGT(5.0)), Some("p")),
      Rule(Vector(0 -> CatEq("u")), Some("n")))
    val rows = (1 to 50).map(i =>
      ("t", i % 10 + 0.0, if (i == 3 || i == 17) "n" else "p")) ++
      (1 to 50).map(i => ("u", i % 10 + 0.0, "n"))
    val out = C45RuleSimplify.simplify(
      C45Model(schema, leaves, "p"), rows.toDF("a", "x", "cls"))
    val dir = java.nio.file.Files.createTempDirectory("simplify_rt")
      .toString
    try {
      out.save(spark, dir)
      val back = C45Model.load(spark, dir, schema)
      assert(back.leaves == out.leaves) // first-match ORDER preserved
      assert(back.leafDist == out.leafDist)
      val score = Seq(("t", 1.0), ("u", 9.0), ("z", 1.0)).toDF("a", "x")
      assert(back.transformProba(score).collect().map(_.toSeq).toSeq ==
        out.transformProba(score).collect().map(_.toSeq).toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
    }
  }

  test("overlapping rule lists: fractional == transform (C4.5rules " +
    "unknown-fails), pruning rejects") {
    val s = spark
    import s.implicits._
    // a genuinely overlapping first-match list: [x>3 -> p, a=t -> n].
    // Row (t, 5.0) matches BOTH; first-match predicts p. A per-rule
    // SUM vote (the tree-model fractional plan) would tie p/n and
    // break the tie to n — so the delegation to transform is semantic,
    // not cosmetic.
    val m = C45Model(schema,
      Vector(Rule(Vector(1 -> NumGT(3.0)), Some("p")),
        Rule(Vector(0 -> CatEq("t")), Some("n"))), "p",
      leafMass = Vector(1000000L, 1000000L),
      leafDist = Vector(Map("p" -> 1000000L), Map("n" -> 1000000L)))
    assert(m.overlapping)
    val score = Seq(("t", Option(5.0)), ("t", Option(1.0)),
      ("u", Option(1.0)), (null: String, None: Option[Double]))
      .toDF("a", "x")
    val frac = m.transformFractional(score).collect().map(_.toSeq).toSeq
    assert(frac == m.transform(score).collect().map(_.toSeq).toSeq)
    assert(frac.map(_.last) == Seq("p", "n", "p", "p"))
    intercept[IllegalArgumentException](C45Pruning.pruneTraining(m))
    intercept[IllegalArgumentException](C45Pruning.prune(m, score))
  }

  test("simplified golden: sf0.01 committed rule set reproduces") {
    val got = graft.queries.C45Queries.qRuleSimplify(spark, "/root/testdata/sf0.01")
      .collect().map(_.getString(0)).toVector
    val src = scala.io.Source.fromResource("golden/rule_simplify_sf001_rules.txt")
    val want = try src.getLines().filter(_.nonEmpty).toVector finally src.close()
    assert(got.sorted == want.sorted)
  }
}
