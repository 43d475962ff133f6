package graft.model

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RuleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("codec round-trips the reference grammar (Rule.java:22-56)") {
    val cases = Seq("0,sunny&3,true:no", "1,<=75.0:", ":yes", ":",
      "0,a&1,<=2.5&2,>3.5:x")
    cases.foreach { s => assert(Rule.decode(s).encode == s) }
  }

  test("decode parses typed splits") {
    val r = Rule.decode("0,sunny&1,<=75.0&2,>3.5:no")
    assert(r.conditions == Vector(
      0 -> CatEq("sunny"), 1 -> NumLE(75.0), 2 -> NumGT(3.5)))
    assert(r.label.contains("no"))
    assert(r.usedAttrs == Set(0, 1, 2))
  }

  test("root rule is open and condition-less") {
    assert(Rule.root.isOpen && Rule.root.depth == 0)
    assert(Rule.decode(":").isOpen)
  }

  test("toPredicate compiles to correct typed comparison — quirk #1 " +
    "(reference truncates '2.45' boundaries, MyMapper.java:98-108; we must not)") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 2.44), ("a", 2.45), ("a", 2.46), ("b", 1.0))
      .toDF("k", "v")
    val rule = Rule(Vector(0 -> CatEq("a"), 1 -> NumLE(2.45)))
    val got = df.filter(rule.toPredicate(Seq("k", "v"))).collect()
    assert(got.length == 2) // 2.44 and 2.45 — the reference would lose these rows
    val gt = Rule(Vector(1 -> NumGT(2.45)))
    assert(df.filter(gt.toPredicate(Seq("k", "v"))).count() == 1)
  }

  test("empty-condition rule matches everything") {
    val s = spark
    import s.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    assert(df.filter(Rule.root.toPredicate(Seq("x"))).count() == 3)
  }
}
