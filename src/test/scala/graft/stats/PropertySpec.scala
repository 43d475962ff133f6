package graft.stats

import graft.SparkTestSession
import graft.model.{CatEq, NumGT, NumLE, Rule, Split}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (SURVEY.md §5.5): codec round-trips and
  * entropy-math invariants over scalacheck-generated inputs (sampled
  * directly — the scalatest/scalacheck bridge artifact is not in the
  * offline dependency set). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // codec alphabet: the reference wire format reserves & , : separators
  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(10))
  private val split: Gen[Split] = Gen.oneOf(
    word.map(CatEq),
    Gen.chooseNum(-1e6, 1e6).map(d => NumLE(math.rint(d * 100) / 100)),
    Gen.chooseNum(-1e6, 1e6).map(d => NumGT(math.rint(d * 100) / 100)))
  private val rule: Gen[Rule] = for {
    n <- Gen.chooseNum(0, 6)
    attrs <- Gen.listOfN(n, Gen.chooseNum(0, 50))
    splits <- Gen.listOfN(n, split)
    label <- Gen.option(word)
  } yield Rule(attrs.zip(splits).toVector, label)

  test("rule codec round-trips arbitrary rules") {
    val samples = (1 to 300).flatMap(_ => rule.sample)
    assert(samples.length >= 200)
    samples.foreach { r => assert(Rule.decode(r.encode) == r, r.toString) }
  }

  test("entropy invariants: 0 <= H <= log2(k) for arbitrary count vectors") {
    val cases: Gen[List[Long]] =
      Gen.nonEmptyListOf(Gen.chooseNum(1L, 1000000L)).map(_.take(12))
    // batch the generated cases into ONE DataFrame job
    val sampled = (1 to 60).flatMap(i => cases.sample.map(i -> _))
    val s = spark
    import s.implicits._
    val df = sampled.flatMap { case (gid, counts) =>
      counts.zipWithIndex.map { case (c, k) => (gid, s"c$k", c) }
    }.toDF("gid", "cls", "cnt")
    val got = InfoStats.entropyOfCounts(df, Seq("gid")).collect()
      .map(r => r.getAs[Int]("gid") -> r.getAs[Double]("entropy")).toMap
    val kOf = sampled.map { case (g, cs) => g -> cs.length }.toMap
    got.foreach { case (g, h) =>
      assert(h >= -1e-9, s"gid $g entropy $h < 0")
      assert(h <= math.log(kOf(g).toDouble) / math.log(2) + 1e-9,
        s"gid $g entropy $h > log2(${kOf(g)})")
    }
  }

  test("gain is non-negative and conditional entropy never exceeds info") {
    val cellGen: Gen[List[((String, String), Long)]] = for {
      nv <- Gen.chooseNum(2, 5)
      nc <- Gen.chooseNum(2, 4)
      cnts <- Gen.listOfN(nv * nc, Gen.chooseNum(0L, 10000L))
    } yield {
      val cells = for { v <- 0 until nv; c <- 0 until nc } yield (s"v$v", s"c$c")
      cells.toList.zip(cnts).filter(_._2 > 0)
    }
    val sampled = (1 to 40).flatMap(i => cellGen.sample.map(i -> _))
      .filter(_._2.nonEmpty)
    val s = spark
    import s.implicits._
    val df = sampled.flatMap { case (gid, cells) =>
      cells.map { case ((v, c), n) => (gid, v, c, n) }
    }.toDF("gid", "val", "cls", "cnt")
    val got = InfoStats.categoricalSplitStats(df, Seq("gid")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val info = r.getAs[Double]("info"); val condE = r.getAs[Double]("cond_entropy")
      val splitI = r.getAs[Double]("split_info"); val gain = r.getAs[Double]("gain")
      assert(info >= -1e-9 && condE >= -1e-9 && splitI >= -1e-9)
      assert(gain >= -1e-9, s"negative gain $gain")
      assert(condE <= info + 1e-9, s"condE $condE > info $info")
    }
  }
}
