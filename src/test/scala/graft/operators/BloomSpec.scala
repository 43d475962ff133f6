package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Sketches.bloomWords]] / [[Sketches.bloomMightContain]] — the
  * runtime-filter primitive: the no-false-negative contract, a
  * measurable false-positive rate, word-table mergeability across key
  * batches, geometry guards, and null handling. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val M = 256
  private val K = 4

  test("no false negatives: every build key passes its own filter") {
    val keys = (1L to 100L).toDF("k")
    val words = Sketches.bloomWords(keys, "k", M, K, salt = 7)
    val pass = Sketches.bloomMightContain(words, col("k"), M, K, salt = 7)
    assert(keys.where(!pass).count() === 0L)
  }

  test("definitely-absent keys are mostly rejected (filter is useful)") {
    val keys = (1L to 20L).toDF("k")
    val words = Sketches.bloomWords(keys, "k", M, K, salt = 7)
    val pass = Sketches.bloomMightContain(words, col("k"), M, K, salt = 7)
    // 20 keys * 4 hashes in 256 bits: expected FPR ~ (1-e^-0.3125)^4
    // ~ 0.5%; 1000 absent probes should overwhelmingly fail
    val absent = (1001L to 2000L).toDF("k")
    val passed = absent.where(pass).count()
    assert(passed < 100L, s"FPR implausibly high: $passed/1000")
  }

  test("mergeable: bit_or of two batch filters == filter of the union") {
    val a = (1L to 50L).toDF("k")
    val b = (40L to 90L).toDF("k")
    val wa = Sketches.bloomWords(a, "k", M, K, salt = 3)
    val wb = Sketches.bloomWords(b, "k", M, K, salt = 3)
    val merged = wa.unionAll(wb).groupBy("word_idx")
      .agg(bit_or(col("word")).as("word"))
    val direct = Sketches.bloomWords(a.unionAll(b), "k", M, K, salt = 3)
    assert(merged.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      direct.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("words use only the low 32 bits (sign bit never set)") {
    val words = Sketches.bloomWords((1L to 500L).toDF("k"), "k", M, K)
    val bad = words.where(col("word") < 0L ||
      col("word") >= (1L << 32)).count()
    assert(bad === 0L)
    // word_idx bounded by geometry
    assert(words.where(col("word_idx") < 0L ||
      col("word_idx") >= M / 32).count() === 0L)
  }

  test("probe is shuffle-free (no Exchange in the filter plan)") {
    val words = Sketches.bloomWords((1L to 30L).toDF("k"), "k", M, K)
    val pass = Sketches.bloomMightContain(words, col("k"), M, K)
    val plan = (1L to 1000L).toDF("k").where(pass)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe plan shuffles:\n$plan")
  }

  test("null keys: dropped from the build, never pass the probe") {
    val keys = Seq(Some(1L), Some(2L), None).toDF("k")
    val words = Sketches.bloomWords(keys, "k", M, K)
    val pass = Sketches.bloomMightContain(words, col("k"), M, K)
    // null key -> null hash -> null comparison -> filter drops it
    assert(keys.where(pass).count() === 2L)
  }

  test("geometry guards fail loudly") {
    val keys = (1L to 3L).toDF("k")
    intercept[IllegalArgumentException] {
      Sketches.bloomWords(keys, "k", 100, K) // not a multiple of 32
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomWords(keys, "k", M, 0)
    }
  }
}
