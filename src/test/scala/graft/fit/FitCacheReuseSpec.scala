package graft.fit

import graft.SparkTestSession
import graft.meta.{AttrMeta, C45Schema}
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The fit's persist-reuse contract: when the caller already persisted
  * the training frame (directly, or a filter over a cache — the
  * cross-validation shape), `C45.fit` must NOT materialize a second
  * copy, and the fitted model must be identical either way. */
class FitCacheReuseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = C45Schema(Seq(
    AttrMeta("a", isNumeric = false), AttrMeta("x", isNumeric = true)),
    "cls", Seq("n", "p"))

  private def toy = {
    val s = spark
    import s.implicits._
    (for { a <- Seq("t", "u"); x <- 0 to 9; r <- 1 to 5 }
      yield (a, x + 0.0, if ((a == "t") == (x <= 5)) "p" else "n"))
      .toDF("a", "x", "cls")
  }

  test("fit over a pre-persisted frame (and a filter of it) is identical") {
    val plain = C45.fit(toy, schema, C45Params(maxDepth = 3))
    val cached = toy.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val viaCache = C45.fit(cached, schema, C45Params(maxDepth = 3))
      assert(viaCache.ruleStrings == plain.ruleStrings)
      // the cross-validation shape: a FILTER over the cache — the
      // cache detection must look through the plan, storageLevel alone
      // reports NONE here
      val filtered = cached.filter(org.apache.spark.sql.functions.lit(true))
      assert(filtered.storageLevel == StorageLevel.NONE)
      val viaFilter = C45.fit(filtered, schema, C45Params(maxDepth = 3))
      assert(viaFilter.ruleStrings == plain.ruleStrings)
    } finally cached.unpersist()
  }

  test("cache detection: root-backed counts, an interior cached dim does not") {
    val s = spark
    import s.implicits._
    val cached = toy.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      cached.count()
      assert(C45.inputCacheBacked(cached))
      assert(C45.inputCacheBacked(
        cached.filter(org.apache.spark.sql.functions.lit(true))))
      assert(C45.inputCacheBacked(cached.select("a", "x", "cls")))
      // a cached SMALL side joined to an uncached input must NOT read
      // as "caller cached the training data" — fit still owns its
      // persist there, or every level would recompute the join
      val dim = Seq(("t", 1), ("u", 2)).toDF("a", "grp")
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        dim.count()
        assert(!C45.inputCacheBacked(toy.join(dim, "a")))
      } finally dim.unpersist()
    } finally cached.unpersist()
  }

  test("fit does not register a new cache when the input is pre-persisted") {
    val cached = toy.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      cached.count()
      val before = spark.sharedState.cacheManager.isEmpty
      assert(!before)
      C45.fit(cached, schema, C45Params(maxDepth = 2))
      // fit's internal projection persist was skipped: unpersisting the
      // caller's frame leaves the cache manager empty
    } finally cached.unpersist()
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
