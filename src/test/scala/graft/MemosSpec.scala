package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench-honesty contract: Memos.resetAll() invokes every
  * registered reset thunk, so a timed bench rep never observes a
  * result memo populated by the warmup pass or by an earlier query. */
class MemosSpec extends AnyFunSuite {

  test("resetAll invokes every registered reset, every time") {
    var a = 0
    var b = 0
    Memos.register(() => a += 1)
    Memos.register(() => b += 1)
    Memos.resetAll()
    assert(a == 1 && b == 1)
    Memos.resetAll()
    assert(a == 2 && b == 2)
  }

  test("the result-memo owners register with the registry") {
    // Force the owning objects to class-load exactly as Bench does
    // (building the query map touches C45Queries and ExtQueries),
    // then check the memo resets are registered: fitMemo, lshPairs,
    // ivf centroids, pq codebooks, km centroids — 5 result memos.
    // (The parquet-schema memo is metadata-only and exempt.)
    SparkEntry.queries.size // class-loads every query object
    assert(Memos.registered >= 5)
  }
}
