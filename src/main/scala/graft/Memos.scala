package graft

/** Central registry of JVM-lifetime RESULT memos (fitted models,
  * trained centroids/codebooks, mined pair tables) so the bench can
  * clear them between timed reps and each timed query computes its
  * declared work from the parquet inputs — a memo populated by the
  * warmup pass (or by an earlier query in the same pass) must never
  * turn a timed fit into a HashMap lookup.
  *
  * Owners register a reset thunk at object-initialization time; the
  * registration order is irrelevant (clearing an empty map is a
  * no-op, and an owner object not yet class-loaded has an empty memo
  * by definition). Metadata-only memos — e.g. Tables' parquet-schema
  * memo, which never stores rows — are deliberately NOT registered:
  * they elide a footer read, not the declared computation.
  *
  * The memos themselves stay: within ONE query execution (and across
  * the queries of one correctness battery in Verify, where only
  * results matter, not timings) sharing a byte-identical deterministic
  * fit is pure fixture dedup. Only the bench's timed window must not
  * observe a warm memo.
  */
object Memos {
  private val resets =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  /** Register a thunk that clears one result memo. Called from the
    * owning object's initializer. */
  def register(reset: () => Unit): Unit = resets.add(reset)

  /** Clear every registered result memo. Cheap (a handful of
    * map.clear() calls) — safe to call between every timed query. */
  def resetAll(): Unit = resets.forEach(r => r())

  /** Number of registered memos (for specs). */
  def registered: Int = resets.size()
}
