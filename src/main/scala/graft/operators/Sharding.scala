package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) shard routing — Thaler &
  * Ravishankar 1998: a key's shard is the argmax over shards of a
  * per-(key, shard) hash. The property that matters at 100 TB: when a
  * shard is REMOVED, only the keys that lived on it move (each to its
  * second-highest shard); every other key's argmax is untouched, so an
  * incremental pipeline re-processes 1/n of the corpus instead of
  * reshuffling everything — the failure mode of `hash(key) mod n`,
  * where removing one shard remaps (n−1)/n of all keys.
  *
  * Pure `Column` arithmetic over the portable salted-md5 family
  * ([[Hashing.hash60]]): no state, no table of shard boundaries,
  * identical in Spark and the SQL oracle, usable map-side in batch or
  * streaming. Ties (astronomically unlikely with 60-bit hashes, but
  * contracted) go to the smallest shard id. */
object Sharding {

  /** Shard id in [0, nShards) for each key — argmax of
    * hash60(key, salt + s) over s, smallest s on ties. */
  def rendezvousShard(keyCol: Column, nShards: Int,
                      salt: Int = 0): Column = {
    require(nShards >= 1, s"nShards must be positive: $nShards")
    if (nShards == 1) lit(0L)
    else {
      val cands = (0 until nShards).map(s => struct(
        Hashing.hash60(keyCol.cast("string"), salt = salt + s).as("h"),
        lit(-s.toLong).as("ns")))
      -greatest(cands: _*).getField("ns")
    }
  }
}
