package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment: join a streaming feed against a STATIC
  * dimension table at ingestion — the standard "attach the dimension
  * attributes as events arrive" shape (stateless: no watermark, no
  * streaming state; every micro-batch hash-joins against the static
  * side, broadcast when it fits). At 100 TB/day ingest the static side
  * is the small one by construction (a dimension, not a fact) — the
  * stream never shuffles; each executor joins its arriving partitions
  * against the broadcast dimension in place. */
object StreamingEnrich {

  /** Inner-join `stream` to `dim` on `streamKey == dimKey`, attaching
    * `dimCols`. Works identically on a batch frame (the differential
    * twin the oracle exercises). */
  def enrich(stream: DataFrame, dim: DataFrame, streamKey: String,
             dimKey: String, dimCols: Seq[String]): DataFrame =
    stream.join(
      broadcast(dim.select((dimKey +: dimCols).map(col): _*)),
      col(streamKey) === col(dimKey))
      .drop(dimKey)
}
