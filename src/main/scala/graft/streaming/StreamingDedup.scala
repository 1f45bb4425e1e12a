package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Exact dedup-on-ingest for an unbounded document stream — the streaming
  * half of the corpus-dedup story ([[graft.dedup.Dedup.exact]] is the batch
  * half):
  *
  *  - every document is fingerprinted with the 64-bit content hash
  *    ([[TextOps.fingerprint]]): the dedup state key is 8 bytes, never the
  *    raw text — same wire discipline as the batch path;
  *  - `dropDuplicatesWithinWatermark` keeps the FIRST arrival per
  *    fingerprint and discards re-arrivals while the fingerprint is inside
  *    the watermark horizon. State is bounded by the watermark (evicted once
  *    event time passes), which is the honest at-scale contract: exact
  *    within the horizon, a re-send older than the horizon can re-emit —
  *    production pipelines pair this with the periodic batch dedup for
  *    full-corpus exactness.
  *
  * Works on any streaming DataFrame with an event-time column; one shuffle
  * on the fingerprint per micro-batch, O(#distinct-in-horizon) state.
  */
object StreamingDedup {

  /** First-arrival-wins stream dedup on normalized-text fingerprint.
    * @param docs streaming DataFrame with `textCol` and event-time `tsCol`
    * @return the input rows that survive dedup, plus the `fingerprint` col */
  def dedup(docs: DataFrame, textCol: String = "text", tsCol: String = "ts",
            watermark: String = "1 hour"): DataFrame =
    docs.withColumn("fingerprint", TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
}
