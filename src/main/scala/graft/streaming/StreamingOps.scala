package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming forms of the training-data operators: a pipeline ingesting
  * documents continuously needs the same dedup/quality decisions as the
  * batch path, expressed against `readStream` sources.
  *
  * - Exact dedup keys on `(xxhash64(text), length)` like batch q30 — the
  *   state store holds 16-byte keys, never document bodies — and bounds
  *   its state with `dropDuplicatesWithinWatermark`: duplicates arriving
  *   within the watermark window are dropped, keys older than the
  *   watermark are evicted (unbounded-state dedup is the classic
  *   streaming-job killer).
  * - The map-only operators (quality/repetition/token stats) are
  *   stateless projections and run UNCHANGED on a streaming frame —
  *   [[qualityFiltered]] demonstrates the composition with the native
  *   RepetitionStats expression.
  */
object StreamingOps {

  /** Streaming exact dedup. `docs` needs `event_time` (timestamp) and
    * `text`; emits the first-seen row per distinct text within the
    * watermark horizon.
    */
  def exactDedup(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("text_key", xxhash64(col("text")))
      .withColumn("text_len", length(col("text")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("text_key", "text_len")
      .drop("text_key", "text_len")

  /** Stateless streaming quality filter: keep docs under the repetition
    * thresholds (Gopher-style dup_gram_ratio / top_token_ratio cuts).
    * Pure projection + filter — no state, no watermark needed.
    */
  def qualityFiltered(docs: DataFrame,
                      maxDupGramRatio: Double = 0.5,
                      maxTopTokenRatio: Double = 0.3): DataFrame =
    docs
      .withColumn("st", graft.functions.RepetitionStats(col("text")))
      // ratio definitions shared with batch q44 — one source of truth
      .withColumn("dup_gram_ratio", graft.ops.TextAnalysis.dupGramRatio(col("st")))
      .withColumn("top_token_ratio", graft.ops.TextAnalysis.topTokenRatio(col("st")))
      .filter(col("dup_gram_ratio") <= maxDupGramRatio &&
        col("top_token_ratio") <= maxTopTokenRatio)
      .drop("st")
}
