package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming top-k terms per event-time window with O(k) state — the
  * monitoring twin of the batch sampled heavy hitters (q89): "what are
  * the top event types / tokens / URLs in each 10-minute window" over a
  * stream whose distinct-term space is unbounded, where an exact
  * per-(window, term) groupBy would hold state proportional to the
  * vocabulary, not to k.
  *
  * Split design, mirroring [[StreamingQuantiles.sketchSamples]]:
  *
  *  - [[termSamples]] is the streaming stage: watermark + windowed
  *    groupBy keeping a bottom-k hash sample of term OCCURRENCES
  *    ([[graft.functions.BottomKTermSampleAgg]]) plus the exact window
  *    total. State per window is the ≤k (hash, term) buffer —
  *    independent of event volume AND of vocabulary size. Because the
  *    bottom-k set is a semilattice (bottom-k of a union = merge of
  *    bottom-ks), the emitted sample is a pure function of the window's
  *    occurrence multiset: identical however events split across
  *    micro-batches or partitions — the same bit-parity contract the
  *    Holt-Winters and quantile streaming stages gate on, here by
  *    construction rather than by replay (no SpaceSaving/Misra-Gries
  *    merge-order dependence).
  *  - [[topKFromSamples]] finishes (batch over the sink): per-window
  *    term counts INSIDE the ≤k-row sample → estimated share s_cnt/k'
  *    and estimated count s_cnt·n/k' (k' = min(k, n) — when a window
  *    holds fewer than k occurrences the sample is the window and the
  *    estimate is exact), ranked (s_cnt DESC, term ASC) so ties break
  *    deterministically. Error on a share is O(sqrt(1/k)) additive
  *    (hypergeometric), so a term with share ≥ 2/sqrt(k) reliably
  *    outranks the uniform tail.
  */
object StreamingTopK {

  /** Streaming stage: per-window bottom-k occurrence sample + exact
    * total. `events` must be a streaming DataFrame with event-time
    * `tsCol`; `idCol` must be occurrence-unique (it seeds the sample
    * hash). Emits (window_start, sample, n) in append mode once the
    * watermark passes. */
  def termSamples(events: DataFrame, tsCol: String, idCol: String,
                  termCol: String, k: Int, windowDur: String,
                  watermark: String): DataFrame = {
    require(k >= 2, "need k >= 2")
    val bk = graft.functions.BottomKTermSampleAgg.columnAgg(k)
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(bk(graft.operators.Sketches.hash60(col(idCol)),
          col(termCol)).as("sample"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("sample"), col("n"))
  }

  /** Finishing stage over the sink's (window_start, sample, n) rows:
    * the `topN` terms per window by in-sample count, with the
    * estimated share and count. Every aggregate and window here runs
    * over ≤k rows per window — never over events. */
  def topKFromSamples(sampleRows: DataFrame, topN: Int): DataFrame = {
    require(topN >= 1, "need topN >= 1")
    // k_eff is the ACTUAL sample size, read off the data: size(sample) is
    // exactly min(k, n) for the k used at sampling time, so no caller-
    // supplied k can drift from it and skew est_share/est_cnt
    val perTerm = sampleRows
      .select(col("window_start"), col("n"),
        size(col("sample")).cast("bigint").as("k_eff"),
        explode(col("sample")).as("__e"))
      .groupBy(col("window_start"), col("n"), col("k_eff"),
        col("__e._2").as("term"))
      .agg(count(lit(1)).as("s_cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
      .orderBy(col("s_cnt").desc, col("term"))
    perTerm
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topN)
      .select(col("window_start"), col("term"), col("rnk"), col("s_cnt"),
        (col("s_cnt").cast("double") / col("k_eff").cast("double"))
          .as("est_share"),
        (col("s_cnt").cast("double") * col("n").cast("double") /
          col("k_eff").cast("double")).as("est_cnt"),
        col("n"))
  }
}
