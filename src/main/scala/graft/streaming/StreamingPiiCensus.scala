package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming PII-prevalence monitor — the event-time twin of the batch
  * census (q338, [[graft.operators.TextPrep.piiCensus]]): per
  * (event-time window, detector), how many documents hit and how many
  * total matches arrived — the leakage alarm a pipeline keeps on its
  * ingest stream so a bad upstream change (a scraper suddenly shipping
  * emails) pages before the batch gate runs.
  *
  * Same detector battery ([[graft.operators.TextPrep.piiDetectors]]),
  * same counting semantics; the per-row regexp_count columns are pure
  * codegen projections, the stack to long form multiplies rows by the
  * constant detector count, and state per group is THREE counters —
  * O(windows × detectors), independent of volume and mergeable, so
  * micro-batch splits cannot change any emitted row. */
object StreamingPiiCensus {

  /** Streaming stage: per-(window, pii_type) doc/hit/match counts.
    * `docs` must be a streaming DataFrame with event-time `tsCol` and a
    * text column. Emits (window_start, pii_type, docs, docs_hit,
    * matches) in append mode once the watermark passes. */
  def windowedCensus(docs: DataFrame, tsCol: String, textCol: String,
                     windowDur: String, watermark: String): DataFrame = {
    val det = graft.operators.TextPrep.piiDetectors
    val counts = docs.select(
      col(tsCol) +:
        det.map { case (n, p) =>
          regexp_count(col(textCol), lit(p)).cast("bigint").as(n)
        }: _*)
    val stacked = det.map(d => s"'${d._1}', ${d._1}")
      .mkString(s"stack(${det.size}, ", ", ", ") AS (pii_type, m)")
    counts
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), expr(stacked))
      .groupBy(window(col(tsCol), windowDur), col("pii_type"))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("m") > 0L, 1L).otherwise(0L)).as("docs_hit"),
        sum(col("m")).as("matches"))
      .select(col("window.start").as("window_start"), col("pii_type"),
        col("docs"), col("docs_hit"), col("matches"))
  }
}
