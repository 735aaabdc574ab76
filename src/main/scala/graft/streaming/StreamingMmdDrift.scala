package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming embedding-drift monitor — the event-time twin of the batch
  * linear-kernel MMD² (q307, [[graft.operators.Similarity.linearMmdDrift]]):
  * per (event-time window, group pair), ‖μ_a − μ_b‖² between the groups'
  * embedding distributions — the encoder-drift alarm a pipeline keeps on
  * its ingest stream ("did this hour's vectors move away from the control
  * slice") that pages before the batch gate runs. Closes the batch-only
  * gap in the streaming drift family (JS/KS/W1 ride
  * [[StreamingDrift]]-shaped scalar state; MMD is the distribution-level
  * check for vector columns).
  *
  * Two stages, the [[StreamingTopK]] pattern:
  *  - [[componentSums]] (streaming): per-(window, group, dim) exact
  *    micro-unit component sums + counts. Components quantize to integer
  *    micro-units at FIRST appearance (the q292/q307 discipline), so the
  *    state is exact BIGINT sums — associative and commutative, which is
  *    what makes every emitted cell bit-equal under ANY micro-batch
  *    split. State is O(windows × groups × dims), independent of volume.
  *  - [[mmdFromSums]] (batch over the sink): the verbatim q307 pair
  *    algebra — per-dim mean differences re-quantized to micro-units
  *    (one IEEE division + round per (pair, dim)), squared and summed as
  *    exact BIGINTs, one /1e12 at the end. Runs over |windows| ×
  *    |groups| × dims rows, never over vectors.
  */
object StreamingMmdDrift {

  /** Streaming stage. `vecs` must be a streaming DataFrame with
    * event-time `tsCol`, a group column, and an array vector column.
    * Emits (window_start, g, d, s, n) once the watermark passes. */
  def componentSums(vecs: DataFrame, tsCol: String, groupCol: String,
                    vecCol: String, windowDur: String,
                    watermark: String): DataFrame =
    vecs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(groupCol).as("g"),
        posexplode(col(vecCol)).as(Seq("d", "c")))
      .groupBy(window(col(tsCol), windowDur), col("g"), col("d"))
      .agg(sum(round(col("c").cast("double") * lit(1e6)).cast("bigint"))
        .as("s"), count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("g"),
        col("d"), col("s"), col("n"))

  /** Finishing stage over the sink's (window_start, g, d, s, n) rows:
    * per-window pairwise MMD², bit-equal to
    * [[graft.operators.Similarity.linearMmdDrift]] on the same rows —
    * structurally: both twins call the SAME
    * [[graft.operators.Similarity.mmdPairsFromComponentSums]] algebra
    * (this one keyed by window_start), not two hand-synced copies.
    * Output: (window_start, label_a < label_b, n_a, n_b, mmd2). */
  def mmdFromSums(rows: DataFrame): DataFrame =
    graft.operators.Similarity.mmdPairsFromComponentSums(
      rows.toDF("window_start", "g", "d", "s", "n"), Seq("window_start"))
}
