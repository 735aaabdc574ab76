package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming latency/value quantiles without per-event state: a
  * declared-range fixed-bin histogram aggregated per (event-time window,
  * key), finished into interpolated quantile estimates by a bounded
  * post-aggregation — the monitoring-pipeline shape ("p95 latency per
  * 10-minute window") that an exact streaming sort cannot provide.
  *
  * Split design, mirroring the batch [[graft.operators.Sketches
  * .histogramQuantiles]] (whose data-derived [lo, hi] needs a first pass a
  * stream doesn't get — a monitoring histogram DECLARES its range, as
  * Prometheus buckets do; out-of-range values clamp into the edge bins):
  *
  *  - [[binnedCounts]] is the streaming stage: watermark + windowed
  *    groupBy on (window, key, bin). State per group is ONE count —
  *    O(windows × keys × bins), independent of event volume, and the
  *    partial-agg tree is mergeable so map-side combine does its usual
  *    work. Emits append-mode finalized rows once the watermark passes.
  *  - [[quantilesFromBins]] finishes (batch over the sink, or any
  *    downstream reader): per-(window, key) cumulative over ≤`bins` rows
  *    — a partition-bounded frame, never a window over events.
  */
object StreamingQuantiles {

  /** Streaming stage: per-(window, key) bin counts over a declared
    * [lo, hi) range. `events` must be a streaming DataFrame with an
    * event-time column `tsCol`. */
  def binnedCounts(events: DataFrame, tsCol: String, keyCol: String,
                   valueCol: String, lo: Double, hi: Double, bins: Int,
                   windowDur: String, watermark: String): DataFrame = {
    require(bins >= 2 && hi > lo, "need bins >= 2 and hi > lo")
    val v = col(valueCol)
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(keyCol),
        // clamp on the LONG floor result BEFORE the narrowing cast: a value
        // > ~2^31 bin-widths past lo would wrap a long-to-int cast negative
        // and land the extreme HIGH outlier in the LOWEST bin (ADVICE r10)
        least(lit(bins - 1).cast("long"), greatest(lit(0L),
          floor((v - lit(lo)) / lit((hi - lo) / bins))))
          .cast("int").as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("bin"), col("cnt"))
  }

  /** Finishing stage over the sink's (window_start, key, bin, cnt) rows:
    * interpolated quantile estimates at each p in `ps`. The cumulative
    * window partitions by (window, key) over ≤`bins` rows. */
  def quantilesFromBins(binRows: DataFrame, keyCol: String, lo: Double,
                        hi: Double, bins: Int, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p < 1.0),
      "quantiles must be strictly inside (0, 1)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"), col(keyCol)).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val width = (hi - lo) / bins
    val targets = ps.map(p => s"CAST($p AS DOUBLE)")
      .mkString("array(", ", ", ")")
    binRows
      .withColumn("cum_before", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("window_start"), col(keyCol))))
      .select(col("window_start"), col(keyCol), col("bin"), col("cnt"),
        col("cum_before"), col("n"), explode(expr(targets)).as("p"))
      .where(col("cum_before").cast("double") <
          col("p") * col("n").cast("double") &&
        col("p") * col("n").cast("double") <=
          (col("cum_before") + col("cnt")).cast("double"))
      .select(col("window_start"), col(keyCol), col("p"),
        (lit(lo) + lit(width) * (col("bin").cast("double") +
          (col("p") * col("n").cast("double") -
            col("cum_before").cast("double")) /
            col("cnt").cast("double"))).as("est"))
  }

  /** UNKNOWN-range streaming quantile stage: per-(window, key) bottom-k
    * hash-sample rank sketch ([[graft.functions.BottomKSampleAgg]]) —
    * what the monitoring shelf uses when it cannot declare [lo, hi]
    * buckets up front (new metrics, unbounded latencies). State per
    * group is the ≤`k` (hash, value) buffer — O(windows × keys × k),
    * independent of event volume — and because the sample is a
    * merge-invariant pure function of the window's row multiset, the
    * emitted sketch is identical however events split across
    * micro-batches (the KLL property a streaming sketch MUST have, here
    * by semilattice construction rather than by distribution). `idCol`
    * must be row-unique. Emits (window_start, key, sample, n). */
  def sketchSamples(events: DataFrame, tsCol: String, keyCol: String,
                    idCol: String, valueCol: String, k: Int,
                    windowDur: String, watermark: String): DataFrame = {
    require(k >= 2, "need k >= 2")
    val bk = graft.functions.BottomKSampleAgg.columnAgg(k)
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(bk(graft.operators.Sketches.hash60(col(idCol)),
        col(valueCol)).as("sample"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("sample"), col("n"))
  }

  /** Finishing stage over the sink's (window_start, key, sample, n)
    * rows: interpolated quantile estimates at each p in `ps` from the
    * sampled values — a ≤k-row-per-group aggregate, never a sort over
    * events. Same percentile semantics as the batch
    * [[graft.operators.Sketches.rankSketchQuantiles]]. */
  def quantilesFromSamples(sampleRows: DataFrame, keyCol: String,
                           ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p < 1.0),
      "quantiles must be strictly inside (0, 1)")
    val targets = ps.map(p => s"CAST($p AS DOUBLE)")
      .mkString("array(", ", ", ")")
    sampleRows
      .select(col("window_start"), col(keyCol), col("n"),
        explode(col("sample")).as("__e"))
      .groupBy(col("window_start"), col(keyCol), col("n"))
      .agg(expr(s"percentile(__e._2, $targets)").as("__q"))
      .select(col("window_start"), col(keyCol), col("n"),
        explode(arrays_zip(expr(targets).as("p"), col("__q").as("est")))
          .as("__z"))
      .select(col("window_start"), col(keyCol), col("n"),
        col("__z.p").as("p"), col("__z.est").as("est"))
  }
}
