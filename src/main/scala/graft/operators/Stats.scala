package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Inferential statistics over corpus/stream metrics — the measurement side
  * of a data pipeline: is source A's quality distribution actually different
  * from source B's, do two automatic raters agree beyond chance, how fragile
  * is a headline mean to dropping one source.
  *
  * Numeric determinism (the q59 discipline): every statistic is assembled
  * from EXACT decimal component sums (n, Σx, Σx², cell counts) with ONE
  * final double formula, so partial-aggregation order never touches a
  * double and the result hash-matches a single-node oracle at any
  * partitioning — local[32] and a 1000-executor cluster give bit-identical
  * answers.
  *
  * Scale: each operator is one scan + one (global or keyed) hash aggregate;
  * no windows, no joins on the data path. The only post-aggregate work runs
  * on the GROUP table (one row per group), never on rows.
  */
object Stats {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private def d(c: Column): Column = c.cast("double")

  /** Welch's unequal-variance two-sample t-test between `groupA` and
    * `groupB` of `groupCol`, over `valueCol` (2dp money-like doubles).
    * Output: one row — n/mean/var per side, the t statistic, and the
    * Welch–Satterthwaite degrees of freedom. The caller looks t up against
    * the t table for their alpha; computing the p-value needs the
    * incomplete beta function, which belongs in the analysis notebook, not
    * the engine.
    *
    * Plan: conditional aggregation — one scan of the filtered union, one
    * 1-row global aggregate (Σx and Σx² per side as exact decimals, the
    * cross products of DECIMAL(12,2) are DECIMAL(25,4) — still exact).
    * Sample variance uses the n-1 denominator. */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String,
                 groupA: String, groupB: String): DataFrame = {
    val g = col(groupCol)
    val v = dec(col(valueCol))
    def side(tag: String, grp: String) = Seq(
      count(when(g === grp, 1)).as(s"n_$tag"),
      sum(when(g === grp, v)).as(s"__sx_$tag"),
      sum(when(g === grp, v * v)).as(s"__sxx_$tag"))
    val agg = df.where(g === groupA || g === groupB)
      .agg(side("a", groupA).head,
        (side("a", groupA).tail ++ side("b", groupB)): _*)
    def mean(t: String) = d(col(s"__sx_$t")) / d(col(s"n_$t"))
    // sample variance from exact components: (Σx² − (Σx)²/n) / (n−1)
    def vr(t: String) =
      (d(col(s"__sxx_$t")) - d(col(s"__sx_$t")) * d(col(s"__sx_$t")) / d(col(s"n_$t"))) /
        (d(col(s"n_$t")) - lit(1.0))
    val se2a = vr("a") / d(col("n_a"))
    val se2b = vr("b") / d(col("n_b"))
    agg.select(
      col("n_a"), mean("a").as("mean_a"), vr("a").as("var_a"),
      col("n_b"), mean("b").as("mean_b"), vr("b").as("var_b"),
      ((mean("a") - mean("b")) / sqrt(se2a + se2b)).as("t_stat"),
      // Welch–Satterthwaite: (s²a/na + s²b/nb)² / (Σ (s²/n)²/(n−1))
      (pow(se2a + se2b, 2.0) /
        (pow(se2a, 2.0) / (d(col("n_a")) - lit(1.0)) +
          pow(se2b, 2.0) / (d(col("n_b")) - lit(1.0)))).as("welch_df"))
  }

  /** Cohen's kappa — chance-corrected agreement between two boolean raters
    * (e.g. two heuristic quality gates, or an LLM judge vs a rule). Output:
    * one row with the 2×2 confusion counts, observed agreement po, chance
    * agreement pe, and kappa = (po − pe) / (1 − pe).
    *
    * Plan: one scan, one 1-row aggregate of four conditional counts; the
    * formula runs once on the driver-side row. Kappa is NULL when pe = 1
    * (both raters constant — agreement is undefined, not perfect). */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val agg = df.agg(
      count(when(raterA && raterB, 1)).as("n_yy"),
      count(when(raterA && !raterB, 1)).as("n_yn"),
      count(when(!raterA && raterB, 1)).as("n_ny"),
      count(when(!raterA && !raterB, 1)).as("n_nn"))
    val n = d(col("n_yy") + col("n_yn") + col("n_ny") + col("n_nn"))
    val po = (d(col("n_yy")) + d(col("n_nn"))) / n
    val pa = (d(col("n_yy")) + d(col("n_yn"))) / n // P(raterA = yes)
    val pb = (d(col("n_yy")) + d(col("n_ny"))) / n // P(raterB = yes)
    val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
    agg.select(col("n_yy"), col("n_yn"), col("n_ny"), col("n_nn"),
      po.as("po"), pe.as("pe"),
      when(pe === 1.0, lit(null).cast("double"))
        .otherwise((po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** Delete-one-group jackknife over a mean: for each group (source), the
    * mean of `valueCol` with that whole group REMOVED, and the group's
    * pseudo-value influence g·θ − (g−1)·θ₋ᵢ — the standard "how much does
    * one source move the headline number" robustness sheet for a corpus
    * metric (delete-a-group jackknife is the variance estimator that
    * actually works when rows within a source are correlated).
    *
    * Plan: one keyed aggregate to the per-group (n, Σx) table, one 1-row
    * global roll-up of that table broadcast back with a cross join (the
    * q164 scalar-broadcast pattern) — the data is touched once; everything
    * after runs on one row per group. */
  def jackknifeByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_g"), sum(dec(col(valueCol))).as("__s_g"))
    val tot = per.agg(sum(col("n_g")).as("__n"), sum(col("__s_g")).as("__s"),
      count(lit(1)).as("__g"))
    val overall = d(col("__s")) / d(col("__n"))
    val looMean = (d(col("__s")) - d(col("__s_g"))) / (d(col("__n")) - d(col("n_g")))
    per.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_g"),
        looMean.as("loo_mean"),
        (d(col("__g")) * overall - (d(col("__g")) - lit(1.0)) * looMean)
          .as("pseudo_value"))
  }

  /** Per-group winsorized mean: clamp `valueCol` to the group's
    * [pLo, pHi] exact interpolated percentiles, then average — the outlier-
    * robust mean a metrics pipeline reports when a few huge values would
    * otherwise own the average. Output per group: n, the two bounds, the
    * winsorized mean, and n_lo/n_hi clamp counts.
    *
    * Determinism: summing CLAMPED doubles would re-introduce order
    * dependence (the bounds are interpolated doubles), so the sum is
    * assembled as exact-decimal Σ of the untouched middle values plus
    * n_lo·lo + n_hi·hi in ONE final double expression — bit-stable at any
    * partitioning, same as the oracle computes it.
    *
    * Plan: two keyed aggregates over the same scan (percentile bounds, then
    * the conditional sums) joined on the group key — both shuffles are on
    * the group key and AQE broadcasts the tiny bounds table. */
  def winsorizedMean(df: DataFrame, groupCol: String, valueCol: String,
                     pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0 <= pLo < pHi <= 1")
    val v = col(valueCol)
    val bounds = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, array(${pLo}D, ${pHi}D))").as("__qs"))
      .select(col(groupCol), col("__qs").getItem(0).as("lo"),
        col("__qs").getItem(1).as("hi"))
    df.join(bounds, groupCol)
      .groupBy(col(groupCol), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"),
        count(when(v < col("lo"), 1)).as("n_lo"),
        count(when(v > col("hi"), 1)).as("n_hi"),
        sum(when(v >= col("lo") && v <= col("hi"), dec(v))).as("__s_mid"))
      .select(col(groupCol), col("n"), col("lo"), col("hi"),
        col("n_lo"), col("n_hi"),
        ((coalesce(d(col("__s_mid")), lit(0.0)) +
          d(col("n_lo")) * col("lo") + d(col("n_hi")) * col("hi")) / d(col("n")))
          .as("winsorized_mean"))
  }
}
