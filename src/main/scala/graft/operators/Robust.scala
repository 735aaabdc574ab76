package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust (median/MAD) per-group outlier detection — the length-outlier
  * screen a corpus-QA stage runs per source before training-data export:
  * a doc is flagged when its value deviates from the group median by more
  * than `cutoff` × the group's median absolute deviation.
  *
  * Determinism: Spark's `median` is the exact interpolated 50th percentile
  * (sort-based per group), identical to DuckDB's `median` on integer input —
  * every intermediate is an exactly-representable double (halves of
  * integers), so the strict `>` comparison is bit-deterministic.
  *
  * Scale: two keyed aggregates over a narrow (key, id, value) projection and
  * two BROADCAST joins of |groups|-row stat tables — value data is scanned,
  * never shuffled. Exact per-group median does sort each group; at 100 TB
  * with huge groups swap the two `median` calls for `approx_percentile`
  * (same shape, bounded state — the q96/q107 sketch path) at the cost of the
  * exact-oracle contract.
  */
object Robust {

  /** Flag rows where |value - median_g| > cutoff * MAD_g within each group.
    * Output: keyCol, idCol, valCol, med, mad (stat columns as double). */
  def madOutliers(df: DataFrame, keyCol: String, idCol: String, valCol: String,
                  cutoff: Double): DataFrame = {
    val vals = df.select(col(keyCol), col(idCol), col(valCol))
    val med = vals.groupBy(col(keyCol))
      .agg(median(col(valCol)).as("med"))
    // dev feeds BOTH the MAD aggregate and the output join — pin it so the
    // value scan + median join run once, not once per consumer
    val dev = CacheScope.persist(vals.join(broadcast(med), keyCol)
      .withColumn("adev", abs(col(valCol).cast("double") - col("med"))))
    val mad = dev.groupBy(col(keyCol))
      .agg(median(col("adev")).as("mad"))
    dev.join(broadcast(mad), keyCol)
      .where(col("adev") > lit(cutoff) * col("mad"))
      .select(col(keyCol), col(idCol), col(valCol), col("med"), col("mad"))
  }
}
