package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained keyed aggregate — the materialized-view pattern
  * for append-only feeds: each day contributes MERGEABLE partials
  * (decimal-exact sum + count per key) appended to a store, and the current
  * aggregate is one small rollup over the partials. No day ever reprocesses
  * history, and avg derives from (sum, n) at read time — partials stay
  * mergeable (an avg column would not be).
  *
  * Idempotency is ledger-based: the store's own `day` column is the ledger.
  * A replayed day sees its partials already present and is skipped — the
  * counterpart of [[graft.streaming.IncrementalDedup]]'s content-as-guard,
  * for the aggregation shape where re-appending would DOUBLE-count rather
  * than no-op.
  *
  * Scale: the daily merge aggregates only the batch (one keyed shuffle of
  * new data); the read-side rollup touches keys x days partial rows, not
  * raw history. The decimal route makes the rolled-up sum bit-identical to
  * a direct aggregate over all raw data at any partitioning. */
object IncrementalAgg {

  /** Merge one day's batch into the partial store. Returns false (and does
    * nothing) when the day is already in the ledger. */
  def mergeDay(batch: DataFrame, groupCol: String, valueCol: String,
               day: String, storeDir: String): Boolean = {
    val spark = batch.sparkSession
    val path = new org.apache.hadoop.fs.Path(storeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path) &&
        !spark.read.parquet(storeDir).where(col("day") === day).isEmpty)
      return false
    batch.groupBy(col(groupCol))
      .agg(sum(graft.operators.Relational.dec(col(valueCol))).as("sum_dec"),
        count(lit(1)).as("n"))
      .withColumn("day", lit(day))
      .write.mode("append").parquet(storeDir)
    true
  }

  /** The current aggregate over every merged day: per-key sum (double), row
    * count, and derived average. */
  def current(spark: SparkSession, groupCol: String, storeDir: String): DataFrame =
    spark.read.parquet(storeDir)
      .groupBy(col(groupCol))
      .agg(sum(col("sum_dec")).cast("double").as("sum_value"),
        sum(col("n")).as("n"))
      .withColumn("avg_value", col("sum_value") / col("n").cast("double"))
}
