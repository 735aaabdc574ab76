package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Gold aggregate: the day's Silver rows → one row of daily metrics
  * (reference: spark_jobs/gold_openmeteo.py:12-36).
  *
  * Two deliberate upgrades (SURVEY.md §2.5, §4.1):
  *  - read the Silver ROOT and select the day with a predicate, so Catalyst
  *    partition-prunes (identical I/O to the reference's path-encoding, but
  *    schema-stable and multi-day-safe);
  *  - groupBy(y,m,d) instead of a global agg — identical output for one day,
  *    correct (not accidentally global) for multi-day input.
  */
object GoldJob {

  def aggregate(silver: DataFrame): DataFrame =
    silver.groupBy(col("y"), col("m"), col("d"))
      .agg(
        min(col("temperature_c")).as("min_temp_c"),
        max(col("temperature_c")).as("max_temp_c"),
        avg(col("temperature_c")).as("avg_temp_c"),
        sum(col("precip_mm")).as("precip_mm_sum"),
        avg(col("humidity_pct")).as("avg_humidity_pct"))

  def run(spark: SparkSession, cfg: AppConfig, date: LocalDate): DataFrame = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val silver = spark.read
      .parquet(s"${cfg.storage.silver.stripSuffix("/")}/openmeteo/")
      .where(col("y") === date.getYear &&
        col("m") === date.getMonthValue && col("d") === date.getDayOfMonth)
    val out = aggregate(silver)
    out.coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("y", "m", "d")
      .parquet(s"${cfg.storage.gold.stripSuffix("/")}/openmeteo/")
    out
  }
}
