package graft.pipeline

import java.time.LocalDate
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Stage load: the day's Gold partition → JDBC append into the stage table
  * (reference: spark_jobs/load_gold_to_pg.py:13-45).
  *
  * Uses the reference's basePath trick (load_gold_to_pg.py:20-22): reading the
  * partition directory with `basePath` = gold root keeps y/m/d as columns
  * (already int here, so no re-cast dance — the reference forces int at :26-28
  * because its partition values were strings).
  */
object StageLoadJob {

  def partitionPath(goldRoot: String, date: LocalDate): String =
    f"${goldRoot.stripSuffix("/")}/openmeteo/y=${date.getYear}/" +
      f"m=${date.getMonthValue}/d=${date.getDayOfMonth}"

  def read(spark: SparkSession, cfg: AppConfig, date: LocalDate): DataFrame =
    spark.read
      .option("basePath", s"${cfg.storage.gold.stripSuffix("/")}/openmeteo/")
      .parquet(partitionPath(cfg.storage.gold, date))
      .select(
        col("y").cast("int"), col("m").cast("int"), col("d").cast("int"),
        col("min_temp_c"), col("max_temp_c"), col("avg_temp_c"),
        col("precip_mm_sum"), col("avg_humidity_pct"))

  /** Append into the stage table (reference: load_gold_to_pg.py:36-43). */
  def run(spark: SparkSession, cfg: AppConfig, date: LocalDate): Long = {
    val df = read(spark, cfg, date)
    val props = new Properties()
    props.setProperty("user", cfg.postgres.user)
    props.setProperty("password", cfg.postgres.password)
    props.setProperty("driver", cfg.postgres.driver)
    df.write.mode(SaveMode.Append).jdbc(cfg.postgres.url, cfg.postgres.tableStage, props)
    df.count()
  }
}
