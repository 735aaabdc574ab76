package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Silver transform: one day's raw bronze JSON → flattened hourly Parquet
  * (reference: spark_jobs/silver_openmeteo.py:12-71).
  *
  * Deliberate divergences from the reference (SURVEY.md §3.5):
  *  - explicit schema instead of inference (corrupt docs → filtered, not fatal);
  *  - deterministic document selection (latest file name) instead of limit(1);
  *  - int partition columns instead of zero-padded strings;
  *  - dynamic partition overwrite, so a re-run replaces only its own day.
  *
  * Scale: one day-partition is one small payload, so coalesce(1) matches the
  * reference's file-count control (spark_jobs/silver_openmeteo.py:60). For a
  * 100 TB multi-tenant variant the same plan holds with coalesce removed —
  * the write is already partitioned by (y,m,d) and shuffle-free.
  */
object SilverJob {

  /** Reference's output names for the standard hourly variables
    * (spark_jobs/silver_openmeteo.py:43-45); unknown vars keep their name. */
  private val renames = Map(
    "temperature_2m" -> "temperature_c",
    "relative_humidity_2m" -> "humidity_pct",
    "precipitation" -> "precip_mm")

  /** The Silver pivot shared by the batch and streaming paths: filter corrupt
    * docs, arrays_zip + explode the parallel hourly arrays, cast + rename the
    * values, parse event_ts. Output: lat, lon, tz, <renamed vars>, event_ts. */
  def flattenHourly(raw: DataFrame, hourlyVars: Seq[String]): DataFrame = {
    val zipped = raw
      .where(col("_corrupt_record").isNull && col("hourly").isNotNull)
      .select(
        col("latitude").cast("double").as("lat"),
        col("longitude").cast("double").as("lon"),
        col("timezone").as("tz"),
        explode(arrays_zip(
          (col("hourly.time") +: hourlyVars.map(v => col(s"hourly.$v"))): _*)).as("h"))
    val valueCols = hourlyVars.map { v =>
      col(s"h.$v").cast("double").as(renames.getOrElse(v, v))
    }
    zipped.select(
      (Seq(col("lat"), col("lon"), col("tz")) ++ valueCols :+
        to_timestamp(col("h.time")).as("event_ts")): _*)
  }

  def dayPath(root: String, date: LocalDate): String =
    f"${root.stripSuffix("/")}/openmeteo/y=${date.getYear}%04d/" +
      f"m=${date.getMonthValue}%02d/d=${date.getDayOfMonth}%02d/"

  /** Flatten the day's bronze doc to hourly rows (no write). */
  def transform(spark: SparkSession, bronzeRoot: String, date: LocalDate,
                hourlyVars: Seq[String]): DataFrame = {
    // multiLine: one bronze object = ONE JSON document (stored verbatim, so it
    // may be pretty-printed) — unlike the reference's line-mode read
    // (spark_jobs/silver_openmeteo.py:24), which silently corrupts any
    // payload that spans lines.
    val raw = spark.read
      .schema(Schemas.bronze(hourlyVars))
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dayPath(bronzeRoot, date))

    // Deterministic single-doc selection: the lexicographically last file in
    // the partition wins (vs the reference's arbitrary limit(1),
    // spark_jobs/silver_openmeteo.py:28). Implemented as a 1-row max
    // aggregate + broadcast join rather than an unpartitioned window: a
    // global Window.orderBy funnels every row through one partition, which
    // is exactly the shape that dies on a fat day-partition at scale.
    val withFile = raw
      .where(col("_corrupt_record").isNull && col("hourly").isNotNull)
      .withColumn("_src_file", input_file_name())
    val latest = withFile.agg(max(col("_src_file")).as("_latest_file"))
    val doc = withFile
      .join(broadcast(latest), col("_src_file") === col("_latest_file"))
      .drop("_latest_file")

    flattenHourly(doc, hourlyVars)
      .withColumn("y", lit(date.getYear))
      .withColumn("m", lit(date.getMonthValue))
      .withColumn("d", lit(date.getDayOfMonth))
  }

  /** Transform + partitioned write (reference: spark_jobs/silver_openmeteo.py:63-69). */
  def run(spark: SparkSession, cfg: AppConfig, date: LocalDate): DataFrame = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val out = transform(spark, cfg.storage.bronze, date, cfg.source.hourlyVars)
    out.coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("y", "m", "d")
      .parquet(s"${cfg.storage.silver.stripSuffix("/")}/openmeteo/")
    out
  }
}
