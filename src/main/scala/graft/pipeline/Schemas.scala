package graft.pipeline

import org.apache.spark.sql.types._

/** Explicit schemas for the medallion layers (SURVEY.md §1).
  *
  * The reference infers the bronze schema from untrusted JSON
  * (reference: spark_jobs/silver_openmeteo.py:24) — an extra eager pass plus
  * an injection surface. The rebuild pins it: unknown fields are dropped,
  * malformed docs land in `_corrupt_record` instead of failing the job.
  */
object Schemas {

  /** Open-Meteo payload: struct of equal-length parallel arrays
    * (reference: dags/weather_daily_etl.py:45-50, consumed at
    * spark_jobs/silver_openmeteo.py:26-32). */
  def bronze(hourlyVars: Seq[String]): StructType =
    StructType(Seq(
      StructField("latitude", DoubleType),
      StructField("longitude", DoubleType),
      StructField("timezone", StringType),
      StructField("hourly", StructType(
        StructField("time", ArrayType(StringType)) +:
          hourlyVars.map(v => StructField(v, ArrayType(DoubleType))))),
      StructField("_corrupt_record", StringType)))

  /** One row per hour (reference: spark_jobs/silver_openmeteo.py:38-57). */
  final case class HourlyObservation(
      lat: Double, lon: Double, tz: String,
      temperature_c: Option[Double], humidity_pct: Option[Double],
      precip_mm: Option[Double],
      event_ts: java.sql.Timestamp,
      y: Int, m: Int, d: Int)

  /** One row per day (reference: spark_jobs/gold_openmeteo.py:20-29). */
  final case class DailyMetrics(
      min_temp_c: Option[Double], max_temp_c: Option[Double],
      avg_temp_c: Option[Double], precip_mm_sum: Option[Double],
      avg_humidity_pct: Option[Double],
      y: Int, m: Int, d: Int)
}
