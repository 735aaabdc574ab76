package graft.pipeline

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** Typed configuration mirroring the reference's settings.yaml
  * (reference: config/settings.yaml:4-34, loaded at dags/weather_daily_etl.py:20-22).
  *
  * One source of truth for the hourly variable list — the reference duplicates
  * it between yaml and the Silver job's hard-coded column list
  * (reference: spark_jobs/silver_openmeteo.py:31); here both the URL builder
  * and the Silver pivot read [[SourceCfg.hourlyVars]].
  */
final case class SourceCfg(
    baseUrl: String,
    latitude: Double,
    longitude: Double,
    timezone: String,
    hourlyVars: Seq[String])

final case class StorageCfg(bronze: String, silver: String, gold: String)

final case class SparkCfg(shufflePartitions: Int)

final case class PgCfg(
    url: String,
    user: String,
    password: String,
    driver: String,
    tableStage: String,
    tableFinal: String)

final case class AppConfig(
    source: SourceCfg,
    storage: StorageCfg,
    spark: SparkCfg,
    postgres: PgCfg,
    hadoop: Map[String, String] = Map.empty) {

  /** Forecast URL for the day's fetch (reference: dags/weather_daily_etl.py:27-30). */
  def forecastUrl: String =
    s"$baseUrlNoSlash?latitude=${source.latitude}&longitude=${source.longitude}" +
      s"&hourly=${source.hourlyVars.mkString(",")}&timezone=${source.timezone}"

  private def baseUrlNoSlash = source.baseUrl.stripSuffix("/")

  /** Apply the `hadoop:` section to the session's Hadoop configuration —
    * the config-file home for object-store wiring the reference ships as
    * spark-defaults (reference: docker/spark/spark-defaults.conf:1-5, S3A
    * endpoint/credentials/path-style for MinIO). Keys are plain Hadoop conf
    * names (`fs.s3a.endpoint`, ...); any Hadoop filesystem the storage URIs
    * name can be configured this way without touching launcher flags.
    * Idempotent; called by every pipeline entry point. */
  def applyHadoop(spark: org.apache.spark.sql.SparkSession): Unit =
    hadoop.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
}

object AppConfig {

  /** Parse the reference-shaped YAML document (reference: config/settings.yaml). */
  def fromYaml(yaml: String): AppConfig = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[JMap[String, AnyRef]](yaml).asScala
    def sect(k: String) = root(k).asInstanceOf[JMap[String, AnyRef]].asScala
    def str(m: scala.collection.Map[String, AnyRef], k: String) = m(k).toString
    def dbl(m: scala.collection.Map[String, AnyRef], k: String) = str(m, k).toDouble
    def int(m: scala.collection.Map[String, AnyRef], k: String) = str(m, k).toInt

    val src = sect("source")
    val sto = sect("storage")
    val spk = sect("spark")
    val pg = sect("postgres")
    AppConfig(
      SourceCfg(
        baseUrl = str(src, "base_url"),
        latitude = dbl(src, "latitude"),
        longitude = dbl(src, "longitude"),
        timezone = str(src, "timezone"),
        hourlyVars = str(src, "hourly").split(",").map(_.trim).toSeq),
      StorageCfg(str(sto, "bronze"), str(sto, "silver"), str(sto, "gold")),
      SparkCfg(int(spk, "shuffle_partitions")),
      PgCfg(
        url = str(pg, "url"),
        user = str(pg, "user"),
        password = str(pg, "password"),
        driver = str(pg, "driver"),
        tableStage = str(pg, "table_stage"),
        tableFinal = str(pg, "table_final")),
      // `hadoop:` with no keys parses as null — treat like an absent section.
      hadoop = root.get("hadoop")
        .collect { case m: JMap[String @unchecked, AnyRef @unchecked] =>
          m.asScala.map { case (k, v) => k -> v.toString }.toMap }
        .getOrElse(Map.empty))
  }

  def load(path: String): AppConfig =
    fromYaml(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
}
