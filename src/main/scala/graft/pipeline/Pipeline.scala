package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

/** The reference's five-stage daily DAG as a plain driver program
  * (reference: dags/weather_daily_etl.py:217 —
  * `bronze >> silver >> gold >> load_pg_stage >> pg_upsert`), fail-fast and
  * sequential, with the same idempotency contract (O6): partition overwrite +
  * stage delete + ON-CONFLICT upsert + dedup-AVG mean a re-run of any day
  * converges to the same final row.
  */
object Pipeline {

  /** One day end-to-end. `fetch` is injectable (tests use a fixture payload;
    * production uses [[HttpSource.fetchForecast]]). Returns the staged-row
    * count the upsert consumed (the reference's diagnostic K8). */
  def runDay(spark: SparkSession, cfg: AppConfig, date: LocalDate,
             fetch: AppConfig => String = HttpSource.fetchForecast(_)): Long = {
    // Y3: actually apply the configured shuffle width (the reference declares
    // shuffle_partitions in yaml but never passes it, config/settings.yaml:23
    // vs dags/weather_daily_etl.py:83-88).
    spark.conf.set("spark.sql.shuffle.partitions", cfg.spark.shufflePartitions.toString)
    val body = fetch(cfg)                                          // O1 stage 1: bronze extract
    ObjectStore.putBronze(
      spark.sparkContext.hadoopConfiguration, cfg.storage.bronze, date, body)
    SilverJob.run(spark, cfg, date)                                // stage 2: silver
    GoldJob.run(spark, cfg, date)                                  // stage 3: gold
    StageLoadJob.run(spark, cfg, date)                             // stage 4: JDBC stage
    Upsert.runDay(cfg.postgres,                                    // stage 5: upsert
      date.getYear, date.getMonthValue, date.getDayOfMonth)
  }

  /** Sequential backfill in date order — max_active_runs=1 parity
    * (reference: dags/weather_daily_etl.py:66; README.md:88-102). */
  def runRange(spark: SparkSession, cfg: AppConfig,
               start: LocalDate, endInclusive: LocalDate,
               fetch: AppConfig => String = HttpSource.fetchForecast(_)): Seq[(LocalDate, Long)] =
    Iterator.iterate(start)(_.plusDays(1))
      .takeWhile(!_.isAfter(endInclusive))
      .map(d => d -> runDay(spark, cfg, d, fetch))
      .toSeq

  /** CLI: `--config path --date YYYY-MM-DD [--end YYYY-MM-DD]`
    * (reference: O2 — Jinja `{{ ds }}` → argv). */
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val cfg = AppConfig.load(opts("--config"))
    val start = LocalDate.parse(opts("--date"))
    val end = opts.get("--end").map(LocalDate.parse).getOrElse(start)
    val spark = graft.Graft.session("graft-pipeline")
    try {
      val counts = runRange(spark, cfg, start, end)
      counts.foreach { case (d, n) => println(s"[pipeline] $d staged=$n ok") }
    } finally spark.stop()
  }
}
