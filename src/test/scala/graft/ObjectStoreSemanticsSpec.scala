package graft

import java.nio.file.Files
import java.time.LocalDate

import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline._

/** Deploy-shape smoke for the object-store path (r10 verdict item 5): the
  * reference writes bronze/silver/gold to MinIO over s3a://
  * (docker/spark/spark-defaults.conf:1-6, docker/docker-compose.yml:28-33);
  * every repo test before this round ran on file:/ only. This sandbox has
  * no network and no hadoop-aws jar, so the smoke runs against
  * [[ObjectStoreMockFs]] — a FileSystem with S3-FAMILY semantics (flat
  * keys, PUT-visible-on-close, non-atomic copy+delete rename) rather than
  * a POSIX one, which is exactly the behavioral surface that breaks
  * file:/-only pipelines on a real object store.
  */
class ObjectStoreSemanticsSpec extends AnyFunSuite with BeforeAndAfterEach {
  lazy val spark = SparkTestSession.spark

  override def beforeEach(): Unit = {
    ObjectStoreMockFs.clear()
    ObjectStoreMockFs.register(spark.sparkContext.hadoopConfiguration)
  }

  private def payload(day: String): String = {
    val times = (0 until 24).map(h => "\"" + f"${day}T$h%02d:00" + "\"")
      .mkString("[", ",", "]")
    def arr(f: Int => Double) =
      (0 until 24).map(f).mkString("[", ",", "]")
    s"""{"latitude": 39.68, "longitude": -75.75, "timezone": "UTC",
       | "elevation": 27.0,
       | "hourly": {"time": $times, "temperature_2m": ${arr(h => 10.0 + h * 0.5)},
       |   "relative_humidity_2m": ${arr(h => 60.0 + h)},
       |   "precipitation": ${arr(h => if (h % 6 == 0) 1.5 else 0.0)}}}""".stripMargin
  }

  private def mkCfg(dbRoot: java.nio.file.Path): AppConfig = AppConfig(
    SourceCfg("http://example.test/v1/forecast", 39.68, -75.75, "auto",
      Seq("temperature_2m", "relative_humidity_2m", "precipitation")),
    StorageCfg("s3mock://bucket/bronze", "s3mock://bucket/silver",
      "s3mock://bucket/gold"),
    SparkCfg(shufflePartitions = 4),
    PgCfg(s"jdbc:derby:$dbRoot/db;create=true", "app", "app",
      "org.apache.derby.jdbc.EmbeddedDriver", "weather_daily_stage",
      "weather_daily"))

  test("ObjectStore.put round-trips bytes through a flat-key store (K1 on s3a shape)") {
    val conf = spark.sparkContext.hadoopConfiguration
    val date = LocalDate.parse("2025-09-15")
    val body = payload("2025-09-15")
    val written = ObjectStore.putBronze(conf, "s3mock://bucket/bronze", date, body)
    assert(written ==
      "s3mock://bucket/bronze/openmeteo/y=2025/m=09/d=15/openmeteo_2025-09-15.json")
    val back = spark.read.option("wholetext", "true").text(written)
      .head().getString(0)
    assert(back == body, "bronze object must be byte-verbatim")
    assert(ObjectStoreMockFs.objectCount == 1)
  }

  test("full day pipeline runs on object-store semantics; dynamic overwrite keeps sibling days") {
    val dbRoot = Files.createTempDirectory("graft_s3mock_db")
    val cfg = mkCfg(dbRoot)
    val d1 = LocalDate.parse("2025-09-15")
    val d2 = LocalDate.parse("2025-09-16")

    Pipeline.runDay(spark, cfg, d1, _ => payload("2025-09-15"))
    Pipeline.runDay(spark, cfg, d2, _ => payload("2025-09-16"))
    // the committer must have moved task files via copy+delete — the
    // non-atomic path a real object store forces
    assert(ObjectStoreMockFs.renameCopies > 0,
      "parquet commit never exercised the copy+delete rename path")

    // re-run day 1: dynamic partition overwrite on the object store must
    // replace d=15 only (root-clobber would also pass on file:/ but lose
    // day 2 here just the same — this is the S3A-critical correctness)
    Pipeline.runDay(spark, cfg, d1, _ => payload("2025-09-15"))
    val silver = spark.read.parquet("s3mock://bucket/silver/openmeteo/")
    assert(silver.count() == 48,
      "both days must survive a day-1 re-run on the object store")
    assert(silver.where("d = 15").count() == 24)

    // gold read-back straight from the mock store
    val gold = spark.read.parquet("s3mock://bucket/gold/openmeteo/")
    assert(gold.count() == 2, "one gold row per day")

    // no stray half-committed junk: every surviving key is real data or
    // Spark metadata, never a _temporary residue
    assert(!ObjectStoreMockFs.keys.exists(_.contains("_temporary")),
      s"committer left temp keys: ${ObjectStoreMockFs.keys.take(5)}")
  }
}
