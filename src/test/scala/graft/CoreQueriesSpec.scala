package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class CoreQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("every declared query runs at sf0.001 and has a stable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q03 global agg invariants: min <= avg <= max") {
    val r = SparkEntry.queries("q03_global_agg")(spark, sf).collect().head
    val (mn, mx, av) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(mn <= av && av <= mx)
  }

  test("q06 unnest roundtrip preserves exact row count") {
    val n = SparkEntry.queries("q06_unnest_roundtrip")(spark, sf).count()
    val base = Graft.table(spark, sf, "lineitem").count()
    assert(n == base)
  }

  test("q08 topk is ordered desc and bounded") {
    val rows = SparkEntry.queries("q08_topk")(spark, sf).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q12 dedup keeps exactly one row per key") {
    val df = SparkEntry.queries("q12_dedup_first_per_key")(spark, sf)
    assert(df.groupBy("o_custkey").count().filter("count > 1").count() == 0)
  }

  test("q18 window rank caps at 3 per customer") {
    val df = SparkEntry.queries("q18_window_rank")(spark, sf)
    assert(df.groupBy("o_custkey").count().filter("count > 3").count() == 0)
  }
}
