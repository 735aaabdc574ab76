package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Stats, Temporal}

/** Fixture semantics for the q236–q240 profiling batch: the CUSUM step
  * landing on the last pre-shift day, last-event tie-breaks, known
  * moments of tiny distributions, overlap Jaccard by hand, and the
  * Pareto crossing at an exact bucket boundary. */
class ProfileQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(day: Long, sec: Long = 0): java.sql.Timestamp =
    new java.sql.Timestamp(day * 86400000L + sec * 1000L)

  test("cusumChangepoint: step series peaks on the last pre-step day") {
    // counts 1,1,1,5,5,5 over days 1..6: |D*CUSUM| peaks at day 3 (36),
    // peak/D = 6.0
    val df = (1L to 6L).flatMap { day =>
      val n = if (day <= 3) 1 else 5
      (1 to n).map(i => ("k", ts(day, i)))
    }.toDF("k", "ts")
    val r = Temporal.cusumChangepoint(df, "k", "ts").collect()(0)
    assert(r.getLong(1) == 3, s"change day: ${r.getLong(1)}")
    assert(r.getLong(2) == 6)
    assert(math.abs(r.getDouble(3) - 6.0) < 1e-12)
  }

  test("lastEventCensus: latest ts wins, id breaks timestamp ties") {
    val df = Seq(
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "purchase"),
      (2L, ts(1), 3L, "click"),
      (3L, ts(5), 5L, "a"), (3L, ts(5), 6L, "b")) // tie → higher id
      .toDF("user_id", "ts", "event_id", "event_type")
    val m = Temporal.lastEventCensus(df, "user_id", "ts", "event_id",
      "event_type").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m.keySet == Set("purchase", "click", "b"))
    assert(m("b")._1 == 1 && math.abs(m("b")._2 - 1.0 / 3) < 1e-12)
  }

  test("shapeMoments: symmetric → skew 0 / kurtosis -1.5, constant → NULLs") {
    val df = Seq(("s", 1), ("s", 2), ("s", 3), ("c", 5), ("c", 5))
      .toDF("g", "v")
    val rows = Stats.shapeMoments(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    val s = rows("s")
    assert(math.abs(s.getDouble(2) - 2.0) < 1e-12)         // mean
    assert(math.abs(s.getDouble(3) - 2.0 / 3) < 1e-12)     // m2
    assert(math.abs(s.getDouble(4)) < 1e-12)               // skewness
    assert(math.abs(s.getDouble(5) - (-1.5)) < 1e-12)      // excess kurtosis
    assert(rows("c").isNullAt(4) && rows("c").isNullAt(5))
  }

  test("groupOverlapJaccard: hand-counted intersections, zero pairs dropped") {
    val df = Seq((1, "a"), (1, "b"), (2, "a"), (3, "b"), (3, "c"), (1, "a"))
      .toDF("e", "g")
    val m = Stats.groupOverlapJaccard(df, "e", "g").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(m.keySet == Set(("a", "b"), ("b", "c"))) // (a,c) never co-occurs
    assert(m(("a", "b"))._1 == 1 && math.abs(m(("a", "b"))._2 - 1.0 / 3) < 1e-12)
    assert(math.abs(m(("b", "c"))._2 - 0.5) < 1e-12)
  }

  test("paretoCoverage: crossing at the exact 80% bucket boundary") {
    // per-entity cents 100, 100, 800; $1-buckets: the 800 bucket alone
    // carries exactly 80% → n_top = 1
    val df = Seq((1, 1.00), (2, 1.00), (3, 8.00)).toDF("cust", "v")
    val r = Stats.paretoCoverage(df, "cust", "v", bucketCents = 100L,
      num = 4L, den = 5L).collect()(0)
    assert(r.getLong(0) == 800 && r.getLong(1) == 1 && r.getLong(2) == 3)
    assert(math.abs(r.getDouble(3) - 0.8) < 1e-12)
  }
}
