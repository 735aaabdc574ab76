package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Stats, Temporal}

/** Fixture semantics for the q231–q235 series batch — above all the gap
  * paths the dense sf0.01 calendar never exercises: interior holes
  * (LOCF + true interpolation), leading holes (back-fill), conversion
  * ordering rules, zero-variance strata, and weekday arithmetic. */
class SeriesQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(day: Long, sec: Long = 0): java.sql.Timestamp =
    new java.sql.Timestamp(day * 86400000L + sec * 1000L)

  test("gapFill: interior holes interpolate, leading holes back-fill") {
    val df = Seq(("k", ts(1), 10.0), ("k", ts(4), 40.0), ("k2", ts(3), 7.0))
      .toDF("k", "ts", "v")
    val rows = Temporal.gapFill(df, "k", "ts", "v").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), Option(r.get(3)), r.getDouble(4))).toMap
    assert(rows.size == 8, "2 keys x days 1..4")
    assert(rows(("k", 2L)) == ((0L, Some(10.0), 20.0))) // interpolated
    assert(rows(("k", 3L)) == ((0L, Some(10.0), 30.0)))
    assert(rows(("k", 4L)) == ((1L, Some(40.0), 40.0)))
    assert(rows(("k2", 1L)) == ((0L, None, 7.0)))       // leading: back-fill
    assert(rows(("k2", 4L)) == ((0L, Some(7.0), 7.0)))  // trailing: LOCF
  }

  test("conversionLatency: ordering rules, minute floor, grid percentiles") {
    val df = Seq(
      (1L, ts(1, 0), "view"), (1L, ts(1, 90), "purchase"),   // 1 min
      (2L, ts(1, 0), "view"), (2L, ts(1, 30), "purchase"),   // 0 min
      (3L, ts(1, 50), "view"), (3L, ts(1, 10), "purchase"),  // purchase first
      (4L, ts(1, 0), "view"),                                 // never converts
      (5L, ts(1, 0), "purchase"))                             // never viewed
      .toDF("user_id", "ts", "event_type")
    val r = Temporal.conversionLatency(df, "user_id", "ts", "event_type",
      "view", "purchase").collect()(0)
    assert(r.getLong(0) == 2)
    assert(r.getLong(1) == 0 && r.getLong(2) == 1) // p50, p90
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12)
  }

  test("neymanAllocation: zero-variance strata get nothing") {
    val df = Seq(("a", 0), ("a", 10), ("b", 5), ("b", 5)).toDF("g", "v")
    val m = Stats.neymanAllocation(df, "g", "v", budget = 10).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getLong(4))).toMap
    assert(math.abs(m("a")._1 - 1.0) < 1e-12 && m("a")._2 == 10)
    assert(math.abs(m("b")._1) < 1e-12 && m("b")._2 == 0)
  }

  test("cumulativeUniques: first-seen only, dense grid, running total") {
    val df = Seq((1L, ts(1)), (2L, ts(1)), (1L, ts(2)), (3L, ts(3)),
      (2L, ts(3))).toDF("user_id", "ts")
    val rows = Temporal.cumulativeUniques(df, "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 2L, 2L), (2L, 0L, 2L), (3L, 1L, 3L)))
  }

  test("dowSeasonality: doubled weekday reads 1.75x on a two-week span") {
    val df = (1L to 14L).flatMap { day =>
      val n = if (day % 7 == 0) 2 else 1
      (1 to n).map(i => ("k", ts(day, i)))
    }.toDF("k", "ts")
    val m = Temporal.dowSeasonality(df, "k", "ts").collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(m(0L)._1 == 4L && m(0L)._2 == 2L)
    assert(math.abs(m(0L)._3 - 1.75) < 1e-12)
    assert((1L to 6L).forall(d => m(d)._1 == 2L && m(d)._2 == 2L &&
      math.abs(m(d)._3 - 0.875) < 1e-12))
  }

  test("ewmaDaily: hand-computed recurrence, repartition-invariant") {
    val df = Seq(("k", ts(1), 10.0), ("k", ts(2), 20.0), ("k", ts(3), 5.0),
      ("j", ts(5), 8.0)).toDF("k", "ts", "v")
    def run(parts: Int) = Temporal
      .ewmaDaily(df.repartition(parts), "k", "ts", "v", alpha = 0.3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val m = run(1)
    assert(m(("k", 1L)) == ((10.0, 10.0)), "e_1 = v_1")
    val e2 = 0.3 * 20.0 + 0.7 * 10.0
    assert(m(("k", 2L)) == ((20.0, e2)))
    assert(m(("k", 3L)) == ((5.0, 0.3 * 5.0 + 0.7 * e2)))
    assert(m(("j", 5L)) == ((8.0, 8.0)), "independent key restarts")
    assert(run(7) == m, "fold order is data-defined, not partition-defined")
  }

  test("holtLinear: level tracks, trend learns a ramp, forecast = l + b") {
    val df = Seq(("k", ts(1), 10.0), ("k", ts(2), 20.0), ("k", ts(3), 30.0))
      .toDF("k", "ts", "v")
    val m = graft.operators.Temporal
      .holtLinear(df, "k", "ts", "v", alpha = 0.5, beta = 0.3)
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(m(1L) == ((10.0, 0.0, 10.0)), "l_1 = v_1, b_1 = 0")
    val l2 = 0.5 * 20.0 + 0.5 * (10.0 + 0.0)
    val b2 = 0.3 * (l2 - 10.0) + 0.7 * 0.0
    assert(m(2L) == ((l2, b2, l2 + b2)))
    val l3 = 0.5 * 30.0 + 0.5 * (l2 + b2)
    val b3 = 0.3 * (l3 - l2) + 0.7 * b2
    assert(m(3L) == ((l3, b3, l3 + b3)), s"got ${m(3L)}")
  }

  test("rollingExtremes: full-history gate, strict new-high detection") {
    // key with 5 days, win=3: only days 4 and 5 emit; day 4 value 9
    // beats max(1,2,3)=3; day 5 value 2 sits inside [2,9]... prior
    // window for day 5 is days 2,3,4 -> [2,9], v=2 is not < lo (strict)
    val df = Seq(("k", ts(1), 1.0), ("k", ts(2), 2.0), ("k", ts(3), 3.0),
      ("k", ts(4), 9.0), ("k", ts(5), 2.0)).toDF("k", "ts", "v")
    val m = graft.operators.Temporal
      .rollingExtremes(df, "k", "ts", "v", win = 3)
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(3), r.getDouble(4), r.getBoolean(5), r.getBoolean(6)))
      .toMap
    assert(m.keySet == Set(4L, 5L), s"first 3 days gated: ${m.keySet}")
    assert(m(4L) == ((1.0, 3.0, true, false)))
    assert(m(5L) == ((2.0, 9.0, false, false)), "boundary value is not new")
  }

  test("hillTailIndex: exact Pareto tail recovers its exponent") {
    // x_(i) = (k+1-i+1)^(-1/a) scaled: use v_i = C / i^(1/a) with a=2 ->
    // hill over top-k vs ref x_(k+1) equals (1/k) sum ln((x_i/x_ref)) =
    // (1/a)*(1/k) sum ln((k+1)/i); just assert against the directly
    // computed expectation on the fixture (micro-quantized like the op).
    val a = 2.0
    val k = 10
    val rows = (1 to (k + 1)).map(i =>
      ("g", math.round(1e6 / math.pow(i, 1.0 / a)), i.toLong))
    val df = rows.toDF("g", "v", "id")
    val got = graft.operators.Stats.hillTailIndex(df, "g", "v", "id", k)
      .collect().head
    val xref = rows(k)._2.toDouble
    val mu = (0 until k).map(i =>
      math.round(math.log(rows(i)._2 / xref) * 1e6)).sum
    val hill = BigDecimal(mu.toDouble / (k * 1e6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getDouble(2) == hill, s"got ${got.getDouble(2)}, want $hill")
    assert(math.abs(got.getDouble(3) - a) < 0.3,
      s"alpha approximates 2 up to the known small-k bias: ${got.getDouble(3)}")
    // under-k groups are dropped
    assert(graft.operators.Stats.hillTailIndex(
      df.where($"id" <= 5), "g", "v", "id", k).count() == 0)
  }

  test("seasonalResiduals: constant series is all-zero; a spike flags") {
    // pure constant series: trend = count, dow effect 0 -> residual 0
    val flat = (1 to 21).flatMap(d => (0 until 2).map(i =>
      ("t", ts(d.toLong, i.toLong)))).toDF("event_type", "ts")
    val quiet = graft.operators.Temporal
      .seasonalResiduals(flat, "event_type", "ts", madK = 3.0)
      .collect().map(r => (r.getDouble(4), r.getBoolean(5)))
    assert(quiet.length == 15, "centered-7 gate trims 3+3 days")
    assert(quiet.forall(q => q._1 == 0.0 && !q._2), s"flat is quiet: ${quiet.toSeq}")
    // a spike day: flagged, and carries the max |residual| — neighbors
    // legitimately pick up small residuals (the spike lifts their trend
    // window and its dow mean), which is why the MAD gate exists
    val ev = (1 to 21).flatMap { d =>
      val n = if (d == 11) 9 else 2
      (0 until n).map(i => ("t", ts(d.toLong, i.toLong)))
    }.toDF("event_type", "ts")
    val rows = graft.operators.Temporal
      .seasonalResiduals(ev, "event_type", "ts", madK = 3.0)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getDouble(4), r.getBoolean(5))).toMap
    val spike = rows(11L)
    assert(spike._1 == 9L && spike._3, s"spike must flag: $spike")
    assert(rows.values.map(v => math.abs(v._2)).max == math.abs(spike._2),
      "spike residual dominates")
    // near-flat interior days stay inside the 3-MAD band
    assert(Seq(8L, 9L, 12L, 13L).forall(d => !rows(d)._3),
      s"half-count wobble must not flag: $rows")
  }

  test("newVsReturning: first day counts as new, revisits as returning") {
    val ev = Seq((1L, ts(1)), (2L, ts(1)), (1L, ts(2)), (3L, ts(2)),
      (1L, ts(2, 60))) // same-day duplicate must not double-count
      .toDF("user_id", "ts")
    val m = graft.operators.Temporal.newVsReturning(ev, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(m(1L) == ((2L, 2L, 0L, 1.0)))
    assert(m(2L) == ((2L, 1L, 1L, 0.5)), s"user 1 returns on day 2: $m")
  }

  test("attribution: window clipping, tie-breaks, micro-exact linear split") {
    import org.apache.spark.sql.functions.{col, concat_ws, lit}
    // purchase at t=100; touches at 10 (chA), 20 (chB), 30 (chA);
    // a touch at t=300 (after) and one at t=1 with tiny lookback excluded
    def row(id: Long, sec: Long, ty: String, ch: String) =
      (id, ts(0, sec), 7L, ty, ch)
    val ev = Seq(row(1, 10, "view", "A"), row(2, 20, "click", "B"),
      row(3, 30, "view", "A"), row(4, 100, "purchase", "-"),
      row(5, 300, "click", "B"))
      .toDF("event_id", "ts", "user_id", "event_type", "channel")
    val got = graft.operators.Temporal.attribution(ev, "user_id", "ts",
        "event_id", "event_type", channelCol = col("channel"),
        convType = "purchase", touchTypes = Seq("view", "click"),
        lookbackSec = 1000L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(got(("A", "last")) == ((1.0, 2L)), "latest touch is t=30 chA")
    assert(got(("B", "last")) == ((0.0, 1L)))
    assert(got(("A", "first")) == ((1.0, 2L)), "earliest is t=10 chA")
    // n=3: round(1e6/3)=333333 per touch, remainder 333334 to the LAST
    // touch (t=30, chA) — credit sums to exactly 1.0 (ADVICE r10)
    assert(got(("A", "linear")) == ((0.666667, 2L)),
      "round(1e6/3) + remainder micro-units")
    assert(got(("B", "linear")) == ((0.333333, 1L)))
    assert(got(("A", "linear"))._1 + got(("B", "linear"))._1 == 1.0,
      "linear credit conserves exactly")
    // shrink the lookback to 50s: only t=100-50..100 remains -> nothing
    // but... t=30 is 70s before, excluded; no touches -> empty result
    assert(graft.operators.Temporal.attribution(ev, "user_id", "ts",
      "event_id", "event_type", col("channel"), "purchase",
      Seq("view", "click"), lookbackSec = 50L).count() == 0)
  }

  test("seasonal error: q260 ratio detects a pure weekly rhythm") {
    // 28 days, counts 1,1,1,1,1,1,8 repeating: lag-7 error is 0,
    // lag-1 error is positive -> ratio 0.
    val ev = (0 until 28).flatMap { d =>
      val n = if (d % 7 == 6) 8 else 1
      (0 until n).map(i => ("t", ts(d.toLong + 1, i.toLong)))
    }.toDF("event_type", "ts")
    // same plan as q260, applied to the fixture instead of the table dir
    import org.apache.spark.sql.expressions.Window
    val daily = ev.groupBy(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("bigint").as("day_idx"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
    val r = daily.withColumn("__l1", lag(col("n"), 1).over(w))
      .withColumn("__l7", lag(col("n"), 7).over(w))
      .groupBy(col("event_type"))
      .agg((sum(abs(col("n") - col("__l1"))).cast("double") /
        count(col("__l1"))).as("mae1"),
        (sum(abs(col("n") - col("__l7"))).cast("double") /
          count(col("__l7"))).as("mae7"))
      .collect().head
    assert(r.getDouble(2) == 0.0, "seasonal naive is exact on the fixture")
    assert(r.getDouble(1) > 0.0)
  }
}
