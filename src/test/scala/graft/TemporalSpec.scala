package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal

class TemporalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: latest prior wins, equal-ts matches, no prior -> null") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2025-01-01 10:00:00")),
      (2L, 10L, ts("2025-01-01 12:00:00")),
      (3L, 20L, ts("2025-01-01 09:00:00"))
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2025-01-01 09:30:00"), 1.0),
      (10L, ts("2025-01-01 11:00:00"), 2.0),
      (10L, ts("2025-01-01 12:00:00"), 3.0), // equal ts with left id=2
      (20L, ts("2025-01-01 09:30:00"), 9.0)  // after left id=3
    ).toDF("k", "t", "v")
    val out = Temporal.asofJoin(left, right, "k", "t", Seq("v"))
      .select(col("id"), col("__match.v"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(1L).contains(1.0))  // 09:30 is the latest <= 10:00
    assert(out(2L).contains(3.0))  // equal ts matches (>= semantics)
    assert(out(3L).isEmpty)        // nothing at or before 09:00
  }

  test("asof forward: earliest at-or-after wins, equal-ts matches, none after -> null") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2025-01-01 10:00:00")), // next right at 11:00
      (2L, 10L, ts("2025-01-01 12:00:00")), // equal-ts right matches
      (3L, 10L, ts("2025-01-01 13:00:00")), // nothing after -> null
      (4L, 20L, ts("2025-01-01 09:00:00"))  // 09:30 wins over later rows
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2025-01-01 09:30:00"), 1.0),
      (10L, ts("2025-01-01 11:00:00"), 2.0),
      (10L, ts("2025-01-01 12:00:00"), 3.0),
      (20L, ts("2025-01-01 09:30:00"), 9.0),
      (20L, ts("2025-01-01 10:30:00"), 8.0)
    ).toDF("k", "t", "v")
    val out = Temporal.asofJoinDirected(left, right, "k", "t", Seq("v"), forward = true)
      .select(col("id"), col("__match.v"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(1L -> Some(2.0), 2L -> Some(3.0), 3L -> None, 4L -> Some(9.0)))
  }

  test("range join pairs: each qualifying pair appears exactly once with correct gap") {
    import spark.implicits._
    val df = Seq(
      (1L, 5L, ts("2025-01-01 10:00:00")),
      (2L, 5L, ts("2025-01-01 10:20:00")), // 1200 s after id 1
      (3L, 5L, ts("2025-01-01 10:40:00")), // 1200 s after id 2, 2400 after id 1
      (4L, 6L, ts("2025-01-01 10:05:00"))  // other key
    ).toDF("id", "k", "t")
    val pairs = Temporal.rangeJoinPairs(df, "k", "t", "id", maxGapSec = 1800L)
      .select("a_id", "b_id", "gap_sec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 1200L), (2L, 3L, 1200L)),
      s"expected exactly the two <=30min pairs, got $pairs")
  }

  test("range join: bucket-boundary pairs are found exactly once (no dup, no miss)") {
    import spark.implicits._
    // gap exactly == maxGap and gap crossing a bucket boundary
    val df = Seq(
      (1L, 1L, ts("2025-01-01 00:29:50")), // bucket 0 (gap=1800 buckets: 1790/1800=0)
      (2L, 1L, ts("2025-01-01 00:30:10")), // bucket 1, 20 s later
      (3L, 1L, ts("2025-01-01 00:59:50"))  // 1800 s after id 1 exactly
    ).toDF("id", "k", "t")
    val pairs = Temporal.rangeJoinPairs(df, "k", "t", "id", maxGapSec = 1800L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.distinct.length, "no duplicate pairs")
    assert(pairs.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("interval join maxLenSec: pathological interval dropped, fan-out bounded, others intact") {
    import spark.implicits._
    val a = Seq((1L, 100L, 200L), (2L, 0L, 1000000L)) // id 2 is pathological
      .toDF("a_id", "s", "e")
    val b = Seq((10L, 150L, 250L)).toDF("b_id", "s", "e")
    val capped = Temporal.intervalOverlapJoin(a, b, "a_id", "b_id", "s", "e",
        bucketSec = 100L, maxLenSec = Some(500L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the normal pair survives with its exact overlap; the pathological
    // interval (which also overlaps b) is dropped by the cap
    assert(capped.sameElements(Array((1L, 10L, 50L))))
    // fan-out contract: with the cap, no interval explodes to more than
    // maxLenSec/bucketSec + 1 bucket rows
    val fanOut = a.where(col("e") - col("s") <= 500L)
      .select(expr("CAST(floor(e / 100) - floor(s / 100) + 1 AS BIGINT)").as("nb"))
      .collect().map(_.getLong(0))
    assert(fanOut.forall(_ <= 500L / 100L + 1))
    // and without the cap the pathological pair IS emitted (cap is opt-in)
    val uncapped = Temporal.intervalOverlapJoin(a, b, "a_id", "b_id", "s", "e", 100L)
      .collect()
    assert(uncapped.length == 2)
  }

  test("asof join with empty right side yields all-null matches, not an error") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2025-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq.empty[(Long, Timestamp, Double)].toDF("k", "t", "v")
    val out = Temporal.asofJoin(left, right, "k", "t", Seq("v")).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("__match")))
  }

  test("funnelSteps: greedy-earliest chain, strict after, per-step timeout, report shape") {
    import spark.implicits._
    val ev = Seq(
      // user 1: clean A→B→C inside the 1h windows
      (1L, ts("2025-01-01 10:00:00"), "A"), (1L, ts("2025-01-01 10:30:00"), "B"),
      (1L, ts("2025-01-01 11:00:00"), "C"),
      // user 2: B BEFORE A (strictly-after excludes it), later B ok, C too late after B
      (2L, ts("2025-01-01 09:00:00"), "B"), (2L, ts("2025-01-01 10:00:00"), "A"),
      (2L, ts("2025-01-01 10:20:00"), "B"), (2L, ts("2025-01-01 12:00:00"), "C"),
      // user 3: greedy trap — earliest B at 10:10 has no C within 1h, the
      // 10:50 B would have caught the 11:30 C; greedy semantics still count
      // user 3 at step B but NOT at step C (documented, deterministic)
      (3L, ts("2025-01-01 10:00:00"), "A"), (3L, ts("2025-01-01 10:10:00"), "B"),
      (3L, ts("2025-01-01 10:50:00"), "B"), (3L, ts("2025-01-01 11:30:00"), "C"),
      // user 4: never signs up (no A) — not in the funnel at all
      (4L, ts("2025-01-01 10:00:00"), "B"), (4L, ts("2025-01-01 10:30:00"), "C"),
      // user 5: B exactly at A (not strictly after) then B at the +1h bound
      // (inclusive) — reaches B via the bound event
      (5L, ts("2025-01-01 10:00:00"), "A"), (5L, ts("2025-01-01 10:00:00"), "B"),
      (5L, ts("2025-01-01 11:00:00"), "B")
    ).toDF("user_id", "t", "typ")
    val got = Temporal.funnelSteps(ev, "user_id", "t", "typ",
        Seq("A", "B", "C"), stepWithinSec = 3600L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    // A: users 1,2,3,5; B: 1 (10:30), 2 (10:20), 3 (10:10 greedy), 5 (11:00 bound)
    // C: only user 1 (u2's C is 1h40m after B; u3 greedy-missed; u5 has no C)
    assert(got.toSeq == Seq((0, "A", 4L), (1, "B", 4L), (2, "C", 1L)))
  }

  test("transitionMatrix: per-user successor counts, probabilities, id tie-break") {
    import spark.implicits._
    // u1: click -> view -> click; u2: view -> view; u3: two events at the
    // SAME ts — event_id order decides the successor (a -> b, never b -> a)
    val ev = Seq(
      (1L, ts("2025-01-01 10:00:00"), 1L, "click"),
      (2L, ts("2025-01-01 10:01:00"), 1L, "view"),
      (3L, ts("2025-01-01 10:02:00"), 1L, "click"),
      (4L, ts("2025-01-01 10:00:00"), 2L, "view"),
      (5L, ts("2025-01-01 10:05:00"), 2L, "view"),
      (6L, ts("2025-01-01 09:00:00"), 3L, "a"),
      (7L, ts("2025-01-01 09:00:00"), 3L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.operators.Temporal
      .transitionMatrix(ev, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      ("click", "view") -> ((1L, 1.0)),
      ("view", "click") -> ((1L, 0.5)),
      ("view", "view") -> ((1L, 0.5)),
      ("a", "b") -> ((1L, 1.0))), s"got $got")
  }

  test("bucketBurst: z against own baseline, tie by bucket, degenerate keys dropped") {
    import spark.implicits._
    // e: hourly counts 1/1/10 -> mean 4, varp 18; z(h3) = 6/sqrt(18),
    // z(h1) = z(h2) = -3/sqrt(18) (tie -> earlier bucket ranks first).
    // f: one bucket (no variance baseline); g: constant counts (varp 0) —
    // both must be absent, not emitted as infinities
    val rows =
      Seq.fill(1)(("e", "2025-01-01 10:00:10")) ++
      Seq.fill(1)(("e", "2025-01-01 11:00:10")) ++
      (1 to 10).map(i => ("e", f"2025-01-01 12:00:$i%02d")) ++
      Seq(("f", "2025-01-01 10:00:00")) ++
      Seq(("g", "2025-01-01 10:00:00"), ("g", "2025-01-01 11:00:00"))
    val ev = rows.map { case (t, s) => (t, ts(s)) }.toDF("event_type", "ts")
    val got = graft.operators.Temporal
      .bucketBurst(ev, "event_type", "ts", "hour", topK = 2)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3), r.getLong(4))).toSet
    def z(v: Double) = BigDecimal(v / math.sqrt(18.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Set(
      ("e", "2025-01-01 12:00:00.0", 10L, z(6.0), 1L),
      ("e", "2025-01-01 10:00:00.0", 1L, z(-3.0), 2L)), s"got $got")
  }

  test("adjacentDrift: hand-computed JS for identical, disjoint-ish and equal days") {
    import spark.implicits._
    // day1 A:2 B:2 (uniform); day2 A:4 only (B vanishes); day3 A:1 B:1.
    val rows =
      Seq(("A", "2025-03-01 01:00:00"), ("A", "2025-03-01 02:00:00"),
        ("B", "2025-03-01 03:00:00"), ("B", "2025-03-01 04:00:00")) ++
      (1 to 4).map(i => ("A", s"2025-03-02 0$i:00:00")) ++
      Seq(("A", "2025-03-03 01:00:00"), ("B", "2025-03-03 02:00:00"))
    val ev = rows.map { case (t, s) => (t, ts(s)) }.toDF("event_type", "ts")
    val got = Temporal.adjacentDrift(ev, "event_type", "ts", "day")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
      .toSet
    // same micro-unit quantization as the operator: per-category
    // contribution rounded to 0.5e-6 units, summed, /1e6
    def contrib(ca: Long, ta: Long, cb: Long, tb: Long): Long = {
      val pa = ca.toDouble / ta; val pb = cb.toDouble / tb
      val m = (pa + pb) / 2
      val v = (if (ca > 0) pa * math.log(pa / m) else 0.0) +
        (if (cb > 0) pb * math.log(pb / m) else 0.0)
      BigDecimal(v * 5e5).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    def js(cs: Seq[(Long, Long, Long, Long)]): Double =
      BigDecimal(cs.map((contrib _).tupled).sum.toDouble / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d2 = js(Seq((2L, 4L, 4L, 4L), (2L, 4L, 0L, 4L))) // uniform -> all-A
    val d3 = js(Seq((4L, 4L, 1L, 2L), (0L, 4L, 1L, 2L))) // all-A -> uniform
    assert(got == Set(
      ("2025-03-02 00:00:00.0", 1L, d2),
      ("2025-03-03 00:00:00.0", 1L, d3)), s"got $got, expected d2=$d2 d3=$d3")
    assert(d2 > 0.0 && d3 > 0.0)
    // identical distributions drift by exactly zero
    val same = Seq(("A", "2025-03-01 01:00:00"), ("B", "2025-03-01 02:00:00"),
      ("A", "2025-03-02 01:00:00"), ("B", "2025-03-02 02:00:00"))
      .map { case (t, s) => (t, ts(s)) }.toDF("event_type", "ts")
    val zero = Temporal.adjacentDrift(same, "event_type", "ts", "day")
      .collect().map(r => r.getDouble(2))
    assert(zero.toSeq == Seq(0.0))
  }

  test("cohortRetention: offsets from first-activity week, rates against cohort size") {
    import spark.implicits._
    // W1 = week of 2025-01-06 (Mon), W2 = 2025-01-13
    val ev = Seq(
      (1L, "2025-01-07 10:00:00"), (1L, "2025-01-14 10:00:00"),
      (2L, "2025-01-08 09:00:00"),
      (3L, "2025-01-15 09:00:00"))
      .map { case (u, s) => (u, ts(s)) }.toDF("user_id", "ts")
    val got = Temporal.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set(
      ("2025-01-06 00:00:00.0", 0L, 2L, 1.0),
      ("2025-01-06 00:00:00.0", 1L, 1L, 0.5),
      ("2025-01-13 00:00:00.0", 0L, 1L, 1.0)), s"got $got")
  }

  test("rollingActive: trailing window via bounded expansion, ghost days dropped") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2025-03-01 10:00:00"), (2L, "2025-03-02 11:00:00"),
      (1L, "2025-03-04 12:00:00"),
      (1L, "2025-03-01 15:00:00")) // same user+day: must not double count
      .map { case (u, s) => (u, ts(s)) }.toDF("user_id", "ts")
    val got = Temporal.rollingActive(ev, "user_id", "ts", windowDays = 3)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
    // Mar 1: {u1}; Mar 2: {u1 (from Mar 1), u2}; Mar 4: {u2 (Mar 2), u1};
    // Mar 3 has no observed activity -> absent, not a ghost row
    assert(got == Set(
      ("2025-03-01 00:00:00.0", 1L),
      ("2025-03-02 00:00:00.0", 2L),
      ("2025-03-04 00:00:00.0", 2L)), s"got $got")
  }

  test("approx_count_distinct sketch stays within 5% of exact") {
    val ev = Graft.table(spark, "/root/testdata/sf0.001", "events")
    val approx = ev.agg(approx_count_distinct(col("user_id"))).collect().head.getLong(0)
    val exact = ev.agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }
}
