package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture semantics for the round-12 experimentation additions: per-
  * stratum CUPED recovering opposite-slope cohorts a pooled θ cannot,
  * and the Wald SPRT against hand-computed log-likelihood ratios with
  * both stopping decisions exercised. */
class RoundTwelveOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(day: Int, u: Long): java.sql.Timestamp =
    new java.sql.Timestamp(day * 86400000L + u * 1000L)

  test("cupedStratified: opposite-slope cohorts each earn full reduction; pooled theta can't") {
    // cohort A: post = 2*pre; cohort B: post = -3*pre — within each
    // stratum the covariate is perfect (var_cuped 0, reduction 1), while
    // the POOLED fit mixes the slopes and leaves variance behind
    val rows = (1L to 60L).map { i =>
      val pre = (i % 10).toDouble
      if (i % 2 == 0) ("A", pre, 2.0 * pre) else ("B", pre, -3.0 * pre)
    }
    val df = rows.toDF("cohort", "pre", "post")
    val r = graft.operators.Stats.cupedStratified(df, "cohort", "pre", "post")
      .collect().map(x => x.getString(0) ->
        (x.getDouble(2), x.getDouble(4), x.getDouble(5))).toMap
    assert(r("A") == ((2.0, 0.0, 1.0)), s"cohort A: ${r("A")}")
    assert(r("B") == ((-3.0, 0.0, 1.0)), s"cohort B: ${r("B")}")
    val pooled = graft.operators.Stats.cuped(df, "pre", "post").head()
    assert(pooled.getDouble(4) < 0.2,
      s"mixed slopes must leave the pooled reduction small: $pooled")
    // degenerate stratum: constant pre -> null theta, no reduction
    val flat = Seq(("C", 5.0, 1.0), ("C", 5.0, 3.0)).toDF("cohort", "pre", "post")
    val f = graft.operators.Stats.cupedStratified(flat, "cohort", "pre", "post").head()
    assert(f.isNullAt(2) && f.getDouble(4) == f.getDouble(3) &&
      f.getDouble(5) == 0.0, s"degenerate pre: $f")
  }

  test("heapsLaw: exact cumulative counts and the 2-point slope") {
    // bucket 0 (ids 0-4): "a b" x1 doc -> 2 tokens, 2 new types
    // bucket 1 (ids 5-9): "a b c d" -> 4 tokens, 2 new types
    val docs = Seq((0L, "a b"), (7L, "a b c d")).toDF("doc_id", "text")
    val r = graft.operators.CorpusStats.heapsLaw(docs, "doc_id", "text",
      buckets = 2).orderBy("bucket").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(3), x.getLong(4))).toSeq ==
      Seq((0L, 2L, 2L), (1L, 6L, 4L)), s"curve: ${r.mkString(";")}")
    // 2-point fit: slope of micro-quantized lns, replayed by hand
    def q(x: Double) = math.round(math.log(x) * 1e6)
    val beta = (2.0 * (q(2) * q(2) + q(6) * q(4)) -
        (q(2) + q(6)).toDouble * (q(2) + q(4))) /
      (2.0 * (q(2) * q(2) + q(6) * q(6)) -
        (q(2) + q(6)).toDouble * (q(2) + q(6)))
    assert(r.head.getDouble(5) == beta && beta > 0 && beta < 1,
      s"slope ${r.head.getDouble(5)} vs hand $beta")
  }

  test("jackknifeRatio: identical blocks collapse the SE to zero") {
    // three days, each contributing 6.00 over 3 events -> every
    // leave-one-out ratio is exactly 2.0
    val df = (1 to 3).flatMap(day => (1 to 3).map(i =>
      (day.toLong, 2.0, 1L))).toDF("b", "x", "y")
    val r = graft.operators.Inference.jackknifeRatio(df, col("b"),
      col("x"), col("y")).head()
    assert(r.getLong(0) == 3L && r.getDouble(1) == 2.0 &&
      r.getDouble(2) == 2.0 && r.getDouble(3) == 0.0,
      s"degenerate jackknife: $r")
  }

  test("cmhTest: per-stratum independence gives chi2 = 0 and OR_MH = 1") {
    // both strata perfectly balanced: a - E = 0 in each
    val rows =
      (1 to 10).map(i => ("s1", true, i <= 5)) ++
      (1 to 10).map(i => ("s1", false, i <= 5)) ++
      (1 to 4).map(i => ("s2", true, i <= 1)) ++
      (1 to 4).map(i => ("s2", false, i <= 1))
    val df = rows.toDF("s", "a", "o")
    val r = graft.operators.Inference.cmhTest(df, col("s"), col("a"),
      col("o")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L, s"strata/sum_a: $r")
    assert(r.getDouble(4) == 0.0, s"balanced tables: chi2 must be 0: $r")
    assert(r.getDouble(5) == 1.0, s"OR_MH must be exactly 1: $r")
  }

  test("ebBetaShrink: small samples shrink harder; uniform rates disable the prior") {
    // trials/successes per entity: A 100/10, B 4/2, C 100/30
    val df = Seq(("A", 100L, 10L), ("B", 4L, 2L), ("C", 100L, 30L))
      .toDF("id", "t", "k")
    val r = graft.operators.Inference.ebBetaShrink(df, "id", col("t"),
        col("k")).collect()
      .map(x => x.getString(0) -> (x.getDouble(3), x.getDouble(4))).toMap
    val pull = (id: String) => math.abs(r(id)._2 - r(id)._1)
    assert(pull("B") > pull("A") && pull("B") > pull("C"),
      s"the n=4 entity must move most: $r")
    assert(r("B")._2 < r("B")._1 && r("B")._2 > r("A")._1,
      "B shrinks toward the grand mean without crossing it")
    // uniform rates: zero between-entity variance -> shrunk == raw
    val flat = Seq(("X", 10L, 5L), ("Y", 20L, 10L)).toDF("id", "t", "k")
    val f = graft.operators.Inference.ebBetaShrink(flat, "id", col("t"),
      col("k")).collect()
    assert(f.forall(x => x.getDouble(4) == x.getDouble(3) && x.isNullAt(5)),
      s"degenerate prior must fall back to raw rates: ${f.mkString(";")}")
  }

  test("incremental agg maintenance: merged state equals the full recompute on real data") {
    val r = graft.queries.WarehouseQueries.queries("q311_incremental_agg")(
      spark, "/root/testdata/sf0.001").collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getBoolean(5)),
      s"base+delta must reproduce the full aggregate: ${r.mkString(";")}")
    assert(r.forall(x => x.getLong(1) == x.getLong(3) &&
      x.getDouble(2) == x.getDouble(4)))
  }

  test("rfmSegments: extreme users earn the extreme scores; cents exact") {
    def ev(u: Long, day: Int, kind: String, v: Double) =
      (u, ts(day, u), kind, v)
    // u1: recent + frequent + big spender; u2: stale single viewer;
    // u3/u4/u5: middles to give the quintile cutoffs support
    val rows =
      (1 to 10).map(i => ev(1L, 20 + (i % 5), "purchase", 10.0)) ++
      Seq(ev(2L, 1, "view", 0.0)) ++
      (1 to 4).map(i => ev(3L, 10, if (i % 2 == 0) "purchase" else "view", 1.0)) ++
      (1 to 3).map(i => ev(4L, 12, "view", 0.0)) ++
      (1 to 2).map(i => ev(5L, 15, "purchase", 2.5))
    val df = rows.toDF("user_id", "ts", "event_type", "value")
    val r = graft.operators.Temporal.rfmSegments(df, "user_id", "ts",
        when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0)))
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(3), x.getLong(4), x.getLong(6),
          x.getString(7))).toMap
    val (r1rec, r1cents, r1r, r1m, r1seg) = r(1L)
    assert(r1rec == 0L && r1cents == 10000L && r1r == 5L && r1m == 5L,
      s"the recent big spender maxes R and M: ${r(1L)}")
    assert(r1seg.length == 3 && r1seg == "555")
    assert(r(2L)._3 == 1L && r(2L)._4 == 1L,
      s"the stale non-spender bottoms out: ${r(2L)}")
  }

  test("srmCheck: balanced split passes with chi2 0; 90/10 fails with exactly 64") {
    val even = (1L to 100L).map(i => Tuple1(i)).toDF("id")
    val b = graft.operators.Stats.srmCheck(even, pmod(col("id"), lit(2))).head()
    assert(b.getLong(0) == 50L && b.getLong(1) == 50L &&
      b.getDouble(2) == 0.0 && !b.getBoolean(3), s"balanced: $b")
    // 90 zeros / 10 ones: chi2 = 2*(40^2)/50 = 64 exactly
    val skew = ((1L to 90L).map(_ => 0L) ++ (1L to 10L).map(_ => 1L))
      .map(Tuple1(_)).toDF("arm")
    val sRes = graft.operators.Stats.srmCheck(skew, col("arm")).head()
    assert(sRes.getDouble(2) == 64.0 && sRes.getBoolean(3),
      s"skewed split must trip the gate: $sRes")
  }

  test("cohortLtv: cumulative per-member value, cohorts independent") {
    val df = Seq(
      (1L, ts(1, 1), "purchase", 1.0),  // week 0 cohort, week 0
      (2L, ts(2, 2), "view", 0.0),      // week 0 cohort member, no spend
      (1L, ts(9, 1), "purchase", 3.0),  // week 0 cohort, week 1
      (3L, ts(9, 3), "purchase", 7.0))  // week 1 cohort, week 0
      .toDF("user_id", "ts", "event_type", "value")
    val r = graft.operators.Temporal.cohortLtv(df, "user_id", "ts",
        when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0)))
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getDouble(3))).toMap
    assert(r((0L, 0L)) == ((2L, 0.5)), s"week-0 cell: $r")
    assert(r((0L, 1L)) == ((2L, 2.0)), "cumulative (1+3)/2 members")
    assert(r((1L, 0L)) == ((1L, 7.0)), "the week-1 cohort is its own curve")
  }

  test("ctLangIdConfusion: disjoint trigram profiles classify perfectly") {
    // two synthetic "languages" with disjoint character inventories: the
    // rank profiles share no grams, so every doc's own language wins and
    // the confusion matrix is exactly diagonal
    val docs = (
      (1L to 5L).map(i => (i, "aab aab aba baa aab", "aa")) ++
      (6L to 10L).map(i => (i, "zzy zyz yzz zzy zyy", "zz")))
      .toDF("doc_id", "text", "lang")
    val r = graft.operators.MlOps.ctLangIdConfusion(docs, "doc_id",
        "text", "lang", k = 10)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    assert(r == Map(("aa", "aa") -> 5L, ("zz", "zz") -> 5L),
      s"diagonal confusion expected: $r")
  }

  test("markovRemovalAttribution: hand chain with exact removal effects") {
    // u1 view->purchase, u2 view->(null), u3/u4 click->purchase:
    // P = 1/2*1/2 + 1/2*1 = 3/4; remove view -> 1/2; remove click -> 1/4
    val ev = Seq(
      (1L, ts(1, 1), 1L, "view"), (1L, ts(2, 1), 2L, "purchase"),
      (2L, ts(1, 2), 3L, "view"),
      (3L, ts(1, 3), 4L, "click"), (3L, ts(2, 3), 5L, "purchase"),
      (4L, ts(1, 4), 6L, "click"), (4L, ts(2, 4), 7L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = graft.operators.Temporal.markovRemovalAttribution(ev,
        "user_id", "ts", "event_type", "event_id", "purchase", iters = 8)
      .collect().map(x => x.getString(0) ->
        (x.getDouble(1), x.getDouble(2), x.getDouble(3), x.getDouble(4)))
      .toMap
    assert(r.keySet == Set("view", "click"))
    assert(r("view") == ((0.75, 0.5, 0.25, 250000000.0 / 750000000.0)),
      s"view removal: ${r("view")}")
    assert(r("click") == ((0.75, 0.25, 0.5, 500000000.0 / 750000000.0)),
      s"click removal: ${r("click")}")
  }

  test("diffInDiff: planted +3 effect under exactly parallel trends") {
    // control follows v = d, treated v = d + 5 pre and d + 8 post:
    // parallel unit slopes, a clean +3 treatment effect
    val preDays = Seq(1L, 2L, 3L, 4L); val postDays = Seq(16L, 17L)
    val rows =
      preDays.map(dd => (false, false, dd, dd.toDouble)) ++
      postDays.map(dd => (false, true, dd, dd.toDouble)) ++
      preDays.map(dd => (true, false, dd, dd + 5.0)) ++
      postDays.map(dd => (true, true, dd, dd + 8.0))
    val df = rows.toDF("t", "p", "d", "v")
    val r = graft.operators.Stats.diffInDiff(df, col("t"), col("p"),
      col("d"), col("v")).head()
    assert(r.getDouble(1) == 7.5 && r.getDouble(3) == 24.5 &&
      r.getDouble(5) == 2.5 && r.getDouble(7) == 16.5,
      s"cell means: $r")
    assert(r.getDouble(8) == 3.0, s"DiD must recover the planted +3: $r")
    assert(r.getDouble(9) == 1.0 && r.getDouble(10) == 1.0 &&
      r.getDouble(11) == 0.0,
      s"exactly parallel pre-trends, zero gap: $r")
  }

  test("linearMmdDrift: identical groups give 0; orthogonal unit means give 2") {
    val same = Seq((0, Seq(1.0f, 0.5f)), (0, Seq(0.0f, 0.5f)),
      (1, Seq(1.0f, 0.5f)), (1, Seq(0.0f, 0.5f)))
      .toDF("label", "embedding")
    val s = graft.operators.Similarity.linearMmdDrift(same, "label",
      "embedding").head()
    assert(s.getDouble(4) == 0.0, s"identical distributions: $s")
    // mu_a = (1,0), mu_b = (0,1) -> ||diff||^2 = 2 exactly in micro units
    val ortho = Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f)))
      .toDF("label", "embedding")
    val o = graft.operators.Similarity.linearMmdDrift(ortho, "label",
      "embedding").head()
    assert(o.getDouble(4) == 2.0, s"orthogonal unit means: $o")
  }

  test("benfordByGroup: hand chi-square per group, absent digits still charged") {
    // group A: all 40 amounts lead with digit 1 (fails Benford hard);
    // group B: 9 amounts hitting each digit once (much closer)
    val a = (1 to 40).map(i => ("A", 10.0 + i * 0.01))
    val b = (1 to 9).map(dd => ("B", dd * 1.0))
    val r = graft.operators.Inference.benfordByGroup(
        (a ++ b).toDF("g", "v"), "g", col("v"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2), x.getBoolean(3))).toMap
    def hand(counts: Map[Int, Long]): Double = {
      val n = counts.values.sum.toDouble
      (1 to 9).map { dd =>
        val p = math.log10(1.0 + 1.0 / dd)
        val obs = counts.getOrElse(dd, 0L).toDouble
        math.round((obs - n * p) * (obs - n * p) / (n * p) * 1e6)
      }.sum / 1e6
    }
    val chiA = hand(Map(1 -> 40L))
    val chiB = hand((1 to 9).map(_ -> 1L).toMap)
    assert(r("A") == ((40L, chiA, true)),
      s"single-digit group must fail at 8-df alpha=.05: ${r("A")} vs $chiA")
    assert(r("B")._2 == chiB && !r("B")._3,
      s"uniform digits are non-Benford but under the gate: ${r("B")} vs $chiB")
  }

  test("sprt: hand-computed LLR, both stopping decisions, bit-exact constants") {
    // day 1: users 1,2,3 active, user 1 purchases -> n=3, k=1
    // day 2: users 1,2 active, both purchase     -> n=5, k=3 cumulative
    val ev = Seq(
      (1L, ts(1, 1), "purchase"), (2L, ts(1, 2), "view"),
      (3L, ts(1, 3), "view"),
      (1L, ts(2, 1), "purchase"), (2L, ts(2, 2), "purchase"))
      .toDF("user_id", "ts", "event_type")
    // p0=0.2 vs p1=0.8: c1 = ln 4, c2 = -ln 4 -> llr = (2k-n)*ln 4.
    // NOTE the (1.0 - p) forms: (1.0-0.8)/(1.0-0.2) is one ulp off
    // 0.2/0.8 in float, and the contract is the OPERATOR's exact fold
    val c1 = math.log(0.8 / 0.2)
    val c2 = math.log((1.0 - 0.8) / (1.0 - 0.2))
    def run(a: Double, b: Double) =
      graft.operators.Stats.sprt(ev, "user_id", "ts",
        col("event_type") === "purchase", p0 = 0.2, p1 = 0.8,
        alpha = a, beta = b).orderBy("day_idx").collect()
    val wide = run(0.05, 0.05)
    assert(wide.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((3L, 1L), (5L, 3L)), "cumulative trials/successes")
    assert(wide(0).getDouble(3) == 1.0 * c1 + 2.0 * c2 &&
      wide(1).getDouble(3) == 3.0 * c1 + 2.0 * c2,
      s"LLR must equal the hand fold exactly: ${wide.mkString(";")}")
    assert(wide.forall(_.getString(6) == "continue"),
      "ln 19 bounds are uncrossed by |llr| = ln 4")
    // tight bounds ln(0.6/0.4) = 0.405: day 1 accepts H0, day 2 rejects
    val tight = run(0.4, 0.4)
    assert(tight(0).getString(6) == "accept_h0" &&
      tight(1).getString(6) == "reject_h0",
      s"both stop decisions exercised: ${tight.mkString(";")}")
    assert(tight(0).getDouble(4) == math.log(0.6 / 0.4) &&
      tight(0).getDouble(5) == math.log(0.4 / 0.6),
      "Wald bounds are the driver-computed literals")
  }
}
