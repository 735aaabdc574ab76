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
