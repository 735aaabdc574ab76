package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ModelEval, Stats, Survival}

/** Fixture semantics for the q245–q247 experimentation batch: a KM curve
  * with real censoring worked by hand, the pooled-SE z against a manual
  * computation (and its undefined edge), and ECE at both calibration
  * extremes. */
class ExperimentQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(day: Long): java.sql.Timestamp =
    new java.sql.Timestamp(day * 86400000L)

  test("kaplanMeier: censored users leave risk sets without being events") {
    // horizon day 10, gap 3 → churned iff last < 8
    // u1 span 0-2 (churn d=2), u2 0-4 (churn d=4), u3 5-9 (censored d=4),
    // u4 0-10 (censored d=10) → S: 0.75, 0.5, 0.5
    val df = Seq((1L, 0L), (1L, 2L), (2L, 0L), (2L, 4L), (3L, 5L), (3L, 9L),
      (4L, 0L), (4L, 10L)).map { case (u, d) => (u, ts(d)) }
      .toDF("user_id", "ts")
    val rows = Survival.kaplanMeier(df, "user_id", "ts", churnGapDays = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set(2L, 4L, 10L))
    assert(rows(2L) == ((4L, 1L, 0.75)))
    assert(rows(4L) == ((3L, 1L, 0.5)))   // censored u3 in risk, not events
    assert(rows(10L) == ((1L, 0L, 0.5)))  // curve flat through censoring
  }

  test("twoProportionZ: manual pooled-SE z, undefined when all convert") {
    val df = (Seq.fill(2)(("a", true)) ++ Seq.fill(2)(("a", false)) ++
      Seq.fill(1)(("b", true)) ++ Seq.fill(3)(("b", false)))
      .toDF("g", "conv")
    val r = Stats.twoProportionZ(df, "g", "a", "b", col("conv")).collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 2 &&
      r.getLong(2) == 4 && r.getLong(3) == 1)
    val expected = 0.25 / math.sqrt(0.375 * 0.625 * 0.5)
    assert(math.abs(r.getDouble(6) - expected) < 1e-12)
    val all = Seq(("a", true), ("b", true)).toDF("g", "conv")
    assert(Stats.twoProportionZ(all, "g", "a", "b", col("conv"))
      .collect()(0).isNullAt(6))
  }

  test("ece: 0 when score tracks the rate, large when inverted") {
    // scores 0 (all neg) and 9 (all pos), max 9: conf = acc in both bins
    val good = (Seq.fill(5)((0, false)) ++ Seq.fill(5)((9, true)))
      .toDF("s", "y")
    val g = ModelEval.ece(good, "s", col("y")).collect()(0)
    assert(math.abs(g.getDouble(2)) < 1e-12)
    // same scores, labels inverted on the high bin → that bin gaps by 1
    val bad = (Seq.fill(5)((0, false)) ++ Seq.fill(5)((9, false)))
      .toDF("s", "y")
    val b = ModelEval.ece(bad, "s", col("y")).collect()(0)
    assert(math.abs(b.getDouble(2) - 0.5) < 1e-12)
  }
}
