package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck invariants for the q251+ session operators — contracts that
  * must hold on ANY data: NDCG ∈ [0, 1] and 1.0 for a perfect ranking,
  * EWMA bounded by its series envelope, target encodings bounded by the
  * observed target range and monotone toward the global mean as m grows,
  * the reservoir returning exactly min(k, n) per group, and equi-depth
  * bins partitioning every row exactly once. */
class SessionPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(15).withWorkers(1)

  private def check(name: String, prop: Prop): Unit = {
    val r = SCTest.check(params, prop)
    assert(r.passed, s"$name: $r")
  }

  test("ndcg is in [0, 1]; all-relevant rankings score exactly 1") {
    check("ndcg", Prop.forAll(
      Gen.listOfN(8, Gen.oneOf(0L, 1L))) { rels =>
      val ranked = rels.zipWithIndex.map { case (r, i) =>
        (1L, (i + 1).toLong, r)
      }.toDF("q", "rnk", "rel")
      val v = graft.operators.ModelEval.ndcgAtK(ranked, "q", "rnk", "rel")
        .collect()(0).getDouble(2)
      v >= 0.0 && v <= 1.0 &&
        (rels.exists(_ == 0L) || v == 1.0)
    })
  }

  test("ewma stays inside the series min/max envelope") {
    check("ewma", Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(0, 1000))) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) =>
        ("k", new java.sql.Timestamp((i + 1) * 86400000L), v.toDouble)
      }.toDF("k", "ts", "v")
      val rows = graft.operators.Temporal
        .ewmaDaily(df, "k", "ts", "v", alpha = 0.3)
        .collect().map(_.getDouble(3))
      rows.forall(e => e >= vs.min - 1e-9 && e <= vs.max + 1e-9)
    })
  }

  test("target encoding is bounded by the target range; m -> inf recovers the global mean") {
    check("enc", Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.choose(0, 500)))) { rows =>
      val df = rows.map { case (c, y) => (c, y.toDouble) }.toDF("c", "y")
      val lo = rows.map(_._2).min.toDouble
      val hi = rows.map(_._2).max.toDouble
      val gmean = rows.map(_._2.toDouble).sum / rows.size
      val enc = graft.operators.Features.targetEncode(df, "c", "y", m = 10.0)
        .collect().map(_.getDouble(3))
      val encBig = graft.operators.Features
        .targetEncode(df, "c", "y", m = 1e9)
        .collect().map(_.getDouble(3))
      enc.forall(e => e >= lo - 1e-9 && e <= hi + 1e-9) &&
        encBig.forall(e => math.abs(e - gmean) < 1.0)
    })
  }

  test("weighted reservoir returns exactly min(k, group size) rows") {
    check("reservoir", Prop.forAll(
      Gen.choose(1, 12), Gen.choose(1, 6)) { (n, k) =>
      val df = (1 to n).map(i => ("g", i.toLong, (i * 7 + 1).toLong))
        .toDF("grp", "id", "w")
      graft.operators.Scale
        .weightedReservoir(df, "grp", "id", col("w"), k)
        .count() == math.min(n, k)
    })
  }

  test("holt with beta = 0 degenerates to the EWMA recurrence exactly") {
    check("holt-ewma", Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(0, 500))) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) =>
        ("k", new java.sql.Timestamp((i + 1) * 86400000L), v.toDouble)
      }.toDF("k", "ts", "v")
      val ewma = graft.operators.Temporal
        .ewmaDaily(df, "k", "ts", "v", alpha = 0.4)
        .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
      val holt = graft.operators.Temporal
        .holtLinear(df, "k", "ts", "v", alpha = 0.4, beta = 0.0)
        .collect().map(r => r.getLong(1) ->
          (r.getDouble(3), r.getDouble(4))).toMap
      holt.forall { case (d, (level, trend)) =>
        trend == 0.0 && level == ewma(d)
      }
    })
  }

  test("attribution credit conserves: each model sums to the conversions") {
    check("attribution", Prop.forAll(
      Gen.listOfN(10, Gen.zip(Gen.choose(1L, 3L), Gen.choose(1, 500),
        Gen.oneOf("view", "click", "purchase")))) { evs =>
      val df = evs.zipWithIndex.map { case ((u, sec, ty), i) =>
        (i.toLong, new java.sql.Timestamp(sec * 1000L), u, ty,
          s"ch${i % 2}")
      }.toDF("event_id", "ts", "user_id", "event_type", "channel")
      val out = graft.operators.Temporal.attribution(df, "user_id", "ts",
        "event_id", "event_type",
        org.apache.spark.sql.functions.col("channel"),
        "purchase", Seq("view", "click"), lookbackSec = 1000L)
        .collect().map(r => (r.getString(1), r.getDouble(2)))
      val byModel = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      // conversions with >= 1 touch in window; every model must credit
      // each such conversion exactly 1.0 (linear: up to micro rounding)
      byModel.isEmpty || {
        val n = byModel("last")
        math.abs(byModel("first") - n) < 1e-9 &&
          math.abs(byModel("linear") - n) < 1e-4 * math.max(1.0, n)
      }
    })
  }

  test("equi-depth bins partition the rows exactly") {
    check("bins", Prop.forAll(
      Gen.listOfN(20, Gen.choose(0, 100))) { vs =>
      val df = vs.map(_.toDouble).toDF("v")
      val rows = graft.operators.Features.equidepthProfile(df, "v", 4)
        .collect()
      rows.map(_.getLong(1)).sum == vs.size &&
        rows.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= 4)
    })
  }
}
