package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MlOps

class MlOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- naive Bayes ----

  test("naiveBayesConfusion: separable two-class corpus classifies cleanly") {
    // Class a docs are all "x", class b docs all "y"; train = even ids.
    val docs = Seq(
      (0L, "x x x", "a"), (2L, "x x", "a"), (1L, "x x", "a"), (3L, "x", "a"),
      (4L, "y y y", "b"), (6L, "y y", "b"), (5L, "y y", "b"), (7L, "y", "b")
    ).toDF("doc_id", "text", "cls")
    val m = MlOps.naiveBayesConfusion(docs, "doc_id", "text", "cls")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("a", "a") -> 2L, ("b", "b") -> 2L))
  }

  test("naiveBayesConfusion: test doc with only OOV tokens falls to prior") {
    // Train: 2 'a' docs, 1 'b' doc. Test doc 1 has no in-vocab tokens ->
    // scored on priors alone -> predicted 'a' (larger prior).
    val docs = Seq(
      (0L, "x x", "a"), (2L, "x", "a"), (4L, "y", "b"),
      (1L, "zzz qqq", "b")
    ).toDF("doc_id", "text", "cls")
    val m = MlOps.naiveBayesConfusion(docs, "doc_id", "text", "cls")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("b", "a") -> 1L))
  }

  // ---- covariance + PCA ----

  test("embeddingCovariance: hand-computed 2-dim case") {
    // vectors (1,2), (3,6), (5,10): y = 2x exactly.
    // mean x = 3, var x = (4+0+4)/3 = 8/3; cov xy = 16/3; var y = 32/3.
    val embs = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 6.0f)), (3L, Seq(5.0f, 10.0f))
    ).toDF("vec_id", "embedding")
    val m = MlOps.embeddingCovariance(embs, "embedding", 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(math.abs(m((0, 0)) - 8.0 / 3) < 1e-6)
    assert(math.abs(m((0, 1)) - 16.0 / 3) < 1e-6)
    assert(math.abs(m((1, 1)) - 32.0 / 3) < 1e-6)
    assert(m.size == 3)
  }

  test("pcaTopComponent: aligns with the dominant direction, sign-fixed") {
    // All variance along (1,2)/sqrt(5); noise-free -> eigvec exactly that.
    val embs = (1 to 20).map(i =>
      (i.toLong, Seq((i - 10.5).toFloat, (2 * (i - 10.5)).toFloat)))
      .toDF("vec_id", "embedding")
    val v = MlOps.pcaTopComponent(embs, "embedding", 2)
    val expected = Array(1.0 / math.sqrt(5), 2.0 / math.sqrt(5))
    assert(math.abs(v(0) - expected(0)) < 1e-6)
    assert(math.abs(v(1) - expected(1)) < 1e-6)
    // sign convention: largest-|component| coordinate positive
    assert(v(1) > 0)
  }

  test("pcaProjection: top-|projection| picks the extreme vectors") {
    val embs = (1 to 20).map(i =>
      (i.toLong, Seq((i - 10.5).toFloat, (2 * (i - 10.5)).toFloat)))
      .toDF("vec_id", "embedding")
    val top = MlOps.pcaProjection(embs, "vec_id", "embedding", 2, k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top == Set(1L, 20L)) // the two endpoints of the line
  }

  test("effectiveRank: rank-1 covariance gives eff_rank exactly 1; isotropic gives d") {
    // y = 2x exactly -> covariance is rank 1 -> (Σλ)²/Σλ² = 1.
    val embs = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 6.0f)), (3L, Seq(5.0f, 10.0f))
    ).toDF("vec_id", "embedding")
    val r = MlOps.effectiveRank(embs, "embedding", 2).collect().head
    // trace = 8/3 + 32/3 = 40/3; frob = (8/3)² + 2(16/3)² + (32/3)² = 1600/9
    assert(math.abs(r.getAs[Double]("trace") - 40.0 / 3) < 1e-6)
    assert(math.abs(r.getAs[Double]("frob") - 1600.0 / 9) < 1e-5)
    assert(math.abs(r.getAs[Double]("eff_rank") - 1.0) < 1e-9)
    // two orthogonal equal-variance directions -> eff_rank = 2
    val iso = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val r2 = MlOps.effectiveRank(iso, "embedding", 2).collect().head
    assert(math.abs(r2.getAs[Double]("eff_rank") - 2.0) < 1e-9)
  }

  // ---- rank normalization ----

  test("rankNormalize: percent_rank and decile, ties share ranks") {
    val df = Seq((1L, "s", 10L), (2L, "s", 20L), (3L, "s", 20L),
      (4L, "s", 30L), (5L, "s", 40L)).toDF("id", "k", "v")
    val m = MlOps.rankNormalize(df, "k", "v", "id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getInt(4))).toMap
    assert(m(1L) == ((0.0, 0)))
    assert(m(2L) == ((0.25, 2)) && m(3L) == ((0.25, 2))) // tied
    assert(m(4L) == ((0.75, 7)))
    assert(m(5L) == ((1.0, 9))) // capped at decile 9
  }

  // ---- RBO ----

  test("rboWeights: closed form matches the textbook sum for k=3") {
    // L = lcm(1,2,3) = 6; weights (L/d)*2^(k-d): d=1 -> 24, d=2 -> 6, d=3 -> 2.
    // W(1) = 32, W(2) = 8, W(3) = 2; denom = 6 * 8 = 48.
    val (ws, denom) = MlOps.rboWeights(3)
    assert(ws == Seq((1L, 32L), (2L, 8L), (3L, 2L)))
    assert(denom == 48L)
  }

  test("rboRankStability: identical rankings give RBO = 1 - p^k") {
    // Same score column twice -> A(d) = d for all d; truncated RBO with
    // p=1/2 at depth k is 1 - 2^-k (the geometric tail).
    val df = (1 to 8).map(i => ("g", i.toLong, (100 - i).toLong, (100 - i).toLong))
      .toDF("k", "id", "s1", "s2")
    val r = MlOps.rboRankStability(df, "k", "s1", "s2", "id", 4)
      .collect().head.getDouble(1)
    assert(math.abs(r - (1.0 - math.pow(0.5, 4))) < 1e-12)
  }

  test("rboRankStability: disjoint top-k gives RBO = 0") {
    // s1 ranks ids 1..4 on top, s2 ranks 5..8 on top (k=4, 8 items).
    val df = (1 to 8).map { i =>
      ("g", i.toLong, (100 - i).toLong, (100 + i).toLong)
    }.toDF("k", "id", "s1", "s2")
    val out = MlOps.rboRankStability(df, "k", "s1", "s2", "id", 4).collect()
    assert(out.isEmpty || out.head.getDouble(1) == 0.0)
  }

  test("rboRankStability: hand-computed partial overlap") {
    // k=2, 3 items. s1 top-2 = [1, 2]; s2 top-2 = [2, 3].
    // Only item 2 in both: m = max(2, 1) = 2 -> W(2) = L/2 * 2^0 = 1 (L=2).
    // denom = L * 2^k = 8 -> RBO = 1/8.
    val df = Seq(("g", 1L, 30L, 10L), ("g", 2L, 20L, 30L), ("g", 3L, 10L, 20L))
      .toDF("k", "id", "s1", "s2")
    val r = MlOps.rboRankStability(df, "k", "s1", "s2", "id", 2)
      .collect().head.getDouble(1)
    assert(math.abs(r - 0.125) < 1e-12)
  }

  // ---- k-anonymity ----

  test("kAnonymityProfile: hand-built groups") {
    // groups: (a,1) x 5, (a,2) x 2, (b,1) x 1 -> 3 groups, 2 below k=3,
    // 3 rows at risk, min 1, max 5.
    val df = (Seq.fill(5)(("a", 1)) ++ Seq.fill(2)(("a", 2)) ++ Seq(("b", 1)))
      .toDF("q1", "q2")
    val r = MlOps.kAnonymityProfile(df, Seq("q1", "q2"), 3).collect().head
    assert(r.getAs[Long]("n_groups") == 3)
    assert(r.getAs[Long]("small_groups") == 2)
    assert(r.getAs[Long]("rows_at_risk") == 3)
    assert(r.getAs[Long]("min_group") == 1)
    assert(r.getAs[Long]("max_group") == 5)
  }

  // ---- OLS ----

  test("ols2: recovers an exact planar relation y = 3 + 2*x1 + 5*x2") {
    val rows = for { x1 <- 1 to 5; x2 <- 1 to 5 }
      yield (x1.toLong, x2.toLong, 3L + 2 * x1 + 5 * x2)
    val df = rows.toDF("x1", "x2", "y")
    val r = MlOps.ols2(df, col("x1"), col("x2"), col("y")).collect().head
    assert(r.getAs[Long]("n") == 25)
    assert(math.abs(r.getAs[Double]("b0") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b1") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b2") - 5.0) < 1e-9)
  }

  // ---- runs ----

  test("runProfile: hand-built runs per key") {
    // user 1: A A B A -> runs A(2), B(1), A(1); user 2: B B B -> B(3).
    val df = Seq(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"), (1L, 4L, "A"),
      (2L, 1L, "B"), (2L, 2L, "B"), (2L, 3L, "B")
    ).toDF("u", "ord", "t")
    val m = MlOps.runProfile(df, "u", "t", Seq(col("ord")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m("A") == ((2L, 2L, 1.5)))
    assert(m("B") == ((2L, 3L, 2.0)))
  }
}
