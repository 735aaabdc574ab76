package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the q251+ session batches: the smoothing
  * formula, bin-boundary tie direction, hash-bucket load conservation,
  * basket caps and tie-breaks, micro-unit NDCG, mutual-NN filtering,
  * reservoir quotas, link-prediction scores, k-core peeling, and the
  * l-diversity histogram — the semantics the oracles can't explain. */
class FeatureAffinitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("targetEncode: m-estimate shrinks rare categories toward global mean") {
    val df = Seq(("A", 10.0), ("A", 20.0), ("B", 40.0)).toDF("c", "y")
    val enc = graft.operators.Features.targetEncode(df, "c", "y", m = 1.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val gmean = 70.0 / 3
    assert(enc("A")._1 == 2L && math.abs(enc("A")._2 - 15.0) < 1e-12)
    assert(math.abs(enc("A")._3 - (30.0 + gmean) / 3.0) < 1e-12)
    assert(math.abs(enc("B")._3 - (40.0 + gmean) / 2.0) < 1e-12)
  }

  test("equidepthProfile: bins partition rows; edge value falls in lower bin") {
    // 8 values, 4 bins -> edges at p25/p50/p75 of 1..8: (2.75, 4.5, 6.25)
    val df = (1 to 8).map(_.toDouble).toDF("v")
    val bins = graft.operators.Features.equidepthProfile(df, "v", 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(bins.values.map(_._1).sum == 8L)
    assert(bins(1L) == ((2L, 1.0, 2.0)) && bins(2L) == ((2L, 3.0, 4.0)))
    // exact-edge membership: with edges (2,4,6) from 1..7, v=4 -> bin 2
    val df7 = (1 to 7).map(_.toDouble).toDF("v")
    val b7 = graft.operators.Features.equidepthProfile(df7, "v", 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(b7(2L) == 4.0, "v == edge must close the lower bin (v > e strict)")
  }

  test("hashBuckets: loads conserve keys and buckets stay in range") {
    val df = (1L to 500L).toDF("k")
    val rows = graft.operators.Features.hashBuckets(df, "k", 64).collect()
    assert(rows.map(_.getLong(1)).sum == 500L)
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 64))
    assert(rows.forall(r => r.getLong(1) == r.getLong(2)),
      "distinct keys: n_keys == n_distinct")
  }

  test("itemPairs: cap keeps smallest ids; marginals counted on capped rows") {
    val df = Seq((1, 10L), (1, 20L), (1, 30L), (2, 10L), (2, 20L),
      (3, 10L), (3, 20L), (4, 40L), (4, 50L)).toDF("b", "i")
    val p = graft.operators.Affinity
      .itemPairs(df, "b", "i", cap = 2, minSupport = 2).collect()
    assert(p.length == 1, s"cap=2 drops 30 from basket 1: ${p.toSeq}")
    val r = p.head
    assert(r.getLong(r.fieldIndex("item_a")) == 10L &&
      r.getLong(r.fieldIndex("item_b")) == 20L)
    assert(r.getLong(r.fieldIndex("n_pair")) == 3L &&
      r.getLong(r.fieldIndex("n_a")) == 3L)
    assert(r.getDouble(r.fieldIndex("jaccard")) == 1.0)
    assert(math.abs(r.getDouble(r.fieldIndex("lift")) - 3.0 * 4 / 9) < 1e-12)
  }

  test("ndcgAtK: micro-unit DCG/IDCG, zero-relevance scores 0") {
    val ranked = Seq((1L, 1L, 1L), (1L, 2L, 0L), (1L, 3L, 1L),
      (2L, 1L, 0L), (2L, 2L, 0L)).toDF("q", "rnk", "rel")
    val m = graft.operators.ModelEval.ndcgAtK(ranked, "q", "rnk", "rel")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def disc(r: Int) = math.round(1e6 / (math.log(r + 1.0) / math.log(2.0)))
    val expected = BigDecimal((disc(1) + disc(3)).toDouble /
      (disc(1) + disc(2)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(1L) == ((2L, expected)), s"got ${m(1L)}, want $expected")
    assert(m(2L) == ((0L, 0.0)), "no relevant neighbors -> 0 by convention")
  }

  test("eventPaths: trigrams in (ts, id) order; cap truncates the tail") {
    def ev(id: Long, user: Long, sec: Long, ty: String) =
      (id, user, new java.sql.Timestamp(sec * 1000L), ty)
    val base = Seq(ev(1, 1, 10, "a"), ev(2, 1, 20, "b"), ev(3, 1, 30, "c"),
      ev(4, 1, 40, "a"), ev(5, 2, 10, "x"), ev(6, 2, 20, "y"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val paths = graft.operators.Affinity
      .eventPaths(base, "user_id", "ts", "event_id", "event_type", cap = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(paths == Map("a>b>c" -> 1L, "b>c>a" -> 1L),
      s"user 2 has no trigram: $paths")
    // cap=3 drops event 4: only the first trigram survives
    val capped = graft.operators.Affinity
      .eventPaths(base, "user_id", "ts", "event_id", "event_type", cap = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped == Map("a>b>c" -> 1L), s"cap must keep earliest: $capped")
    // tie on ts: id order decides the path
    val tie = Seq(ev(9, 3, 10, "m"), ev(7, 3, 10, "k"), ev(8, 3, 10, "l"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val t = graft.operators.Affinity
      .eventPaths(tie, "user_id", "ts", "event_id", "event_type", cap = 20)
      .collect().map(_.getString(0)).toSet
    assert(t == Set("k>l>m"), s"ts ties order by event_id: $t")
  }

  test("marginMutualPairs: only mutually-best pairs survive; margin >= 1") {
    // a1=(1,0) and b1=(.9,.1) pick each other; a2=(.5,.5) also picks b1
    // but b1 doesn't pick back, and b2=(0,1) picks a2 unreciprocated.
    val emb = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.5f, 0.5f)),
      (10L, Seq(0.9f, 0.1f)), (11L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.marginMutualPairs(
        emb, "vec_id", "embedding",
        sideA = org.apache.spark.sql.functions.col("vec_id") < 10, k = 2)
      .collect()
    assert(got.length == 1, s"exactly one mutual pair: ${got.toSeq}")
    val r = got.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 10L)
    assert(r.getDouble(3) >= 1.0, "top cos over mean-of-topk is >= 1")
  }

  test("weightedReservoir: exact quota, dense ranks, repartition-invariant") {
    val df = (1L to 40L).map(i => (if (i <= 30) "g" else "h", i, i * 100L))
      .toDF("grp", "id", "w")
    def run(parts: Int) = graft.operators.Scale
      .weightedReservoir(df.repartition(parts),
        "grp", "id", org.apache.spark.sql.functions.col("w"), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    val one = run(1)
    assert(one.count(_._1 == "g") == 5 && one.count(_._1 == "h") == 5,
      "exact quota per group")
    assert(one.filter(_._1 == "g").map(_._2).toSeq == (1L to 5L),
      "dense ranks")
    assert(run(8).toSeq == one.toSeq, "partition-count invariant")
    // a group smaller than k returns all members
    val small = graft.operators.Scale.weightedReservoir(
      Seq(("s", 1L, 10L), ("s", 2L, 20L)).toDF("grp", "id", "w"),
      "grp", "id", org.apache.spark.sql.functions.col("w"), k = 5)
      .collect()
    assert(small.length == 2)
  }

  test("linkPrediction: square graph scores its two diagonals; cap empties") {
    // square 1-2-3-4-1: non-edges (1,3) and (2,4), each via two deg-2
    // middles -> cn=2, aa_mu = 2 * round(1e6/ln 2)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val got = graft.operators.Graphs.linkPrediction(edges, "a", "b", 100)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val aa2 = 2L * math.round(1e6 / math.log(2.0))
    assert(got == Map((1L, 3L) -> ((2L, aa2)), (2L, 4L) -> ((2L, aa2))),
      s"got $got")
    assert(graft.operators.Graphs.linkPrediction(edges, "a", "b", 1)
      .count() == 0, "maxDeg below 2 admits no middles")
  }

  test("kCorePeel: triangle survives, tails and chains peel away") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val core = graft.operators.Graphs.kCorePeel(tri, "a", "b", 2, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      s"tail vertex 4 must peel: $core")
    // a path has no 2-core: successive rounds eat it from both ends
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    assert(graft.operators.Graphs.kCorePeel(path, "a", "b", 2, 4)
      .count() == 0, "k=2 core of a path is empty")
  }

  test("lDiversityProfile: homogeneous groups land in the l=1 bucket") {
    val df = Seq(("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "y")).toDF("qi", "s")
    val h = graft.operators.MlOps.lDiversityProfile(df, Seq("qi"), "s")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(h == Map(1L -> ((1L, 3L)), 2L -> ((1L, 2L))),
      s"A is size-3 yet l=1 (the leak q198 can't see): $h")
  }

  test("similarItems: lift ties break to the smaller neighbor id") {
    val pairs = Seq((1L, 2L, 5L, 10L, 10L, 0.5, 2.0),
      (1L, 3L, 5L, 10L, 10L, 0.5, 2.0))
      .toDF("item_a", "item_b", "n_pair", "n_a", "n_b", "jaccard", "lift")
    val top = graft.operators.Affinity.similarItems(pairs, k = 1)
      .where($"item" === 1L).collect()
    assert(top.length == 1 && top.head.getLong(2) == 2L,
      s"equal lift must keep neighbor 2 over 3: ${top.toSeq}")
  }
}
