package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ModelEval

/** Fixture semantics for the q241–q244 evaluation batch: tie-aware AUC
  * by hand, the PR sheet at every threshold, gains bins that never split
  * ties, and PSI's zero-on-identical / large-on-disjoint contract. */
class EvalQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("aucRoc: perfect separation → 1, ties earn half credit") {
    val perfect = Seq((3, true), (4, true), (1, false), (2, false))
      .toDF("s", "y")
    val p = ModelEval.aucRoc(perfect, "s", col("y")).collect()(0)
    assert(p.getLong(0) == 2 && p.getLong(1) == 2)
    assert(math.abs(p.getDouble(2) - 1.0) < 1e-12)
    // pos {1,2}, neg {2,3}: only the (2,2) tie earns 0.5 of 4 pairs
    val tied = Seq((1, true), (2, true), (2, false), (3, false)).toDF("s", "y")
    val t = ModelEval.aucRoc(tied, "s", col("y")).collect()(0)
    assert(math.abs(t.getDouble(2) - 0.125) < 1e-12)
  }

  test("prCurve: one row per threshold, hand-checked operating points") {
    val df = Seq((3, true), (1, false), (2, false)).toDF("s", "y")
    val m = ModelEval.prCurve(df, "s", col("y")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(4), r.getDouble(5),
        r.getDouble(6))).toMap
    assert(m.size == 3)
    assert(m(3L) == ((1L, 1.0, 1.0, 1.0)))
    val (tp2, p2, r2, f2) = m(2L)
    assert(tp2 == 1L && math.abs(p2 - 0.5) < 1e-12 && r2 == 1.0 &&
      math.abs(f2 - 2.0 / 3) < 1e-12)
    assert(math.abs(m(1L)._2 - 1.0 / 3) < 1e-12)
  }

  test("gainsTable: top bins capture the positives, lift decays to 1") {
    // scores 10..1, positives at 10/9/8, 5 bins of 2 rows
    val df = (1 to 10).map(s => (s, s >= 8)).toDF("s", "y")
    val rows = ModelEval.gainsTable(df, "s", col("y"), nBins = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(rows.keySet == (1L to 5L).toSet)
    assert(rows(1L)._1 == 2 && rows(1L)._2 == 2)
    assert(math.abs(rows(1L)._3 - 2.0 / 3) < 1e-12)
    assert(math.abs(rows(1L)._4 - 10.0 / 3) < 1e-12)
    assert(math.abs(rows(2L)._3 - 1.0) < 1e-12) // all positives captured
    assert(math.abs(rows(5L)._4 - 1.0) < 1e-12) // full population = base rate
  }

  test("psi: identical cohorts → 0, disjoint cohorts read as shifted") {
    val same = (1 to 20).flatMap(i => Seq(("a", i % 5), ("b", i % 5)))
      .toDF("g", "v")
    val s = ModelEval.psi(same, "g", "a", "b", "v", nBins = 5).collect()(0)
    assert(math.abs(s.getDouble(3)) < 1e-12, s"psi: ${s.getDouble(3)}")
    val shifted = ((1 to 20).map(i => ("a", i % 5)) ++
      (1 to 20).map(i => ("b", 100 + i % 5))).toDF("g", "v")
    val r = ModelEval.psi(shifted, "g", "a", "b", "v", nBins = 5).collect()(0)
    assert(r.getDouble(3) > 0.25, s"disjoint psi: ${r.getDouble(3)}")
  }
}
