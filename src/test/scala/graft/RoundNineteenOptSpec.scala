package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r19-optimization shared-cache contract: every query rewired
  * onto the six new session-shared builders (softdedup_weights,
  * exact_runs_l20, exact_substr_doc, mem_windows_k5/k10/k20) returns
  * EXACTLY the rows its standalone operator form returns — the sharing is
  * a cost optimization, never a semantics change (the SharedCaches
  * "standalone in SEMANTICS" rule, the TextLmSharedSpec recipe).
  */
class RoundNineteenOptSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  // MULTISET equality (sorted row strings), not Set: a divergence that
  // only changes duplicate-row multiplicity must fail too (r19 ADVICE)
  private def rows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"CAST(`$c` AS STRING)"): _*)
      .collect().map(_.mkString("|")).toSeq.sorted
  }

  private def docs = graft.Graft.table(spark, sf, "documents")

  test("exact-substring / memorization / soft-weight shared forms == standalone operators") {
    import graft.operators.{Scale, TextDedup, TextLm}
    val shared: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
      graft.SparkEntry.queries
    val standalone: Map[String, DataFrame] = Map(
      "q300_exact_substring" -> TextDedup.exactSubstringRuns(
        docs, "doc_id", "text", l = 20, maxDf = 10),
      "q377_exact_substr_dedup" -> TextDedup.exactSubstringDedup(
        docs, "doc_id", "text", l = 20, maxDf = 10),
      "q384_exact_substr_sweep" -> TextDedup.exactSubstringSweep(
        docs, "doc_id", "text"),
      "q391_dedup_aware_mix" -> Scale.dedupAwareMix(
        docs, "doc_id", "text", "source"),
      "q388_softdedup_weights" -> TextLm.softDedupWeights(
        TextLm.docBigrams(docs, "doc_id", "text"), "doc_id"),
      "q394_soft_weighted_mix" -> Scale.softWeightedMix(
        docs, "doc_id", "source", "text",
        TextLm.softDedupWeights(
          TextLm.docBigrams(docs, "doc_id", "text"), "doc_id")),
      "q398_allocation_ablation" -> Scale.allocationAblation(
        docs, "doc_id", "text", "source",
        TextLm.softDedupWeights(
          TextLm.docBigrams(docs, "doc_id", "text"), "doc_id")),
      "q389_extractable_memorization" -> TextDedup.extractableMemorization(
        docs, "doc_id", "text"),
      "q393_memorization_risk" -> TextDedup.memorizationRisk(
        docs, "doc_id", "text", k = 10),
      "q397_memorization_by_source" -> TextDedup.memorizationRiskBySource(
        docs, "doc_id", "text", "source"))
    standalone.foreach { case (name, solo) =>
      val viaCache = shared(name)(spark, sf)
      assert(viaCache.columns.toSeq == solo.columns.toSeq,
        s"$name column drift between shared and standalone forms")
      val (a, b) = (rows(viaCache), rows(solo))
      assert(a == b, s"$name shared-cache rows != standalone rows " +
        s"(only-shared: ${a.diff(b).take(3)}, only-solo: ${b.diff(a).take(3)})")
      graft.operators.CacheScope.drain()
    }
  }

  test("q395 corpus card via the shared k=10 inventory == the self-building census leg") {
    import graft.operators.TextDedup
    // the card's extractable_frac_k10 column must equal the standalone
    // census's k=10 row — the one leg the r19 rewire changed
    val card = graft.SparkEntry.queries("q395_corpus_card_v2")(spark, sf)
    val solo = TextDedup.extractableMemorization(docs, "doc_id", "text",
        ks = Seq(10))
      .select(org.apache.spark.sql.functions.col("extractable_frac"))
      .collect().head.getDouble(0)
    val viaCard = card.select("extractable_frac_k10").collect().head.getDouble(0)
    assert(viaCard == solo,
      s"card extractable_frac_k10 $viaCard != standalone census $solo")
    graft.operators.CacheScope.drain()
  }
}
