package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r16 shared-KN-cache contract: every KN-family query routed
  * through the session-shared `kn_doc_bigrams` / `kn_bigram_model` builders
  * returns EXACTLY the rows its standalone operator form returns — the
  * sharing is a cost optimization, never a semantics change (the
  * SharedCaches "standalone in SEMANTICS" rule).
  */
class TextLmSharedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"CAST(`$c` AS STRING)"): _*)
      .collect().map(_.mkString("|")).toSet
  }

  private def docs = graft.Graft.table(spark, sf, "documents")

  test("q342/q343/q344/q347/q348/q349/q354 shared-cache forms == standalone operators") {
    import graft.operators.TextLm
    import org.apache.spark.sql.functions.col
    val shared: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
      graft.queries.LlmQueries.queries
    val standalone: Map[String, DataFrame] = Map(
      "q342_kn_xent" -> TextLm.knCrossEntropy(docs, "doc_id", "text"),
      "q343_kn_ppl_mix" -> TextLm.knMix(docs, "doc_id", "text", "source"),
      "q344_kn_importance_weights" -> TextLm.knImportanceWeights(
        docs, "doc_id", "text", "source", col("lang") === "en"),
      "q347_kn3_xent" -> TextLm.kn3CrossEntropy(docs, "doc_id", "text"),
      "q348_excess_loss_select" -> TextLm.excessLossSelect(
        docs, "doc_id", "text", "source"),
      "q349_mkn_xent" -> TextLm.mknCrossEntropy(docs, "doc_id", "text"),
      "q354_mink_prob" -> TextLm.minKProb(docs, "doc_id", "text"),
      "q369_lang_kn_xent" -> TextLm.groupedKnXent(
        docs, "doc_id", "text", "lang"),
      "q374_lang_kn_mix" -> TextLm.knMixFrom(
        TextLm.groupedKnXentPerDocFrom(
          TextLm.docBigrams(docs, "doc_id", "text"), docs,
          "doc_id", "text", "lang"),
        docs, "doc_id", "lang"))
    standalone.foreach { case (name, solo) =>
      val viaCache = shared(name)(spark, sf)
      assert(viaCache.columns.toSeq == solo.columns.toSeq,
        s"$name column drift between shared and standalone forms")
      val (a, b) = (rows(viaCache), rows(solo))
      assert(a == b, s"$name shared-cache rows != standalone rows " +
        s"(only-shared: ${(a -- b).take(3)}, only-solo: ${(b -- a).take(3)})")
      graft.operators.CacheScope.drain()
    }
  }
}
