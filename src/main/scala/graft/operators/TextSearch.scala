package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact phrase search over a tokenized corpus via a positional inverted
  * index — the retrieval twin of [[TextRank]]'s scored lookups: instead of
  * bag-of-words scoring, the match requires the phrase's tokens at
  * CONSECUTIVE positions.
  *
  * Plan (the shape that survives 100 TB): posexplode to (doc, pos, term)
  * postings, filter the postings to the phrase's term set BEFORE any shuffle
  * (an `IN` over a literal handful of terms, pushed into the scan), then ONE
  * doc-keyed aggregation builds a per-doc pos→term map of only those
  * surviving postings, and a codegen'd fold over the map counts adjacency
  * runs. Per-doc state is bounded by that doc's occurrences of the phrase
  * terms, never its length; the corpus is touched exactly once; nothing is
  * ever joined against the whole postings list. Overlapping matches count
  * individually ("a a" occurs twice in "a a a"), matching the positional-join
  * semantics a SQL oracle replays.
  */
object TextSearch {

  /** Docs containing the exact token sequence `phrase`, with the number of
    * (possibly overlapping) occurrences. Output: (idCol, n_matches > 0). */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    require(phrase.forall(t => t.nonEmpty && !t.contains("'") && !t.contains(" ")),
      "phrase tokens must be non-empty single words without quotes")
    val terms = phrase.distinct
    val post = docs
      .select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .where(col("term").isin(terms: _*))
    // pos is unique within a doc (posexplode), so pos→term is a valid map;
    // the fold is a sum, so the map's (arbitrary) entry order cannot move
    // the result. try_element_at: a probe past a phrase-term gap is null →
    // IF(null,…) takes the else branch (ANSI element_at would throw).
    val cond = phrase.zipWithIndex.map { case (t, k) =>
      if (k == 0) s"pm[p] = '$t'" else s"try_element_at(pm, p + $k) = '$t'"
    }.mkString(" AND ")
    post.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("pos"), col("term"))))
        .as("pm"))
      .withColumn("n_matches", expr(
        s"aggregate(map_keys(pm), CAST(0 AS BIGINT), " +
          s"(acc, p) -> acc + IF($cond, CAST(1 AS BIGINT), CAST(0 AS BIGINT)))"))
      .where(col("n_matches") > 0)
      .select(col(idCol), col("n_matches"))
  }

  /** Dictionary (blocklist) phrase matching — [[phraseSearch]] with
    * PHRASES AS DATA: every exact token-sequence occurrence of every
    * dictionary phrase, in one pass over the corpus. The corpus-cleaning
    * primitive behind banned-phrase filters and policy screens, where
    * the dictionary is thousands of phrases and scanning once per phrase
    * is not an option.
    *
    * Plan: postings filter to the dictionary's token SET via a broadcast
    * semi-join (a blocklist is small by contract — the decontamination
    * posture), ONE doc-keyed aggregation builds the surviving pos→term
    * map, anchors join phrase first-tokens term-keyed, and the adjacency
    * probe folds over the phrase's own length against the map. Per-doc
    * state is bounded by that doc's dictionary-term occurrences;
    * candidates by first-token occurrences — never |docs| × |phrases|.
    * Output: (idCol, phraseIdCol, n_matches > 0), overlapping matches
    * counted individually (the phraseSearch contract). */
  def blocklistMatches(docs: DataFrame, idCol: String, textCol: String,
                       phrases: DataFrame, phraseIdCol: String,
                       phraseCol: String): DataFrame = {
    val ptoks = phrases.select(col(phraseIdCol).as("__pid"),
      split(col(phraseCol), " ").as("__pt"))
    val dictTokens = ptoks.select(explode(col("__pt")).as("term")).distinct()
    val post = docs
      .select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .join(broadcast(dictTokens), "term")
    val pm = post.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("pos"), col("term"))))
        .as("pm"))
    val anchors = post.join(
      broadcast(ptoks.withColumn("term", col("__pt").getItem(0))), "term")
    // probe positions pos+1 … pos+len-1; single-token phrases match at
    // the anchor itself (sequence(1, 0) is DESCENDING in Spark — guard)
    anchors.join(pm, idCol)
      .withColumn("__hit", expr(
        "CASE WHEN size(__pt) = 1 THEN CAST(1 AS BIGINT) " +
        "ELSE IF(aggregate(sequence(1, size(__pt) - 1), true, " +
        "(a, k) -> a AND try_element_at(pm, pos + k) = " +
        "element_at(__pt, k + 1)), CAST(1 AS BIGINT), CAST(0 AS BIGINT)) " +
        "END"))
      .groupBy(col(idCol), col("__pid"))
      .agg(sum(col("__hit")).as("n_matches"))
      .where(col("n_matches") > 0)
      .select(col(idCol), col("__pid").as(phraseIdCol), col("n_matches"))
  }
}
