package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the quality-filtering
  * primitive behind CCNet-style pipelines: train a smoothed bigram model on
  * the corpus itself, score every document by its per-token cross-entropy,
  * and keep/drop/bucket documents by that score. Unusually fluent text
  * (boilerplate, lorem-ipsum spam) and unusually disfluent text (garbled
  * extraction) both land in the tails.
  *
  * Plan (all shuffles keyed, nothing corpus x corpus):
  *  1. per-doc bigram occurrences: split once, zip-adjacent, explode,
  *     aggregate on (doc, w1, w2) — one shuffle keyed by doc+bigram;
  *  2. model = global bigram counts (re-aggregate 1's output on (w1, w2) —
  *     no second corpus pass) + unigram history counts + vocabulary size
  *     (one broadcast row);
  *  3. score = equi-join 1's output with the model on (w1, w2), then one
  *     per-doc aggregate. Model size is the number of OBSERVED bigram
  *     types — Zipf-bounded, far below |V|^2 — and the join is keyed on
  *     the bigram, so the same plan holds at any corpus size.
  *
  * Smoothing: add-one over the unigram history — p(w2|w1) =
  * (c(w1,w2) + 1) / (c(w1) + |V|) — chosen over backoff/Kneser-Ney because
  * it is exactly replayable in one SQL pass (the oracle mirrors it) while
  * keeping the operative property (unseen continuations get small nonzero
  * mass).
  *
  * Determinism: each bigram TYPE's log-probability is quantized to integer
  * micro-units once in the model (`round(ln(p)*1e6)` as BIGINT — the same
  * discipline as TextRank's scoring), so the per-doc sum is an exact
  * integer sum weighted by occurrence counts: order-free under partial
  * aggregation and bit-identical on any engine. The single division and
  * 6 dp round happen once per document at the end.
  */
object TextLm {

  /** Per-document bigram cross-entropy in nats: doc_id, n_bigrams, xent.
    * Documents with fewer than two tokens have no bigrams and are omitted
    * (a length filter runs before an LM filter in any real pipeline). */
  def bigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("t"))
    val pairs = toks.select(col(idCol),
        explode(arrays_zip(
          expr("slice(t, 1, size(t) - 1)").as("w1"),
          expr("slice(t, 2, size(t) - 1)").as("w2"))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val docBig = pairs.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("occ"))
    val big = docBig.groupBy(col("w1"), col("w2")).agg(sum(col("occ")).as("c2"))
    val uni = toks.select(explode(col("t")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val model = big.join(uni, "w1").crossJoin(broadcast(vocab))
      .withColumn("lp_mu", expr(
        "CAST(round(ln(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)) * 1e6) AS BIGINT)"))
      .select(col("w1"), col("w2"), col("lp_mu"))
    docBig.join(model, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("occ") * col("lp_mu")).as("mu"), sum(col("occ")).as("m"))
      .select(col(idCol), col("m").as("n_bigrams"),
        round((col("mu").cast("double") / lit(-1e6)) / col("m").cast("double"), 6)
          .as("xent"))
  }
}
