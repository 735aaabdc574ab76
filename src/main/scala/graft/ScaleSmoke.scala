package graft

import org.apache.spark.sql.functions._

/** Scale-trend smoke: replicate the documents corpus `factor`x in memory
  * (id-shifted copies — every doc gains factor-1 exact duplicates, the shape
  * of real crawl data) and time the dedup pipelines end-to-end. The point is
  * the GROWTH CURVE, not the absolute number: a pipeline whose cost explodes
  * superlinearly here would melt at 100 TB regardless of constants.
  *
  *   sbt "runMain graft.ScaleSmoke /root/testdata/sf0.1 10"
  *
  * Prints one line per pipeline: rows found and wall seconds at 1x and at
  * `factor`x. Exact replicas are the adversarial case for near-dup dedup:
  * every replica pair is a true J=1.0 pair, so the candidate volume scales
  * with factor^2 per original document — the df-capped / banded candidate
  * generation must absorb that without a cross product.
  *
  * Measured (sf0.1 x10 = 50k docs, local[32], 2026-08-12; dedup numbers
  * vary run-to-run with machine load — compare shapes, not points):
  * {{{
  *   ngram_jaccard  1x rows=256     9.3-9.7 s   10x rows=250,555  111-180 s
  *   minhash_lsh    1x rows=256     2.3-4.0 s   10x rows=250,600   70-90 s
  *   exact_dedup    1x rows=4,992   0.4 s       10x rows=4,992     1.2-1.4 s
  *   tfidf_topk     1x rows=15      1.1 s       10x rows=15        2.5 s
  *   bm25_topk      1x rows=15      1.0 s       10x rows=15        2.6 s
  *   source_overlap 1x rows=190     1.5 s       10x rows=190       1.7 s
  * }}}
  * (source_overlap re-measured 2026-08-13 after the switch to native FNV
  * shingle hashes — pre-switch it was 5.3-5.5 s flat across factors; the
  * shape is unchanged, the constant is 3x smaller.)
  * Reading: exact dedup is sublinear (3.5x cost for 10x input). The
  * near-dup pipelines return 1000x MORE TRUE PAIRS (every 10-clique is 45
  * real J=1.0 pairs) for 12x / 30x cost — growth tracks input + answer
  * size, the floor for pair-output dedup, not a wasted-candidate blowup.
  * The production order at crawl scale follows directly: run exactDedup
  * FIRST to collapse replica cliques, then near-dup on the survivors.
  * Inverted-index retrieval (q83/q84: fixed query vocabulary, growing
  * corpus) is ~2.5x cost for 10x corpus: the term-keyed equi-joins touch
  * only postings for query terms, and the per-doc stats pass (dlen, N,
  * avgdl) is an embarrassingly-parallel scan + 1-row aggregate — the
  * growth an inverted index is supposed to have (index-scan bound, never
  * corpus x terms). The cross-source overlap matrix is FLAT at 10x: exact
  * replicas stay within their source, so they add zero new (group, gram)
  * pairs and the map-side collect_set partials absorb them before the
  * shuffle — group-keyed output is |groups|²-bounded at any corpus size. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = Graft.session("graft-scale-smoke")
    val base = Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val big = (0 until factor)
      .map(i => base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"SMOKE $name%-28s rows=$rows%-9d ${(System.nanoTime() - t0) / 1e9}%.1f s")
      operators.CacheScope.drain()
    }

    // Retrieval query terms are held CONSTANT across factors (the >= 6-char
    // tokens of docs 0-2, the q83/q84 vocabulary) so the curve isolates
    // corpus growth — the realistic shape: a fixed query workload over an
    // ever-larger index.
    val terms = base.where(col("doc_id") < 3)
      .select(explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) >= 6)

    for ((label, df) <- Seq(("1x", base), (s"${factor}x", big))) {
      time(s"ngram_jaccard  $label") {
        operators.TextDedup.ngramJaccardPairs(df, "doc_id", "text",
          n = 8, maxDfFrac = 0.02, threshold = 0.5, minShared = 2).count()
      }
      time(s"minhash_lsh    $label") {
        operators.TextDedup.minhashNearDupPairs(df, "doc_id", "text",
          threshold = 0.5).count()
      }
      time(s"exact_dedup    $label") {
        operators.TextDedup.exactDedup(df, "doc_id", "text").count()
      }
      time(s"tfidf_topk     $label") {
        operators.TextRank.tfidfTopK(df, "doc_id", "text", terms, "term", k = 15).count()
      }
      time(s"bm25_topk      $label") {
        operators.TextRank.bm25TopK(df, "doc_id", "text", terms, "term", k = 15).count()
      }
      time(s"phrase_search  $label") {
        operators.TextSearch.phraseSearch(df, "doc_id", "text",
          Seq("slow", "hash", "batch")).count()
      }
      // replicas keep their source, so the group count is CONSTANT across
      // factors — the curve shows the per-gram inverted lists growing with
      // the corpus while the output stays |groups|² -bounded
      time(s"source_overlap $label") {
        operators.TextDedup.crossGroupOverlap(df, "source", "text", k = 5).count()
      }
    }
    spark.stop()
  }
}
