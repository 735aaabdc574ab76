package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over DataFrame edge lists — corpus-level link analysis.
  * The canonical LLM-data use: PageRank over a link/co-occurrence graph as a
  * document- or term-quality prior (web-graph centrality is a standard crawl
  * quality signal, and PageRank over the token co-occurrence graph is the
  * corpus-level TextRank keyword scheme — the global sibling of the per-doc
  * TF-IDF tagging in [[TextRank.keywordsPerDoc]]).
  *
  * Determinism: a naive power iteration sums DOUBLE contributions per node,
  * which is partial-aggregation-order dependent — a cluster run would not
  * reproduce a single-node oracle bit-for-bit. Ranks here live in BIGINT
  * micro-units (1e9 = rank 1.0) and every per-edge contribution is the exact
  * integer floor(rank_mu · w / out_w); sums are BIGINT (associative), and
  * the damping step is integer arithmetic too (85/100 as a rational, not
  * 0.85 as a double). Every engine that can do 64-bit integer math produces
  * the identical ranking — which is what lets DuckDB replay the whole
  * iteration in a recursive CTE as the oracle.
  */
object Graphs {

  /** Weighted PageRank, fixed `iters` power iterations, damping 85/100.
    *
    * `edges`: (srcCol, dstCol, wCol) with BIGINT-able positive weights.
    * Output: (node, rank_mu, rank) — micro-unit BIGINT rank and its double
    * view, one row per node appearing as src or dst.
    *
    * Dangling-mass convention: nodes with no out-edges absorb rank but
    * redistribute nothing (their mass decays toward the teleport floor) —
    * the common simplification; ranks therefore sum to slightly less than
    * SCALE. Stated here because engines differ on it.
    *
    * Scale design: one shuffle per iteration (contributions aggregated on
    * dst), joins keyed on node id; the node/edge tables are Zipf-bounded for
    * token graphs and |V|+|E|-bounded generally — never row-count-bounded.
    * Each iteration's state is checkpointed (reliable dir if configured,
    * else local) so iteration N's plan does not embed plans 1..N−1 — the
    * [[TextDedup.connectedComponents]] lineage discipline. Floor division
    * loses at most 1 micro-unit per edge per iteration: invisible at 1e9
    * scale, identical in every engine. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
               iters: Int = 8, scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val reliable = edges.sparkSession.sparkContext.getCheckpointDir.isDefined
    def save(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(true)

    val e = save(edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("bigint").as("w")))
    val nodes = save(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct())
    // out-weight per source, pre-joined once — the loop reuses this table
    val outW = save(e.groupBy(col("src")).agg(sum(col("w")).as("out_w")))
    val ew = save(e.join(outW, "src"))
    val nNodes = save(nodes.agg(count(lit(1)).as("__n")))

    // teleport floor: (15·scale) div (100·n). BIGINT `div`, never `/`:
    // Spark's `/` on integers is DOUBLE division, and rank_mu·w exceeds
    // 2^53 where floor(double) silently loses exactness.
    var ranks = save(nodes.crossJoin(broadcast(nNodes))
      .select(col("node"), expr(s"${scale}L div __n").as("rank_mu")))

    for (_ <- 1 to iters) {
      val contrib = ew
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("(rank_mu * w) div out_w")).as("__in"))
      ranks = save(nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nNodes))
        .select(col("node"),
          expr(s"(15 * ${scale}L) div (100 * __n) + " +
            "(85 * coalesce(__in, 0L)) div 100").as("rank_mu")))
    }
    ranks.select(col("node"), col("rank_mu"),
      (col("rank_mu").cast("double") / lit(scale.toDouble)).as("rank"))
  }

  /** Token co-occurrence PageRank over a corpus: nodes are tokens, edge
    * (a, b) weight = corpus count of the ADJACENT ordered pair — the global
    * TextRank term-importance sheet. Vocab is Zipf-bounded, so node and
    * edge tables stay small relative to the corpus at any scale. */
  def tokenPageRank(docs: DataFrame, textCol: String, iters: Int = 8): DataFrame = {
    val toks = docs.select(split(col(textCol), " ").as("t"))
      .where(size(col("t")) >= 2)
    val bigrams = toks.select(posexplode(col("t")).as(Seq("__i", "__a")),
        col("t"))
      .where(col("__i") < size(col("t")) - 1)
      .select(col("__a").as("src"), col("t").getItem(col("__i") + 1).as("dst"))
      .where(col("src") =!= "" && col("dst") =!= "")
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    pageRank(bigrams, "src", "dst", "w", iters)
  }
}
