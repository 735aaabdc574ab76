package graft

/** Diagnostic main: print the formatted physical plan of selected queries so
  * plan regressions (lost pushdown, surprise cartesian, forced broadcast of a
  * growing table) are visible at review time.
  * Usage: runMain graft.PlanAudit [sfDir] [queryName...]  (default: headline set)
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q02_filter_predicate", "q13_join_inner_broadcast", "q16_join_multi",
        "q31_minhash_lsh_pairs", "q33_knn_bruteforce", "q35_partitioned_roundtrip",
        "q43_asof_join", "q44_range_join", "q50_ivf_ann", "q54_chunking",
        "q75_ngram_jaccard_pairs", "q88_sequence_packing", "q90_quantized_rerank",
        "q92_cms_counts", "q93_topk_per_group", "q99_salted_join", "q100_flagship",
        "q103_phrase_search", "q104_source_overlap", "q106_label_purity",
        "q107_histogram_quantile")
    val spark = Graft.session("graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
