package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the physical-plan properties the 100 TB design depends on — a plan
  * regression (lost pushdown, surprise cross join, forced broadcast of a
  * growing table) fails here before it fails at scale. */
class PlanAssertionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02: both predicates pushed into the parquet scan") {
    val p = plan("q02_filter_predicate")
    assert(p.contains("PushedFilters"))
    assert(p.contains("EqualTo(event_type,click)"), p.linesIterator.take(5).mkString("\n"))
    assert(p.contains("GreaterThan(value,50.0)"))
  }

  test("q08: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q08_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q13/q16: no forced broadcast of the growing customer table") {
    // the plan may still CHOOSE broadcast at tiny SF (AQE size-based) —
    // what must not appear is an explicit broadcast hint on customer in the
    // logical plan
    Seq("q13_join_inner_broadcast", "q16_join_multi").foreach { q =>
      val logical = SparkEntry.queries(q)(spark, sf).queryExecution.logical.toString
      assert(!logical.toLowerCase.contains("unresolvedhint (broadcast"),
        s"$q must not hard-hint broadcast")
    }
  }

  test("q31: LSH dedup plan contains no cartesian/broadcast-nested-loop join") {
    val p = plan("q31_minhash_lsh_pairs")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q33: brute-force knn broadcasts the bounded query side with WindowGroupLimit pushdown") {
    val p = plan("q33_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin"), "bounded query side should broadcast")
    assert(p.contains("WindowGroupLimit"), "partial top-k should push below the shuffle")
  }

  test("q50: IVF plan has no rank windows — assignment and top-k are aggregates") {
    // r5 shipped 3 sort-shuffle windows here (per-Lloyd-round assignment +
    // final ranking); all replaced with min-struct / bounded top-k partial
    // aggregations. A WindowExec reappearing means a corpus-wide sort per
    // training round at scale.
    val p = plan("q50_ivf_ann")
    assert(!p.contains("WindowExec"), "no window may appear in the IVF plan")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"))
  }

  test("q90/q93: bounded top-k aggregates rank without any window") {
    Seq("q90_quantized_rerank", "q93_topk_per_group").foreach { q =>
      val p = plan(q)
      assert(!p.contains("WindowExec"), s"$q must rank via TopKAgg, not a rank window")
      assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), q)
    }
  }

  test("q44: range join is an equi-join on bucket keys, not a theta join") {
    val p = plan("q44_range_join")
    assert(!p.contains("CartesianProduct"))
    // the bucket equality must appear as a join key, the range as a filter
    assert(p.contains("__probe"))
  }

  test("q109: RRF fuse ends in a bounded top-k, and every window's subtree is LIMIT-bounded") {
    import org.apache.spark.sql.execution.{GlobalLimitExec, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // pre-AQE physical tree: traversable, and what the string assertions see
    val p = SparkEntry.queries("q109_hybrid_rrf")(spark, sf).queryExecution.sparkPlan
    assert(p.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "final fuse ordering must be top-k, not a global sort")
    val windows = p.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the sparse-list rank window")
    // each rank window must consume a LIMIT-bounded input — GlobalLimit /
    // top-k for the 50-row fused lists, or a WindowGroupLimit (rank-limit
    // pushdown: ≤ k rows per group reach the window). A window directly
    // over the corpus would pass the old string-index check but fails this
    // subtree walk.
    windows.foreach { w =>
      val bounded = w.child.collect {
        case l: GlobalLimitExec => l: Any
        case t: TakeOrderedAndProjectExec => t: Any
        case g: WindowGroupLimitExec => g: Any
      }
      assert(bounded.nonEmpty, s"window over unbounded input:\n$w")
    }
  }

  test("q91/q121: retention joins carry no broadcast hint on the growing cluster map") {
    // the cluster map is one row per clustered document (and `best` one row
    // per cluster) — unbounded at 100x scale. AQE may still pick broadcast
    // at tiny SF from measured size; a *forced* hint must never reappear.
    Seq("q91_dedup_retention", "q121_retention_longest").foreach { q =>
      val logical = SparkEntry.queries(q)(spark, sf).queryExecution.logical.toString
      assert(!logical.toLowerCase.contains("unresolvedhint (broadcast"),
        s"$q must not hard-hint broadcast of the cluster map")
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("q113: split plan is one narrow projection + one partial-aggregated exchange") {
    val p = plan("q113_split_plan")
    assert(!p.contains("WindowExec") && !p.contains("CartesianProduct"))
    // exactly one shuffle: the |splits|-group final aggregate
    assert("Exchange".r.findAllIn(p).size <= 2, // AQE may add a read node line
      "splitPlan must shuffle only the tiny per-split partials")
    assert(p.contains("HashAggregate"), "sizing must be a hash aggregate")
  }

  test("q111: MAD screen broadcasts both stat tables; the value table is never shuffled wide") {
    try {
      val p = plan("q111_mad_outliers")
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
        "group-stat joins must broadcast the tiny median/MAD tables")
      assert(!p.contains("CartesianProduct"))
    } finally graft.operators.CacheScope.drain() // madOutliers registers a persist
  }

  test("q122/q124-q126: corpus-stats plans stay keyed — no cartesian, windows partitioned") {
    // PMI's only non-equi node is the 1-row corpus-count broadcast (the
    // accepted stats pattern); the pair expansion itself must be a doc-keyed
    // equi-join. dupNgramFraction is pure gram-keyed equi-joins.
    Seq("q122_token_pmi", "q124_dup_ngram_fraction", "q123_temperature_mix")
      .foreach { q => assert(!plan(q).contains("CartesianProduct"), q) }
    assert(!plan("q124_dup_ngram_fraction").contains("BroadcastNestedLoopJoin"))
    // rank/lead windows must be partitioned (per-source vocab, per-user
    // stream) — a global window would single-task the corpus
    import org.apache.spark.sql.execution.window.WindowExec
    Seq("q125_zipf_slope", "q126_event_transitions", "q127_source_keyness")
      .foreach { q =>
        val ws = SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan
          .collect { case w: WindowExec => w }
        assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
          s"$q windows must be partitioned")
      }
    // tier assignment / centroid pairs / sketch pairs: only bounded
    // broadcast non-equi joins (1-row cutpoints, |labels| centroids,
    // |groups| sketches) — never a cartesian
    Seq("q128_quality_tiers", "q129_centroid_distances",
        "q130_kmv_source_jaccard").foreach { q =>
      assert(!plan(q).contains("CartesianProduct"), q)
    }
    // novelty is pure gram-keyed equi-joins; burst's window partitions by key
    assert(!plan("q131_ngram_novelty").contains("BroadcastNestedLoopJoin"))
    val bw = SparkEntry.queries("q132_event_burst")(spark, sf)
      .queryExecution.sparkPlan
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(bw.nonEmpty && bw.forall(_.partitionSpec.nonEmpty))
  }

  test("q151-q162: new-operator plans keep their scale shape") {
    import org.apache.spark.sql.execution.window.WindowExec
    // DSIR scoring is bigram/history-keyed equi-joins + two 1-row vocab
    // broadcasts — no cartesian over data
    assert(!plan("q151_importance_weights").contains("CartesianProduct"))
    // blocked ED join is an equi-join on the block key — a cartesian or
    // nested-loop here would be the unbounded all-pairs this operator
    // exists to avoid
    val ed = plan("q152_edit_near_dup")
    assert(!ed.contains("CartesianProduct") &&
      !ed.contains("BroadcastNestedLoopJoin"), ed.linesIterator.take(8).mkString("\n"))
    // the train-order rank window must partition by shard — a global
    // window would single-task the corpus
    val tw = SparkEntry.queries("q155_train_order")(spark, sf)
      .queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(tw.nonEmpty && tw.forall(_.partitionSpec.nonEmpty),
      "train order must never rank globally")
    // BPE merge candidates: distributed top-k, not a global sort
    assert(plan("q156_bpe_merges").contains("TakeOrderedAndProject"))
    // returns report: top-20 via TakeOrderedAndProject; no broadcast hint
    // on the growing customer table (AQE may still choose it at tiny SF)
    val rr = plan("q162_returns_report")
    assert(rr.contains("TakeOrderedAndProject"))
    val rrLogical = SparkEntry.queries("q162_returns_report")(spark, sf)
      .queryExecution.logical.toString
    assert(!rrLogical.toLowerCase.contains("unresolvedhint (broadcast"))
    // KS / ensemble cumulative windows run over distinct-value grids —
    // global by construction but bounded; what must hold is that the KS
    // grid window partitions by group
    val kw = SparkEntry.queries("q158_length_ks")(spark, sf)
      .queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(kw.nonEmpty && kw.forall(_.partitionSpec.nonEmpty),
      "KS cumulative windows must partition by group")
  }

  test("q182-q187: relational batch keeps keyed-join shapes") {
    // q182 decorrelation: the correlated avg must become a per-part
    // aggregate + equi-join — never a nested-loop re-scan per row
    val p182 = plan("q182_small_order_revenue")
    assert(!p182.contains("CartesianProduct") &&
      !p182.contains("BroadcastNestedLoopJoin"), p182.linesIterator.take(8).mkString("\n"))
    // q187's double-role nation join: two independent equi-joins, no
    // cartesian between the aliased copies
    val p187 = plan("q187_nation_pair_volume")
    assert(!p187.contains("CartesianProduct"))
    // q184/q185 scalar-threshold joins DO cross-join — but only against a
    // broadcast 1-row aggregate (the bounded pattern); assert the logical
    // plan hints broadcast on that side so it can never shuffle wide
    Seq("q184_nation_balance_share", "q185_top_revenue_supplier").foreach { qn =>
      val logical = SparkEntry.queries(qn)(spark, sf).queryExecution.logical.toString
      assert(logical.toLowerCase.contains("resolvedhint"),
        s"$qn must broadcast its 1-row global aggregate:\n$logical")
    }
    // q186: the min join-back is an equi-join on (partkey [, cost]) —
    // no cartesian anywhere in the plan
    assert(!plan("q186_cheapest_supplier").contains("CartesianProduct"))
  }

  test("q193-q201: ML batch keeps its scale shapes") {
    import org.apache.spark.sql.execution.window.WindowExec
    // q194: covariance must be ONE ObjectHashAggregate pass over the data
    // (partial+final) — a Generate (explode) before the aggregate would be
    // the n*d^2-row shuffle GramMatrixAgg exists to avoid
    val p194 = plan("q194_embedding_covariance")
    assert(p194.contains("Aggregate"), p194.linesIterator.take(6).mkString("\n"))
    assert(!p194.contains("Generate"),
      "covariance must not explode the vectors:\n" +
        p194.linesIterator.take(10).mkString("\n"))
    assert(!p194.contains("CartesianProduct"))
    // q193: NB scoring joins are token-keyed; the only cross joins carry a
    // broadcast hint on the class/model side (bounded by #classes), never
    // a cartesian over data
    assert(!plan("q193_nb_source_confusion").contains("CartesianProduct"))
    // the per-doc argmax window partitions by doc — never global
    val w193 = SparkEntry.queries("q193_nb_source_confusion")(spark, sf)
      .queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(w193.nonEmpty && w193.forall(_.partitionSpec.nonEmpty),
      "NB argmax must partition by doc")
    // q196: the rank window partitions by source — never a global sort
    val w196 = SparkEntry.queries("q196_rank_normalize")(spark, sf)
      .queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(w196.nonEmpty && w196.forall(_.partitionSpec.nonEmpty),
      "rank normalization must partition by key")
    // q197: rankings come from TopKAgg partial aggregation — the plan must
    // contain NO window at all
    val w197 = SparkEntry.queries("q197_rbo_rank_stability")(spark, sf)
      .queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(w197.isEmpty, "RBO rankings must be window-free (TopKAgg)")
    // q200: fact table scanned once, no self-join — no cartesian and no
    // nested-loop anywhere
    val p200 = plan("q200_threshold_part_suppliers")
    assert(!p200.contains("CartesianProduct") &&
      !p200.contains("BroadcastNestedLoopJoin"))
    // q201: both run windows partition by user
    val w201 = SparkEntry.queries("q201_event_runs")(spark, sf)
      .queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(w201.nonEmpty && w201.forall(_.partitionSpec.nonEmpty),
      "run detection must partition by key")
    // q202: HLL is a pure aggregation — no window, no cartesian; the
    // register buffer rides the normal partial/final aggregate exchange
    val w202 = SparkEntry.queries("q202_hll_distinct")(spark, sf)
      .queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(w202.isEmpty, "HLL must be window-free")
    assert(!plan("q202_hll_distinct").contains("CartesianProduct"))
    // q203: every LPA argmax window partitions by node; the vocab joins
    // are broadcast (Zipf-bounded top-V), never a cartesian over data
    assert(!plan("q203_token_communities").contains("CartesianProduct"))
    // q204: same no-explode contract as q194 — one aggregation pass
    val p204 = plan("q204_effective_rank")
    assert(!p204.contains("Generate"),
      "effective rank must not explode the vectors:\n" +
        p204.linesIterator.take(10).mkString("\n"))
    // q205: the profiler reads lineitem ONCE — a scan per column is the
    // anti-pattern columnProfile exists to avoid
    val p205 = plan("q205_column_profile")
    val scans = p205.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"profiler must scan once, saw $scans scans")
    // q206/q207: rank and cumulative windows partition by their group key
    Seq("q206_theil_sen", "q207_weighted_median").foreach { qn =>
      val ws = SparkEntry.queries(qn)(spark, sf)
        .queryExecution.sparkPlan.collect { case w: WindowExec => w }
      assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
        s"$qn windows must partition by key")
    }
    // q208/q209: CDC passes are key-equi-joins — never a cartesian or
    // nested loop over either snapshot
    Seq("q208_snapshot_diff", "q209_changeset_apply").foreach { qn =>
      val p = plan(qn)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$qn must stay key-joined:\n" + p.linesIterator.take(8).mkString("\n"))
    }
    // q210: z-key top-k is TakeOrderedAndProject, never a global sort
    assert(plan("q210_zorder_key").contains("TakeOrderedAndProject"))
    // q213: prefix-filtered join is gram-keyed — no cartesian, no nested
    // loop, and no global rank window (the prefix sort is in-row)
    val p213 = plan("q213_ppjoin_pairs")
    assert(!p213.contains("CartesianProduct") &&
      !p213.contains("BroadcastNestedLoopJoin"))
    val w213 = SparkEntry.queries("q213_ppjoin_pairs")(spark, sf)
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(w213.isEmpty, "ppjoin prefix must not use a rank window")
    // q211: the whole correlation matrix is ONE scan + one wide aggregate
    val p211 = plan("q211_corr_matrix")
    val scans211 = p211.linesIterator.count(_.contains("Scan parquet"))
    assert(scans211 == 1, s"corr matrix must scan once, saw $scans211")
  }

  test("r10 rank stats: every global window feeds on an aggregated grid, not rows") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
    // q216/q218/q225/q226 run cumulative windows — legal at 100 TB only
    // because the window input is the distinct-VALUE grid (an aggregate
    // output), never the data. A WindowExec whose subtree has no aggregate
    // below it means someone re-pointed the window at raw rows.
    Seq("q216_mann_whitney", "q218_length_gini", "q225_kruskal_wallis",
      "q226_decision_stump", "q242_pr_curve", "q243_gains_table",
      "q232_conversion_latency", "q245_kaplan_meier",
      "q240_pareto_coverage").foreach { q =>
      val sp = SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan
      val wins = sp.collect { case w: WindowExec => w }
      assert(wins.nonEmpty, s"$q expects its grid window")
      wins.foreach { w =>
        val aggBelow = w.child.collect {
          case h: HashAggregateExec => h: Any
          case o: ObjectHashAggregateExec => o: Any
        }
        assert(aggBelow.nonEmpty, s"$q: window consumes un-aggregated rows:\n$w")
      }
    }
  }

  test("r10 association/audit: pair joins stay equi-keyed, no cartesian products") {
    // q221/q222 pair expansion must meet through the basket equi-join
    // (shuffle or broadcast HASH join); the only nested-loop allowed is
    // the 1-row totals broadcast. q227's NOT EXISTS must be a LeftAnti
    // hash join; q229's merge one FullOuter equi-join.
    Seq("q221_brand_lift", "q222_brand_triangles", "q227_fk_orphan_audit",
      "q229_scd2_history").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian product")
    }
    assert(plan("q227_fk_orphan_audit").contains("LeftAnti"))
    // EliminateOuterJoin legally splits the shared FullOuter into one-sided
    // outer joins per branch (each filter kills one null side) — what must
    // survive is SOME outer equi-join, two branches, and hash joins only
    val p229 = plan("q229_scd2_history")
    assert(p229.contains("Outer"), "scd2 branches must keep outer-join semantics")
    assert(p229.contains("Union"), "closed + open projections union")
  }

  test("r10 temporal: per-entity windows are partitioned, grids are calendar-bounded") {
    // q223's lag and q224's WMA run per-user / per-type frames — a global
    // (unpartitioned) sort window over events would be the scale killer.
    val p223 = plan("q223_interevent_gaps")
    assert(p223.contains("windowspecdefinition(user_id"),
      "gap lag must be partitioned by user")
    val p224 = plan("q224_wma_trend")
    assert(p224.contains("windowspecdefinition(event_type"),
      "WMA lags must be partitioned by key")
    // q231/q235 materialize the calendar via explode(sequence(bounds)) —
    // the 1-row bounds side may nested-loop, but never a true cartesian
    Seq("q231_gap_fill", "q235_dow_seasonality").foreach { q =>
      assert(!plan(q).contains("CartesianProduct"), q)
    }
  }

  test("q251-q264 batch: the new operators keep their scale shapes") {
    // q253: equi-depth bins come from a 1-row percentile aggregate —
    // NO ntile/rank window and no global sort anywhere
    val p253 = plan("q253_equidepth_bins")
    assert(!p253.contains("Window"), "equi-depth must not plan an ntile")
    // q257/q258/q264: window-free affinity chain (TopKAgg partials +
    // TakeOrderedAndProject for the global top-20s)
    val p257 = plan("q257_item_cooccurrence")
    assert(p257.contains("TakeOrderedAndProject"), "top-20 must not global-sort")
    assert(!p257.contains("CartesianProduct"))
    Seq("q258_similar_items", "q264_event_paths").foreach { q =>
      val p = plan(q)
      assert(!p.contains("WindowExec") && !p.contains("RunningWindow"),
        s"$q must stay window-free (TopKAgg)")
    }
    // q259: the EWMA fold is in-row — no window, no cross join
    val p259 = plan("q259_ewma_daily")
    assert(!p259.contains("Window") && !p259.contains("CartesianProduct"))
    // q252/q255: marginal joins must not hard-hint broadcast of the
    // category tables in the logical plan beyond the bounded 1-row stats
    val l252 = SparkEntry.queries("q252_target_encoding")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!l252.contains("CartesianProduct"))
  }

  test("q265-q271: margin mining broadcasts bounded sides; rank ops stay window-free") {
    // q265: the all-pairs stage is the DOCUMENTED bounded-sample broadcast
    // (the q33 contract) — never an unhinted cartesian
    val p265 = plan("q265_mutual_margin")
    assert(p265.contains("BroadcastNestedLoopJoin"),
      "bounded sides should broadcast")
    assert(!p265.contains("CartesianProduct"))
    // q266/q271: reservoir + Hill order statistics rank via TopKAgg —
    // no per-group sort window anywhere
    Seq("q266_weighted_reservoir", "q271_hill_tail").foreach { q =>
      val p = plan(q)
      assert(!p.contains("WindowExec") && !p.contains("RunningWindow"),
        s"$q must stay window-free (TopKAgg)")
    }
  }

  test("q282-q286: round-11 operators keep their scale shapes") {
    // q282: all B replicate sums ride in ONE mergeable buffer per group
    // (PoissonBootstrapAgg, an ObjectHashAggregate) — no replicate-grid
    // join of ANY kind survives in the plan since the r12 rework
    val p282 = plan("q282_bootstrap_ci")
    assert(p282.contains("ObjectHashAggregate"),
      "replicate sums must ride the mergeable bootstrap buffer")
    assert(!p282.contains("BroadcastNestedLoopJoin") &&
      !p282.contains("CartesianProduct"),
      "the n×B replicate expansion must not reappear as a join")
    // q283: ER candidates join EQUI-KEYED on the block — a cartesian or
    // nested-loop here is the all-pairs explosion blocking exists to stop
    val p283 = plan("q283_er_name_match")
    assert(!p283.contains("CartesianProduct"))
    assert(!p283.contains("BroadcastNestedLoopJoin"),
      "block join must be an equi-join, not a nested loop")
    // q284: the candidate stage inherits q33's bounded-broadcast contract;
    // greedy rounds are checkpointed so no cartesian can survive into them
    val p284 = plan("q284_mmr_rerank")
    assert(!p284.contains("CartesianProduct"))
    // q285/q286: the only non-equi join is the broadcast 1-row state count
    Seq("q285_markov_stationary", "q286_dp_noisy_counts").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q must not go cartesian")
    }
    // q287: inlier counting scans against the BROADCAST model table;
    // q289's per-round joins and q291's pair-set joins stay equi-keyed
    val p287 = plan("q287_ransac_fit")
    assert(p287.contains("BroadcastNestedLoopJoin"),
      "the bounded model table must broadcast")
    assert(!p287.contains("CartesianProduct"))
    Seq("q288_simpson_audit", "q289_personalized_ppr",
        "q290_asof_nearest", "q291_dedup_agreement",
        "q292_wasserstein_drift", "q293_split_conformal",
        "q294_cuped", "q295_aa_calibration", "q296_sequential_monitor",
        "q297_vocab_coverage", "q298_capture_recapture",
        "q299_kish_ess", "q301_cuped_stratified", "q302_sprt",
        "q303_heaps_law", "q304_jackknife_ratio", "q305_cmh_test",
        "q306_eb_shrinkage", "q307_embedding_mmd", "q308_benford_by_group",
        "q309_media_ahash_dedup", "q310_diff_in_diff",
        "q311_incremental_agg", "q312_rfm_segments", "q313_srm_check",
        "q314_cohort_ltv", "q315_markov_attribution",
        "q316_ct_langid").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q must not go cartesian")
    }
    // q300: the pair join is EQUI-KEYED on the window fingerprint and the
    // island-stitching window is partitioned by (pair, diagonal) — a
    // nested-loop or cartesian here is the all-pairs substring explosion
    val p300 = plan("q300_exact_substring")
    assert(!p300.contains("CartesianProduct") &&
      !p300.contains("BroadcastNestedLoopJoin"),
      "fingerprint join must stay equi-keyed")
  }

  test("q318/q319: cross-run store probe and classifier gate stay keyed") {
    // q318: bucket-minimum aggregate and store probe are (band, sig)-keyed
    // equi-joins — a cartesian/nested-loop here is the all-pairs explosion
    // the signature store exists to avoid
    val p318 = plan("q318_cross_run_dedup")
    assert(!p318.contains("CartesianProduct") &&
      !p318.contains("BroadcastNestedLoopJoin"),
      "store probe must stay (band, sig) equi-keyed")
    // q319: the only cross joins are the bounded model broadcasts (NB
    // classes, LID profile row, vocab size); doc-side composition is
    // id-keyed — no cartesian anywhere
    val p319 = plan("q319_classifier_gate")
    assert(!p319.contains("CartesianProduct"), "gate must not go cartesian")
  }

  test("q320: sketch profiler has NO Expand node (the q205 term it exists to remove)") {
    val p205 = plan("q205_column_profile")
    assert(p205.contains("Expand"),
      "exact multi-distinct q205 pays the Expand (the priced baseline)")
    val p320 = plan("q320_profile_sketch")
    assert(!p320.contains("Expand"),
      "HLL profiler must not replicate rows per column")
    assert(p320.contains("ObjectHashAggregate"),
      "per-column HLL registers must ride the mergeable partial-agg tree")
  }

  test("q317: rank sketch is a mergeable partial aggregate; audit join broadcasts the estimate table") {
    val p = plan("q317_sketch_quantile")
    // the bottom-k sample buffer must ride Spark's partial-agg tree
    // (ObjectHashAggregate for the udaf) — a sort-based fallback or a
    // window here would mean the sketch shuffles rows, not buffers
    assert(p.contains("ObjectHashAggregate"),
      "bottom-k sample must be a mergeable (partial) aggregate")
    // the rank-audit scan joins the |groups|x5 estimate table broadcast —
    // never a shuffle of the event side on a non-key, never cartesian
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "estimate table must broadcast into the audit scan")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "audit join must stay equi-keyed")
  }

  test("q321: FS pair space is the block-keyed join; no cartesian anywhere") {
    // the candidate join must shuffle on p_brand (the Σ|b|² bound); the
    // only nested-loop joins are the 1-row u-stat broadcasts
    val p = plan("q321_fs_linkage")
    assert(!p.contains("CartesianProduct"), "no unbounded cartesian")
    // every BroadcastNestedLoopJoin in this plan is a 1-row stats frame;
    // the pair join itself must appear as an equi-join on the block key
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      "blocked pair join must stay brand-equi-keyed")
  }

  test("q322/q323/q324: discovery and OPE queries are pure keyed aggregates") {
    // q322 collapses to the (context, action) cell grid — no window, no
    // cartesian; the context rollup is a keyed equi-join
    val p322 = plan("q322_ips_eval")
    assert(!p322.contains("WindowExec") && !p322.contains("CartesianProduct"),
      "IPS must stay on the cell grid")
    // q323/q324: keyed aggregates / distinct-projections + left equi-join
    // — a window or cartesian here breaks the cell-bounded cost claim
    val p323 = plan("q323_fd_profile")
    assert(!p323.contains("WindowExec") && !p323.contains("CartesianProduct")
      && !p323.contains("BroadcastNestedLoopJoin"),
      "FD profiler is aggregate-only")
    val p324 = plan("q324_ind_discovery")
    assert(!p324.contains("WindowExec") && !p324.contains("CartesianProduct")
      && !p324.contains("BroadcastNestedLoopJoin"),
      "IND discovery must stay value-equi-keyed")
  }

  test("q325: backtest joins ride the day grid; scans prune to the two referenced columns") {
    // both self-joins key on the calendar day; the only nested-loop is
    // the broadcast of the 1-row train-scale frame
    val p = plan("q325_forecast_backtest")
    assert(!p.contains("CartesianProduct") && !p.contains("WindowExec"),
      "lag must come from the day-grid self-join, not a window")
    assert(p.contains("ReadSchema: struct<o_totalprice:double,o_orderdate")
      && !p.contains("o_orderpriority"),
      "scan must prune to (o_totalprice, o_orderdate)")
  }

  test("q326/q327/q328: graph rounds, cardinality audit and HW fold keep their scale shapes") {
    // q326: rounds are checkpointed, so the final plan is the node-keyed
    // hub⋈auth join over checkpointed scans — no cartesian may survive
    val p326 = plan("q326_hits")
    assert(!p326.contains("CartesianProduct"), "HITS must stay node-keyed")
    // q327: two per-key count aggregates + a key join + a 1-row reduce
    val p327 = plan("q327_join_size_estimate")
    assert(!p327.contains("WindowExec") && !p327.contains("CartesianProduct")
      && !p327.contains("BroadcastNestedLoopJoin"),
      "cardinality audit must stay key-equi-joined")
    // q328: one keyed collect + in-row fold — a WindowExec or cartesian
    // here would mean the recurrence left the row
    val p328 = plan("q328_holt_winters")
    assert(!p328.contains("WindowExec") && !p328.contains("CartesianProduct"),
      "HW fold must stay in-row per key")
    assert(p328.contains("ObjectHashAggregate"),
      "day series must ride the partial-agg collect")
  }

  test("q329/q330: span dedup stays tile-keyed; the trainer output is the constant-size trace") {
    // q329: ONE tile-keyed min-aggregate + ONE tile equi-join + per-doc
    // rebuild — a window, cartesian or nested-loop here means the
    // keep-first choice degenerated to pairwise work
    val p329 = plan("q329_c4_span_dedup")
    assert(!p329.contains("WindowExec") && !p329.contains("CartesianProduct")
      && !p329.contains("BroadcastNestedLoopJoin"),
      "span dedup must stay tile-keyed")
    assert(p329.contains("ObjectHashAggregate"),
      "doc rebuild must ride the partial-agg collect")
    // q330: the engine-side work is 7 constant-width aggregate passes;
    // what the query RETURNS is the step trace — a driver-built
    // constant-size model artifact, so its plan must be a local relation
    // (anything bigger would mean per-doc data leaked into the output)
    val p330 = plan("q330_logistic_gate")
    assert(p330.contains("LocalTableScan"),
      "trainer output must be the constant-size step trace")
  }

  test("q331: BPE rounds ride 1-row broadcasts over checkpointed vocab tables") {
    // every join in the merge-table union is a broadcast of a 1-row
    // artifact (best pair / vocab count) against the Heaps-bounded
    // word-type table — a SortMergeJoin, window or cartesian here means a
    // round outgrew its vocab bound
    val p = plan("q331_bpe_train")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin")
      && !p.contains("WindowExec"),
      "BPE rounds must stay 1-row-broadcast-joined")
  }

  test("q332: calibration is one scoring aggregate + 1-row broadcasts") {
    // the bin table is a <= 10-row aggregate; ECE/Brier ride broadcast
    // 1-row artifacts — a shuffle join or window here means per-doc data
    // escaped the aggregate
    val p = plan("q332_model_calibration")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin")
      && !p.contains("WindowExec"),
      "calibration must stay aggregate-shaped")
    assert(p.contains("HashAggregate"), "bin table must be an aggregate")
  }

  test("q333: Shapley grid joins are coalition-bounded, journey window is per-user") {
    // the only window is the per-user journey cut; every grid join rides
    // a broadcast of the 2^n coalition/mask artifacts — a cartesian or a
    // global (unpartitioned) window means the bound was lost
    val p = plan("q333_shapley_attribution")
    assert(!p.contains("CartesianProduct"),
      "coalition joins must broadcast their bounded side")
    assert(!p.contains("PartitionBy: []"), "journey window must be keyed")
  }

  test("q334: BPE encode is one word-keyed dictionary join + per-doc aggregate") {
    val p = plan("q334_bpe_encode")
    assert(!p.contains("CartesianProduct") && !p.contains("WindowExec"),
      "encode must stay word-keyed")
    assert(p.contains("HashAggregate"), "per-doc stats must aggregate")
  }

  test("q335: uplift windows ride aggregated grids; joins broadcast 1-row artifacts") {
    // the two global cumulations run over the distinct-score grid and
    // the <= nBins bin grid — both downstream of HashAggregate — and the
    // totals/final/coefficient joins broadcast 1-row tables
    val p = plan("q335_uplift_qini")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "uplift joins must broadcast their bounded side")
    assert(p.contains("HashAggregate"),
      "score grid must be aggregated before any window")
  }

  test("q336: isotonic interval table is grid-bounded; windows ride the grid") {
    // the i<=j interval join must broadcast the LUT-bounded grid side,
    // and every window runs over grid rows, never corpus rows
    val p = plan("q336_isotonic_calibration")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "interval join must broadcast the grid")
    assert(p.contains("HashAggregate"),
      "scores must aggregate to the grid before the interval join")
  }

  test("q337: coreset output is the constant-size pick trace; rounds are narrow passes") {
    // like the q330 weight trace: the result is k driver-assembled rows.
    // The per-round work (literal-vector dmin update + 1-row argmax) has
    // already run by now — each round is a checkpointed narrow map over
    // the point set with NO join (the pick ships as a literal), so the
    // trace plan carrying anything but a local scan means selection
    // leaked into the output query
    val p = plan("q337_kcenter_coreset")
    assert(p.contains("LocalTableScan"),
      "coreset output must be the constant-size pick trace")
    assert(!p.contains("Join") && !p.contains("Exchange"),
      "no join/shuffle may survive into the k-row artifact")
  }

  test("q338: PII census is one scan, no join/window, detector counts codegen per row") {
    // all five regexp_count columns ride the single document scan; the
    // stack to long form is a Generate, and the only shuffle is the
    // (source, type)-keyed aggregate — a Join or Window here means the
    // census stopped being a narrow audit pass
    val p = plan("q338_pii_census")
    assert(!p.contains("Join") && !p.contains("WindowExec"),
      "census must stay a narrow scan + keyed aggregate")
    assert(p.contains("HashAggregate"), "keyed (source,type) aggregate")
  }

  test("q339: sampled top terms aggregate k-bounded buffers; rank window is keyed") {
    // the occurrence stream must collapse through the mergeable bottom-k
    // aggregator (ObjectHashAggregate ships one <=k buffer per key per
    // map task); the final rank orders <=k sampled-term rows per key —
    // a global (unpartitioned) window or a join means the O(k) state
    // contract broke
    val p = plan("q339_sampled_topk_terms")
    assert(p.contains("ObjectHashAggregate"),
      "bottom-k sample must run as a partial-aggregating udaf")
    assert(!p.contains("PartitionBy: []"), "rank window must be keyed")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "no join may enter the sampled finish stage")
  }

  test("q341: join-IVM audit is ONE equi-join + conditional cells, no re-scan per term") {
    // the four IVM cells and the recompute all come from conditional sums
    // over a single orders-lineitem equi-join — a second Join or a
    // cartesian means the audit started re-scanning per delta term
    val p = plan("q341_join_ivm")
    assert(!p.contains("CartesianProduct"), "equi-join only")
    assert(p.contains("HashAggregate"), "conditional cell sums must aggregate")
    // exactly one orders scan and one lineitem scan — per-cell
    // formulations re-scan the join inputs once per delta term
    assert("Scan parquet".r.findAllIn(p).size == 2,
      "one scan per join side, never per-cell re-scans")
  }

  test("q349/q350/q351: round-15 text operators stay keyed; only 1-row frames broadcast") {
    // q349 modified-KN: model joins are bigram-/history-/continuation-
    // keyed; the only nested-loop is the broadcast 1-row (T,V,n1..n4)
    // count-of-counts frame
    val p349 = plan("q349_mkn_xent")
    assert(!p349.contains("CartesianProduct"), "mkn model joins must stay keyed")
    // q350 unigram-LM: the Viterbi DP is an in-row fold — no join, window
    // or shuffle may appear between the cands aggregate and the em
    // explode; the piece-keyed model joins stay equi-keyed
    val p350 = plan("q350_unigram_lm_em")
    assert(!p350.contains("CartesianProduct"), "unigram-LM joins must stay keyed")
    assert(!p350.contains("Window"), "the DP must be an in-row fold, not a window")
    // q352 fertility: same DP discipline as q350 plus ONE word-keyed
    // apply join — still window-free, still no cartesian
    val p352 = plan("q352_unigram_fertility")
    assert(!p352.contains("CartesianProduct") && !p352.contains("Window"),
      "fertility apply join must stay keyed; DP stays an in-row fold")
    // q354 min-k%: the bottom-k take is an in-row fold over the doc's
    // own (lp, occ) array — window-free; model joins keyed
    val p354 = plan("q354_mink_prob")
    assert(!p354.contains("CartesianProduct") && !p354.contains("Window"),
      "min-k take must be an in-row fold over doc-bounded arrays")
    // q355 unimax: one source-keyed aggregate; the only window runs
    // over the |sources|-bounded cap grid
    val p355 = plan("q355_unimax_mix")
    assert(!p355.contains("CartesianProduct"), "unimax must stay keyed")
    // q353 prune: the only window is the cumulative sum over the
    // DISTINCT usage-count grid (Zipf-bounded); both DP passes stay
    // in-row folds, joins keyed
    val p353 = plan("q353_unigram_prune")
    assert(!p353.contains("CartesianProduct"), "prune joins must stay keyed")
    // q351 line dedup: ONE line-keyed equi-join (df table back onto the
    // inventory); a nested-loop or cartesian is the all-pairs explosion
    // the df aggregate exists to avoid
    val p351 = plan("q351_line_dedup")
    assert(!p351.contains("CartesianProduct") &&
      !p351.contains("BroadcastNestedLoopJoin"),
      "line-frequency join must stay equi-keyed")
    assert(!p351.contains("Window"), "rebuild must be an aggregate, not a window")
  }

  test("q356-q359: round-16 operators stay keyed, window-free, cartesian-free") {
    // q356 DoReMi: two model equi-joins + one source-keyed aggregate;
    // the round ladder runs on localCheckpointed |sources|-row frames —
    // the only nested loops are broadcast 1-row (vocab / T,V / k / sum)
    // frames, never a data-scale cartesian; no window anywhere
    val p356 = plan("q356_doremi_weights")
    assert(!p356.contains("CartesianProduct"), "doremi joins must stay keyed")
    assert(!p356.contains("Window"), "the round ladder is grid arithmetic, not a window")
    // q357 WordPiece: pair/symbol counts are keyed aggregates over the
    // word-TYPE table; the argmax is a 1-row TakeOrdered, the rewrite a
    // broadcast of that 1 row
    val p357 = plan("q357_wordpiece_train")
    assert(!p357.contains("CartesianProduct"), "wordpiece counts must stay keyed")
    assert(!p357.contains("Window"), "the argmax is a limit, not a window")
    // q358 encode: one word-keyed dictionary join + per-doc aggregate
    val p358 = plan("q358_wordpiece_encode")
    assert(!p358.contains("CartesianProduct") && !p358.contains("Window"))
    // q359 paragraph minhash: the line-df join and every pair-stage join
    // stay equi-keyed — a cartesian is the all-pairs explosion both
    // composed operators exist to avoid
    val p359 = plan("q359_paragraph_minhash")
    assert(!p359.contains("CartesianProduct"), "clean-text pair stage must stay keyed")
    assert(!p359.contains("Window"), "rebuild and pair stages are aggregates")
    // q360 Gumbel-top-k: model joins keyed; the selection is a
    // TakeOrdered, and the only window orders the k SELECTED rows
    val p360 = plan("q360_dsir_resample")
    assert(!p360.contains("CartesianProduct"), "resample joins must stay keyed")
    assert(p360.contains("TakeOrderedAndProject"),
      "top-k must plan as TakeOrdered, not a global sort")
    // q361 decontamination: ONE tile-keyed left join; a cartesian or
    // nested loop is the train x eval explosion the tile join avoids
    val p361 = plan("q361_decontam_rebuild")
    assert(!p361.contains("CartesianProduct") &&
      !p361.contains("BroadcastNestedLoopJoin"),
      "eval-tile join must stay equi-keyed")
    assert(!p361.contains("Window"), "rebuild must be an aggregate")
    // q362 prototypicality: the only nested loop is the nlist-row
    // centroid broadcast (the q142 contract); the cut windows run over
    // per-cluster VALUE grids — every Window node must carry the cid
    // partition key (an unpartitioned window here would be data-scale)
    val p362 = plan("q362_proto_band")
    assert(!p362.contains("CartesianProduct"), "band cuts must stay grid-bounded")
    val winLines = p362.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("cid")),
      s"every q362 window must be cid-partitioned:\n${winLines.mkString("\n")}")
    // q363 intra-doc dedup: every shuffle carries the doc id — no
    // cross-doc structure at all; window-free, cartesian-free
    val p363 = plan("q363_intradoc_line_dedup")
    assert(!p363.contains("CartesianProduct") && !p363.contains("Window"),
      "intra-doc dedup must stay doc-keyed aggregates")
    // q364 held-out xent: train-side model joins + the LEFT ladder
    // joins all stay bigram-/history-/continuation-keyed; the only
    // nested loop is the broadcast 1-row (T, V) frame
    val p364 = plan("q364_heldout_kn_xent")
    assert(!p364.contains("CartesianProduct"), "ladder joins must stay keyed")
    assert(!p364.contains("Window"), "pooled xent is an aggregate")
  }

  test("q365-q368: continuation operators stay keyed; grids stay bounded") {
    // q365 char coverage: the ONLY window runs over the distinct-char
    // grid (alphabet-bounded, constant in corpus size); the kept-set
    // join back to the per-source aggregate is char-keyed; the two
    // nested loops are broadcast 1-row (total / alphabet-size) frames
    val p365 = plan("q365_char_coverage")
    assert(!p365.contains("CartesianProduct"), "kept-set join must stay keyed")
    assert(p365.contains("Window"), "the ranking window over the char grid")
    // q366 bloom census: per-bit first-setter tables are mBits-bounded;
    // flags are one bit-keyed join + type-keyed aggregate per k —
    // window-free, cartesian-free
    val p366 = plan("q366_bloom_dedup")
    assert(!p366.contains("CartesianProduct") && !p366.contains("Window"),
      "bloom census must be keyed aggregates over bounded bit tables")
    // q367 pair BLEU: gram tables exist only for pair docs (semi-join);
    // clipping is gram-keyed; everything after the pair set is
    // |pairs|-proportional — no cartesian, no window
    val p367 = plan("q367_pair_bleu")
    assert(!p367.contains("CartesianProduct") && !p367.contains("Window"),
      "clipped counts must stay gram-keyed")
    // q368 scaling fit: every per-carve model is a filtered re-aggregate;
    // ladder joins stay bigram-/history-/continuation-keyed; the only
    // nested loops are broadcast 1-row (sizes / fit) frames
    val p368 = plan("q368_scaling_fit")
    assert(!p368.contains("CartesianProduct"), "ladder joins must stay keyed")
    assert(!p368.contains("Window"), "curve and fit are aggregates")
    // q369 per-group models: EVERY model join carries the group key —
    // the computation shards by language with zero cross-group traffic;
    // the sizes table is the one broadcast (|groups| rows)
    val p369 = plan("q369_lang_kn_xent")
    assert(!p369.contains("CartesianProduct") &&
      !p369.contains("BroadcastNestedLoopJoin"),
      "grouped model joins must all be group-keyed equi-joins")
    assert(!p369.contains("Window"), "pooled xent is an aggregate")
    // q370 JM EM: component probabilities are one keyed join pass over
    // the held-out TYPE table; each round is a broadcast 1-row lambda +
    // one aggregate — no corpus re-scan, no window
    val p370 = plan("q370_jm_lambda_em")
    assert(!p370.contains("CartesianProduct"), "EM rounds ride 1-row broadcasts")
    assert(!p370.contains("Window"), "rounds are aggregates")
    // q371 Min-K%++: moments come from the grid + per-history TYPE
    // aggregates (never |histories|x|V|); joins stay w1-/bigram-keyed;
    // the bottom-k take is the q354 in-row fold — window-free
    val p371 = plan("q371_minkpp_prob")
    assert(!p371.contains("CartesianProduct"), "moment joins must stay keyed")
    assert(!p371.contains("Window"), "the bottom-k take is an in-row fold")
    // q372 t-closeness: the cumulative walk runs over groups x the
    // m-row VALUE grid and every window carries the quasi-identifier
    // partition keys — an unpartitioned window here would sort the
    // whole release table through one task
    val p372 = plan("q372_t_closeness")
    assert(!p372.contains("CartesianProduct"), "grid joins must broadcast")
    val w372 = p372.linesIterator.filter(_.contains("Window")).toSeq
    assert(w372.nonEmpty && w372.forall(_.contains("c_mktsegment")),
      s"every q372 window must be QI-partitioned:\n${w372.mkString("\n")}")
    // q373 JL recall: the sign matrix is a 1-row broadcast; projection
    // is narrow; rank windows are per-query (the q33 contract); no
    // CartesianProduct may appear (the knn broadcasted-query nested
    // loop is the allowed BNLJ form)
    val p373 = plan("q373_jl_recall")
    assert(!p373.contains("CartesianProduct"), "knn sides must broadcast")
    val w373 = p373.linesIterator.filter(_.contains("Window")).toSeq
    assert(w373.nonEmpty && w373.forall(_.contains("query_id")),
      s"q373 rank windows must be query-partitioned:\n${w373.mkString("\n")}")
  }

  test("q340: max-coverage output is the constant-size pick trace") {
    // like q337: the greedy's per-round anti-join + argmax already ran;
    // the result is <=k driver-assembled rows
    val p = plan("q340_max_coverage")
    assert(p.contains("LocalTableScan"),
      "coverage output must be the pick trace")
    assert(!p.contains("Join") && !p.contains("Exchange"),
      "no join/shuffle may survive into the k-row artifact")
  }
}
