package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft.table
import graft.operators.{MlOps, Relational, Stats}

/** Round-10 warehouse/quality batch: the operational side of running a
  * lakehouse load — a decision-stump feature screen, referential-integrity
  * audit, Benford first-digit anomaly screen, SCD Type-2 history apply,
  * and the explicit GROUPING SETS census that completes the
  * rollup/cube/grouping_id family.
  *
  * Determinism: stump impurity is pure algebra on grid-exact counts; the
  * Benford expectation (libm ln) quantizes to 6dp (the q219 discipline);
  * SCD2 compares payloads via the shared null-safe md5 fingerprint used
  * by the q208/q209 CDC pair, against the same deterministic next-load. */
object WarehouseQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q227's declared FK edges: (label, child, fk, parent, pk). */
  private val fkEdges = Seq(
    ("lineitem.l_orderkey -> orders.o_orderkey", "lineitem", "l_orderkey",
      "orders", "o_orderkey"),
    ("lineitem.l_partkey -> part.p_partkey", "lineitem", "l_partkey",
      "part", "p_partkey"),
    ("lineitem.l_suppkey -> supplier.s_suppkey", "lineitem", "l_suppkey",
      "supplier", "s_suppkey"),
    ("orders.o_custkey -> customer.c_custkey", "orders", "o_custkey",
      "customer", "c_custkey"),
    ("customer.c_nationkey -> nation.n_nationkey", "customer", "c_nationkey",
      "nation", "n_nationkey"),
    ("supplier.s_nationkey -> nation.n_nationkey", "supplier", "s_nationkey",
      "nation", "n_nationkey"))

  /** q229's SCD2 payload columns — must match [[MlQueries.docHashSql]]. */
  private val scdCols = Seq("text", "lang", "source", "n_chars")

  val queries: Map[String, Q] = Map(

    // Depth-1 decision stump: the single document-length threshold that
    // best separates English from everything else — the "is this feature
    // predictive at all" screen before training anything. Grid-exact
    // split counts, algebra-only impurity, smallest-threshold tie-break.
    // Incremental aggregate maintenance (classic warehouse IVM): the
    // maintained gold state (orders strictly before the newest load day)
    // merged with that day's delta must equal the full recompute —
    // count/sum per priority, all-DECIMAL until the terminal cast, with
    // the consistency flag materialized per row. The aggregate-level
    // companion to the row-level K6 upsert contract.
    "q311_incremental_agg" -> ((s, d) => {
      val z = lit(0).cast(org.apache.spark.sql.types.DecimalType(12, 2))
      val o = table(s, d, "orders")
        .crossJoin(broadcast(table(s, d, "orders")
          .agg(max(col("o_orderdate")).as("__mx"))))
        .select(col("o_orderpriority"), col("o_orderdate"), col("__mx"),
          col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(12, 2)).as("__v"))
      def agg(dfx: org.apache.spark.sql.DataFrame, n: String, sm: String) =
        dfx.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as(n), sum(col("__v")).as(sm))
      val base = agg(o.where(col("o_orderdate") < col("__mx")), "__nb", "__sb")
      val delta = agg(o.where(col("o_orderdate") === col("__mx")), "__nd", "__sd")
      val full = agg(o, "n_full", "__sf")
      base.join(delta, Seq("o_orderpriority"), "full_outer")
        .select(col("o_orderpriority"),
          (coalesce(col("__nb"), lit(0L)) + coalesce(col("__nd"), lit(0L)))
            .as("n_merged"),
          (coalesce(col("__sb"), z) + coalesce(col("__sd"), z)).as("__sm"))
        .join(full, "o_orderpriority")
        .select(col("o_orderpriority"), col("n_full"),
          col("__sf").cast("double").as("sum_full"), col("n_merged"),
          col("__sm").cast("double").as("sum_merged"),
          (col("n_merged") === col("n_full") &&
            col("__sm").cast("double") === col("__sf").cast("double"))
            .as("consistent"))
    }),

    "q226_decision_stump" -> ((s, d) =>
      MlOps.decisionStump(
        table(s, d, "documents"), "n_chars", col("lang") === "en")),

    // JOIN-view incremental maintenance (the bilinear delta rule): for a
    // revenue-per-priority view over orders ⋈ lineitem with BOTH sides
    // carrying deltas (ΔO = orderkey % 7 = 0, ΔL = linenumber >= 5), the
    // maintained value v_base + (ΔO⋈L_b + O_b⋈ΔL + ΔO⋈ΔL) must equal the
    // full recompute — Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, the join companion
    // to q311's aggregate IVM. The audit materializes all four cells
    // from ONE flagged join + conditional DECIMAL sums (a production
    // maintainer computes only the three delta terms, each joining a
    // small delta side — broadcastable; the full recompute exists here
    // BECAUSE this is the consistency check). Equality is tested on the
    // exact DECIMAL sums before any cast to double.
    "q341_join_ivm" -> ((s, d) => {
      val dt = org.apache.spark.sql.types.DecimalType(12, 2)
      val z = lit(0).cast(dt)
      val o = table(s, d, "orders").select(col("o_orderkey"),
        col("o_orderpriority"),
        (pmod(col("o_orderkey"), lit(7)) === 0).as("__do"))
      val l = table(s, d, "lineitem").select(col("l_orderkey"),
        col("l_extendedprice").cast(dt).as("__v"),
        (col("l_linenumber") >= 5).as("__dl"))
      def cell(p: org.apache.spark.sql.Column) =
        sum(when(p, col("__v")).otherwise(z))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(cell(!col("__do") && !col("__dl")).as("__vb"),
          cell(col("__do") && !col("__dl")).as("__vdo"),
          cell(!col("__do") && col("__dl")).as("__vdl"),
          cell(col("__do") && col("__dl")).as("__vdd"),
          sum(col("__v")).as("__vf"))
        .select(col("o_orderpriority"),
          col("__vb").cast("double").as("v_base"),
          col("__vdo").cast("double").as("dv_orders"),
          col("__vdl").cast("double").as("dv_lines"),
          col("__vdd").cast("double").as("dv_both"),
          (col("__vb") + col("__vdo") + col("__vdl") + col("__vdd"))
            .cast("double").as("v_incr"),
          col("__vf").cast("double").as("v_full"),
          ((col("__vb") + col("__vdo") + col("__vdl") + col("__vdd"))
            === col("__vf")).as("consistent"))
    }),

    // Referential-integrity audit over the schema's six FK edges: child
    // rows whose key has no parent (LEFT ANTI = decorrelated NOT
    // EXISTS), as counts and shares — the load-gate data-quality sheet.
    "q227_fk_orphan_audit" -> ((s, d) =>
      Relational.fkAudit(fkEdges.map { case (name, c, fk, p, pk) =>
        (name, table(s, d, c), fk, table(s, d, p), pk)
      }).orderBy(col("relationship"))),

    // Benford first-digit screen on order totals: observed leading-digit
    // counts vs n·log10(1+1/d), with per-digit chi-square terms — the
    // classic fabricated-amounts detector. Digit extraction in exact
    // integer cents; libm-touched outputs rounded to 6dp.
    "q228_benford_screen" -> ((s, d) =>
      Stats.benfordScreen(table(s, d, "orders"), "o_totalprice")),

    // SCD Type-2 apply: documents (load day 1) merged with the
    // deterministic q208 next-load (day 2) into a versioned history —
    // deletes close, inserts open, changes do both, unchanged keys keep
    // their original valid_from. One full outer join, fingerprint
    // compare, two projections.
    "q229_scd2_history" -> ((s, d) => {
      val old = table(s, d, "documents")
      Relational.scd2Apply(old, MlQueries.mutatedDocs(old), "doc_id",
        scdCols, t1 = 1L, t2 = 2L)
    }),

    // Declarative expectation suite (Deequ pattern): five typed checks
    // compiled to ONE aggregation pass + an in-row unpivot. The bounds
    // check is calibrated to fail its 0.999 threshold on purpose so the
    // suite demonstrates a mixed verdict, not a vacuous all-pass.
    "q256_expectation_suite" -> ((s, d) => {
      import graft.operators.Expectations._
      evaluate(table(s, d, "orders"), Seq(
        Completeness("o_custkey", 1.0),
        Distinctness("o_orderkey", 1.0),
        Bounds("o_totalprice", 1000.0, 300000.0, 0.999),
        Pattern("o_orderpriority", "^[1-5]-", 1.0),
        Membership("o_orderstatus", Seq("O", "F", "P"), 1.0)))
    }),

    // Right-to-erasure dry run: negative-balance AUTOMOBILE customers as
    // the subject cohort, cascaded customer -> orders -> lineitem along
    // the q227 FK edges — affected rows and table shares per stage,
    // BEFORE any delete runs. See Relational.erasureImpact.
    "q274_erasure_impact" -> ((s, d) => {
      val subjects = table(s, d, "customer")
        .where(col("c_mktsegment") === "AUTOMOBILE" && col("c_acctbal") < 0)
      Relational.erasureImpact(subjects, "c_custkey", Seq(
        ("customer", table(s, d, "customer"), "c_custkey", "c_custkey"),
        ("orders", table(s, d, "orders"), "o_custkey", "o_orderkey"),
        ("lineitem", table(s, d, "lineitem"), "l_orderkey", "l_orderkey")))
    }),

    // Explicit GROUPING SETS census over (source, lang): the one
    // grouping shape rollup (q24/q73) and cube (q47) cannot express —
    // an arbitrary set list, here both one-dimension margins plus the
    // full cross and the grand total, tagged by grouping_id.
    "q230_grouping_sets" -> ((s, d) =>
      table(s, d, "documents")
        .groupingSets(
          Seq(Seq(col("source"), col("lang")), Seq(col("source")),
            Seq(col("lang")), Seq()),
          col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          grouping_id(col("source"), col("lang")).cast("bigint").as("gid"))))

  /** One fkAudit oracle edge: two scalar aggregates cross-joined. */
  private def fkEdgeSql(name: String, child: String, fk: String,
                        parent: String, pk: String): String =
    s"""SELECT '$name' AS relationship, c.n AS n_child, o.n AS n_orphans,
       |  CAST(o.n AS DOUBLE) / CAST(c.n AS DOUBLE) AS orphan_share
       |FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM $child) c
       |CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM $child ch
       |  WHERE NOT EXISTS (SELECT 1 FROM $parent pa
       |    WHERE pa.$pk = ch.$fk)) o""".stripMargin

  val oracle: Map[String, String] = Map(

    // Mirrors q311: DECIMAL partial sums merged before the terminal
    // double cast; DuckDB's DECIMAL sum widens, so values stay exact on
    // both sides.
    // Mirrors q341: the same flagged join and conditional DECIMAL cell
    // sums; consistency compared on exact decimals, doubles only at the
    // terminal casts.
    "q341_join_ivm" ->
      """WITH j AS (
        |  SELECT o.o_orderpriority,
        |    (o.o_orderkey % 7 = 0) AS is_do,
        |    (l.l_linenumber >= 5) AS is_dl,
        |    CAST(l.l_extendedprice AS DECIMAL(12,2)) AS v
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |c AS (
        |  SELECT o_orderpriority,
        |    sum(CASE WHEN NOT is_do AND NOT is_dl THEN v
        |             ELSE CAST(0 AS DECIMAL(12,2)) END) AS vb,
        |    sum(CASE WHEN is_do AND NOT is_dl THEN v
        |             ELSE CAST(0 AS DECIMAL(12,2)) END) AS vdo,
        |    sum(CASE WHEN NOT is_do AND is_dl THEN v
        |             ELSE CAST(0 AS DECIMAL(12,2)) END) AS vdl,
        |    sum(CASE WHEN is_do AND is_dl THEN v
        |             ELSE CAST(0 AS DECIMAL(12,2)) END) AS vdd,
        |    sum(v) AS vf
        |  FROM j GROUP BY 1)
        |SELECT o_orderpriority,
        |  CAST(vb AS DOUBLE) AS v_base,
        |  CAST(vdo AS DOUBLE) AS dv_orders,
        |  CAST(vdl AS DOUBLE) AS dv_lines,
        |  CAST(vdd AS DOUBLE) AS dv_both,
        |  CAST(vb + vdo + vdl + vdd AS DOUBLE) AS v_incr,
        |  CAST(vf AS DOUBLE) AS v_full,
        |  (vb + vdo + vdl + vdd = vf) AS consistent
        |FROM c""".stripMargin,

    "q311_incremental_agg" ->
      """WITH mx AS (SELECT max(o_orderdate) AS m FROM orders),
        |b AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS nb,
        |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS sb
        |  FROM orders, mx WHERE o_orderdate < mx.m GROUP BY 1),
        |dl AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS nd,
        |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS sd
        |  FROM orders, mx WHERE o_orderdate = mx.m GROUP BY 1),
        |f AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS nf,
        |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS sf
        |  FROM orders GROUP BY 1),
        |m AS (SELECT
        |    coalesce(b.o_orderpriority, dl.o_orderpriority) AS p,
        |    coalesce(b.nb, 0) + coalesce(dl.nd, 0) AS n_merged,
        |    coalesce(b.sb, CAST(0 AS DECIMAL(12,2)))
        |      + coalesce(dl.sd, CAST(0 AS DECIMAL(12,2))) AS sm
        |  FROM b FULL OUTER JOIN dl
        |    ON b.o_orderpriority = dl.o_orderpriority)
        |SELECT f.o_orderpriority, f.nf AS n_full,
        |  CAST(f.sf AS DOUBLE) AS sum_full,
        |  m.n_merged, CAST(m.sm AS DOUBLE) AS sum_merged,
        |  m.n_merged = f.nf
        |    AND CAST(m.sm AS DOUBLE) = CAST(f.sf AS DOUBLE)
        |    AS consistent
        |FROM f JOIN m ON f.o_orderpriority = m.p""".stripMargin,

    "q274_erasure_impact" ->
      """WITH subj AS (
        |  SELECT DISTINCT c_custkey AS k FROM customer
        |  WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 0),
        |okeys AS (SELECT DISTINCT o_orderkey AS k FROM orders
        |  WHERE o_custkey IN (SELECT k FROM subj)),
        |cn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer
        |  WHERE c_custkey IN (SELECT k FROM subj)),
        |onn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders
        |  WHERE o_custkey IN (SELECT k FROM subj)),
        |ln AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem
        |  WHERE l_orderkey IN (SELECT k FROM okeys)),
        |tc AS (SELECT CAST(count(*) AS BIGINT) AS t FROM customer),
        |toc AS (SELECT CAST(count(*) AS BIGINT) AS t FROM orders),
        |tl AS (SELECT CAST(count(*) AS BIGINT) AS t FROM lineitem)
        |SELECT 'customer' AS stage, cn.n AS n_affected, tc.t AS n_total,
        |  CAST(cn.n AS DOUBLE) / tc.t AS share FROM cn, tc
        |UNION ALL SELECT 'orders', onn.n, toc.t,
        |  CAST(onn.n AS DOUBLE) / toc.t FROM onn, toc
        |UNION ALL SELECT 'lineitem', ln.n, tl.t,
        |  CAST(ln.n AS DOUBLE) / tl.t FROM ln, tl""".stripMargin,

    "q256_expectation_suite" ->
      """WITH m AS (
        |  SELECT
        |    CAST(count(o_custkey) AS DOUBLE) / count(*) AS m0,
        |    CAST(count(DISTINCT o_orderkey) AS DOUBLE)
        |      / count(o_orderkey) AS m1,
        |    CAST(sum(CASE WHEN o_totalprice BETWEEN 1000.0 AND 300000.0
        |      THEN 1 ELSE 0 END) AS DOUBLE) / count(o_totalprice) AS m2,
        |    CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
        |      THEN 1 ELSE 0 END) AS DOUBLE) / count(o_orderpriority) AS m3,
        |    CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
        |      THEN 1 ELSE 0 END) AS DOUBLE) / count(o_orderstatus) AS m4
        |  FROM orders)
        |SELECT 'completeness' AS check_name, 'o_custkey' AS col_name,
        |  m0 AS metric, CAST(1.0 AS DOUBLE) AS threshold,
        |  m0 >= 1.0 AS passed FROM m
        |UNION ALL SELECT 'distinctness', 'o_orderkey', m1,
        |  CAST(1.0 AS DOUBLE), m1 >= 1.0 FROM m
        |UNION ALL SELECT 'bounds', 'o_totalprice', m2,
        |  CAST(0.999 AS DOUBLE), m2 >= 0.999 FROM m
        |UNION ALL SELECT 'pattern', 'o_orderpriority', m3,
        |  CAST(1.0 AS DOUBLE), m3 >= 1.0 FROM m
        |UNION ALL SELECT 'membership', 'o_orderstatus', m4,
        |  CAST(1.0 AS DOUBLE), m4 >= 1.0 FROM m""".stripMargin,

    "q226_decision_stump" ->
      """WITH grid AS (
        |  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p
        |  FROM documents GROUP BY 1),
        |cum AS (
        |  SELECT v, c, p,
        |    CAST(sum(c) OVER (ORDER BY v ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
        |    CAST(sum(p) OVER (ORDER BY v ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp
        |  FROM grid),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(p) AS BIGINT) AS pos FROM grid),
        |scored AS (
        |  SELECT v, cn, cp, n, pos,
        |    CAST(cn AS DOUBLE) / CAST(n AS DOUBLE) *
        |      (1.0 - (CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE)) *
        |             (CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
        |           - ((CAST(cn AS DOUBLE) - CAST(cp AS DOUBLE)) / CAST(cn AS DOUBLE)) *
        |             ((CAST(cn AS DOUBLE) - CAST(cp AS DOUBLE)) / CAST(cn AS DOUBLE)))
        |    + (CAST(n AS DOUBLE) - CAST(cn AS DOUBLE)) / CAST(n AS DOUBLE) *
        |      (1.0 - ((CAST(pos AS DOUBLE) - CAST(cp AS DOUBLE)) /
        |              (CAST(n AS DOUBLE) - CAST(cn AS DOUBLE))) *
        |             ((CAST(pos AS DOUBLE) - CAST(cp AS DOUBLE)) /
        |              (CAST(n AS DOUBLE) - CAST(cn AS DOUBLE)))
        |           - (((CAST(n AS DOUBLE) - CAST(cn AS DOUBLE))
        |               - (CAST(pos AS DOUBLE) - CAST(cp AS DOUBLE))) /
        |              (CAST(n AS DOUBLE) - CAST(cn AS DOUBLE))) *
        |             (((CAST(n AS DOUBLE) - CAST(cn AS DOUBLE))
        |               - (CAST(pos AS DOUBLE) - CAST(cp AS DOUBLE))) /
        |              (CAST(n AS DOUBLE) - CAST(cn AS DOUBLE)))) AS g
        |  FROM cum CROSS JOIN tot WHERE cn < n),
        |best AS (SELECT min(g) AS mg FROM scored),
        |tied AS (SELECT * FROM scored CROSS JOIN best WHERE g = mg),
        |bt AS (SELECT min(v) AS t FROM tied)
        |SELECT tied.v AS threshold, tied.g AS gini, tied.cn AS n_left,
        |  tied.cp AS pos_left, tied.n - tied.cn AS n_right,
        |  tied.pos - tied.cp AS pos_right
        |FROM tied CROSS JOIN bt WHERE tied.v = bt.t""".stripMargin,

    "q227_fk_orphan_audit" ->
      (fkEdges.map { case (name, c, fk, p, pk) => fkEdgeSql(name, c, fk, p, pk) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY relationship")),

    "q228_benford_screen" ->
      """WITH obs AS (
        |  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |      AS DECIMAL(14,0)) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |    CAST(count(*) AS BIGINT) AS observed
        |  FROM orders WHERE CAST(o_totalprice AS DECIMAL(12,2)) > 0 GROUP BY 1),
        |dg AS (SELECT CAST(unnest([1,2,3,4,5,6,7,8,9]) AS BIGINT) AS digit),
        |tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obs)
        |SELECT dg.digit, CAST(coalesce(obs.observed, 0) AS BIGINT) AS observed,
        |  round(CAST(n AS DOUBLE) * ln(1.0 + 1.0 / CAST(dg.digit AS DOUBLE))
        |    / ln(10.0), 6) AS expected_n,
        |  round(pow(CAST(coalesce(obs.observed, 0) AS DOUBLE)
        |      - CAST(n AS DOUBLE) * ln(1.0 + 1.0 / CAST(dg.digit AS DOUBLE))
        |        / ln(10.0), 2.0)
        |    / (CAST(n AS DOUBLE) * ln(1.0 + 1.0 / CAST(dg.digit AS DOUBLE))
        |       / ln(10.0)), 6) AS chi_term
        |FROM dg LEFT JOIN obs ON dg.digit = obs.digit CROSS JOIN tot""".stripMargin,

    "q229_scd2_history" ->
      s"""WITH newt AS (
         |${MlQueries.newtSql}),
         |o AS (SELECT doc_id, ${MlQueries.docHashSql} AS ho FROM documents),
         |nn AS (SELECT doc_id, ${MlQueries.docHashSql} AS hn FROM newt),
         |j AS (SELECT coalesce(o.doc_id, nn.doc_id) AS doc_id, ho, hn
         |  FROM o FULL OUTER JOIN nn ON o.doc_id = nn.doc_id)
         |SELECT doc_id, ho AS row_hash, CAST(1 AS BIGINT) AS valid_from,
         |  CAST(2 AS BIGINT) AS valid_to, FALSE AS is_current
         |FROM j WHERE ho IS NOT NULL AND (hn IS NULL OR hn <> ho)
         |UNION ALL
         |SELECT doc_id, hn AS row_hash,
         |  CAST(CASE WHEN ho IS NOT NULL AND ho = hn THEN 1 ELSE 2 END
         |    AS BIGINT) AS valid_from,
         |  CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current
         |FROM j WHERE hn IS NOT NULL""".stripMargin,

    "q230_grouping_sets" ->
      """SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  grouping(source, lang) AS gid
        |FROM documents
        |GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())""".stripMargin)
}
