package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft.table
import graft.operators.{SchemaDiscovery, Stats, Temporal}

/** Round-10 distribution-profiling batch: where does a series shift
  * (CUSUM changepoint), where do journeys end (exit census), what shape
  * are the distributions (skewness/kurtosis), which segments share an
  * audience (pairwise Jaccard), and how concentrated is the money
  * (Pareto coverage).
  *
  * Determinism: CUSUM and Pareto run all-integer cores (D·CUSUM and
  * den·cum ≥ num·tot avoid division entirely); moments accumulate power
  * sums in DECIMAL(38,0)/HUGEINT exactly; every remaining double formula
  * is textually mirrored in the oracle. */
object ProfileQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q240's bucket width (cents) and coverage share num/den. */
  private val paretoBucket = 100000L
  private val paretoNum = 4L
  private val paretoDen = 5L

  val queries: Map[String, Q] = Map(

    // CUSUM changepoint per event type on the daily series — the "did
    // the level shift, and on which day" alarm beside q132's burst
    // z-scores; integer D·CUSUM core, earliest-day tie-break.
    "q236_cusum_changepoint" -> ((s, d) =>
      Temporal.cusumChangepoint(table(s, d, "events"), "event_type", "ts")),

    // Exit census: the distribution of each user's LAST event type —
    // where journeys end, the absorbing-state view next to q126's
    // transition matrix.
    "q237_last_event_census" -> ((s, d) =>
      Temporal.lastEventCensus(
        table(s, d, "events"), "user_id", "ts", "event_id", "event_type")),

    // Per-source skewness and excess kurtosis of document length — the
    // shape profile beside q214/q225's location tests; DECIMAL(38,0)
    // power sums, one fixed-form central-moment formula.
    "q238_shape_moments" -> ((s, d) =>
      Stats.shapeMoments(table(s, d, "documents"), "source", "n_chars")),

    // Pairwise audience overlap between event types: users doing BOTH,
    // and the Jaccard of the user sets — segment-overlap planning; the
    // entity-keyed self-join is bounded per user by the (constant)
    // number of types.
    "q239_type_overlap" -> ((s, d) =>
      Stats.groupOverlapJaccard(
        table(s, d, "events"), "user_id", "event_type")
        .orderBy(col("group_a"), col("group_b"))),

    // Pareto coverage: the top revenue slice (by $1000 buckets, richest
    // down) that carries 80% of order revenue — concentration in
    // headcount terms, the business twin of q218's Gini; all-integer
    // crossing test on the bucket grid.
    "q240_pareto_coverage" -> ((s, d) =>
      Stats.paretoCoverage(table(s, d, "orders"), "o_custkey",
        "o_totalprice", paretoBucket, paretoNum, paretoDen)),

    // Approximate functional-dependency profiler: g3 strength of five
    // declared det→dep candidates (a key FD as positive control, a
    // known-violated pair, and three plausible-but-false dependencies)
    // — the constraint-discovery stage before q256's expectation suite
    // asserts anything. Cost ∝ distinct cells, keyed on the determinant.
    "q323_fd_profile" -> ((s, d) => {
      val part = table(s, d, "part")
      SchemaDiscovery.fdStrength(part,
          "part.p_name->p_brand", "p_name", "p_brand")
        .unionByName(SchemaDiscovery.fdStrength(part,
          "part.p_brand->p_type", "p_brand", "p_type"))
        .unionByName(SchemaDiscovery.fdStrength(part,
          "part.p_partkey->p_brand", "p_partkey", "p_brand"))
        .unionByName(SchemaDiscovery.fdStrength(table(s, d, "orders"),
          "orders.o_custkey->o_orderpriority", "o_custkey",
          "o_orderpriority"))
        .unionByName(SchemaDiscovery.fdStrength(table(s, d, "customer"),
          "customer.c_nationkey->c_mktsegment", "c_nationkey",
          "c_mktsegment"))
    }),

    // Inclusion-dependency discovery: distinct-set containment for six
    // candidate (child ⊆ parent) column pairs — the three real FKs of
    // the star schema (full INDs), two partial overlaps, and one
    // near-miss — the FK-candidate screen q227's orphan audit would
    // consume. Distinct-project both sides, then a keyed left join.
    "q324_ind_discovery" -> ((s, d) => {
      val li = table(s, d, "lineitem"); val part = table(s, d, "part")
      val sup = table(s, d, "supplier"); val nat = table(s, d, "nation")
      SchemaDiscovery.indContainment(li, "l_partkey", part, "p_partkey",
          "lineitem.l_partkey<part.p_partkey")
        .unionByName(SchemaDiscovery.indContainment(li, "l_suppkey", sup,
          "s_suppkey", "lineitem.l_suppkey<supplier.s_suppkey"))
        .unionByName(SchemaDiscovery.indContainment(table(s, d, "orders"),
          "o_custkey", table(s, d, "customer"), "c_custkey",
          "orders.o_custkey<customer.c_custkey"))
        .unionByName(SchemaDiscovery.indContainment(part, "p_size", nat,
          "n_nationkey", "part.p_size<nation.n_nationkey"))
        .unionByName(SchemaDiscovery.indContainment(sup, "s_nationkey",
          nat, "n_nationkey", "supplier.s_nationkey<nation.n_nationkey"))
        .unionByName(SchemaDiscovery.indContainment(nat, "n_nationkey",
          part, "p_size", "nation.n_nationkey<part.p_size"))
    }),

    // Join-cardinality estimation audit for the three star-schema FK
    // joins: exact Σ cA·cB next to the 1/16 hash60 key-sampled estimate
    // with its relative error — the optimizer statistic q324's FK
    // discovery feeds. Keyed count aggregates + one key join each.
    "q327_join_size_estimate" -> ((s, d) => {
      val li = table(s, d, "lineitem")
      SchemaDiscovery.joinSizeEstimate(li, "l_orderkey",
          table(s, d, "orders"), "o_orderkey",
          "lineitem.l_orderkey=orders.o_orderkey")
        .unionByName(SchemaDiscovery.joinSizeEstimate(li, "l_partkey",
          table(s, d, "part"), "p_partkey",
          "lineitem.l_partkey=part.p_partkey"))
        .unionByName(SchemaDiscovery.joinSizeEstimate(
          table(s, d, "orders"), "o_custkey", table(s, d, "customer"),
          "c_custkey", "orders.o_custkey=customer.c_custkey"))
    }))

  /** One q323 oracle branch: mirrors SchemaDiscovery.fdStrength — cell
    * counts, per-determinant max/sum, then the 1-row g3 reduce. */
  private def fdBranch(lbl: String, tbl: String, det: String,
                       dep: String): String =
    s"""SELECT '$lbl' AS fd, CAST(sum(cnt) AS BIGINT) AS n_rows,
       |  CAST(count(*) AS BIGINT) AS n_det,
       |  CAST(sum(ndep) AS BIGINT) AS n_pairs,
       |  CAST(sum(cnt - mx) AS BIGINT) AS violations,
       |  round(1.0 - CAST(sum(cnt - mx) AS DOUBLE)
       |    / CAST(sum(cnt) AS DOUBLE), 6) AS strength
       |FROM (
       |  SELECT max(c) AS mx, sum(c) AS cnt, count(*) AS ndep
       |  FROM (SELECT $det, $dep, CAST(count(*) AS BIGINT) AS c
       |        FROM $tbl GROUP BY 1, 2)
       |  GROUP BY $det)""".stripMargin

  /** One q324 oracle branch: mirrors SchemaDiscovery.indContainment —
    * null-filtered distinct projections, keyed left join, 1-row reduce. */
  private def indBranch(lbl: String, childTbl: String, childCol: String,
                        parentTbl: String, parentCol: String): String =
    s"""SELECT '$lbl' AS ind, CAST(count(*) AS BIGINT) AS n_child_distinct,
       |  CAST(sum(CASE WHEN b.v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_missing,
       |  round(1.0 - CAST(sum(CASE WHEN b.v IS NULL THEN 1 ELSE 0 END)
       |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS containment,
       |  sum(CASE WHEN b.v IS NULL THEN 1 ELSE 0 END) = 0 AS is_ind
       |FROM (SELECT DISTINCT CAST($childCol AS BIGINT) AS v FROM $childTbl
       |      WHERE $childCol IS NOT NULL) a
       |LEFT JOIN (SELECT DISTINCT CAST($parentCol AS BIGINT) AS v
       |           FROM $parentTbl WHERE $parentCol IS NOT NULL) b
       |  ON a.v = b.v""".stripMargin

  /** One q327 oracle branch: mirrors SchemaDiscovery.joinSizeEstimate —
    * per-key counts, product mass, hash60-gated 1/16 key sample. */
  private def jseBranch(lbl: String, childTbl: String, childCol: String,
                        parentTbl: String, parentCol: String): String = {
    val h = ScaleQueries.duckHash60("k")
    s"""SELECT '$lbl' AS join_cand, n_keys, exact_rows, sampled_keys,
       |  est_rows,
       |  round(CAST(abs(est_rows - exact_rows) AS DOUBLE)
       |    / CAST(exact_rows AS DOUBLE), 6) AS rel_err
       |FROM (
       |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
       |    CAST(sum(p) AS BIGINT) AS exact_rows,
       |    CAST(sum(s) AS BIGINT) AS sampled_keys,
       |    CAST(16 * sum(CASE WHEN s = 1 THEN p ELSE 0 END) AS BIGINT)
       |      AS est_rows
       |  FROM (
       |    SELECT a.ca * b.cb AS p,
       |      CASE WHEN ($h) % 16 = 0 THEN 1 ELSE 0 END AS s, k
       |    FROM (SELECT CAST($childCol AS BIGINT) AS k,
       |            CAST(count(*) AS BIGINT) AS ca
       |          FROM $childTbl GROUP BY 1) a
       |    JOIN (SELECT CAST($parentCol AS BIGINT) AS k,
       |            CAST(count(*) AS BIGINT) AS cb
       |          FROM $parentTbl GROUP BY 1) b USING (k)))""".stripMargin
  }

  val oracle: Map[String, String] = Map(

    "q327_join_size_estimate" -> Seq(
      jseBranch("lineitem.l_orderkey=orders.o_orderkey", "lineitem",
        "l_orderkey", "orders", "o_orderkey"),
      jseBranch("lineitem.l_partkey=part.p_partkey", "lineitem",
        "l_partkey", "part", "p_partkey"),
      jseBranch("orders.o_custkey=customer.c_custkey", "orders",
        "o_custkey", "customer", "c_custkey")).mkString("\nUNION ALL\n"),

    "q323_fd_profile" -> Seq(
      fdBranch("part.p_name->p_brand", "part", "p_name", "p_brand"),
      fdBranch("part.p_brand->p_type", "part", "p_brand", "p_type"),
      fdBranch("part.p_partkey->p_brand", "part", "p_partkey", "p_brand"),
      fdBranch("orders.o_custkey->o_orderpriority", "orders", "o_custkey",
        "o_orderpriority"),
      fdBranch("customer.c_nationkey->c_mktsegment", "customer",
        "c_nationkey", "c_mktsegment")).mkString("\nUNION ALL\n"),

    "q324_ind_discovery" -> Seq(
      indBranch("lineitem.l_partkey<part.p_partkey", "lineitem",
        "l_partkey", "part", "p_partkey"),
      indBranch("lineitem.l_suppkey<supplier.s_suppkey", "lineitem",
        "l_suppkey", "supplier", "s_suppkey"),
      indBranch("orders.o_custkey<customer.c_custkey", "orders",
        "o_custkey", "customer", "c_custkey"),
      indBranch("part.p_size<nation.n_nationkey", "part", "p_size",
        "nation", "n_nationkey"),
      indBranch("supplier.s_nationkey<nation.n_nationkey", "supplier",
        "s_nationkey", "nation", "n_nationkey"),
      indBranch("nation.n_nationkey<part.p_size", "nation", "n_nationkey",
        "part", "p_size")).mkString("\nUNION ALL\n"),

    "q236_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
        |      AS day_idx,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, day_idx, c,
        |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day_idx ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day_idx ASC)
        |      AS BIGINT) AS rk
        |  FROM daily),
        |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1),
        |sc AS (
        |  SELECT cum.event_type, day_idx, n_days, s,
        |    abs(n_days * cc - rk * s) AS dcu
        |  FROM cum JOIN tot ON cum.event_type = tot.event_type),
        |pk AS (SELECT event_type, max(dcu) AS mx FROM sc GROUP BY 1)
        |SELECT sc.event_type, CAST(min(day_idx) AS BIGINT) AS change_day,
        |  CAST(max(n_days) AS BIGINT) AS n_days,
        |  CAST(max(dcu) AS DOUBLE) / CAST(max(n_days) AS DOUBLE) AS cusum_peak
        |FROM sc JOIN pk ON sc.event_type = pk.event_type AND sc.dcu = pk.mx
        |GROUP BY 1""".stripMargin,

    "q237_last_event_census" ->
      """WITH l AS (
        |  SELECT event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |c AS (SELECT event_type AS last_event_type,
        |    CAST(count(*) AS BIGINT) AS n_users
        |  FROM l WHERE rn = 1 GROUP BY 1)
        |SELECT last_event_type, n_users,
        |  CAST(n_users AS DOUBLE) / CAST(t.t AS DOUBLE) AS share
        |FROM c CROSS JOIN (SELECT CAST(sum(n_users) AS BIGINT) AS t FROM c) t""".stripMargin,

    "q238_shape_moments" ->
      """WITH a AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(n_chars AS HUGEINT)) AS BIGINT) AS s1,
        |    CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS BIGINT) AS s2,
        |    CAST(sum(CAST(n_chars AS HUGEINT) * n_chars * n_chars) AS BIGINT)
        |      AS s3,
        |    CAST(sum((CAST(n_chars AS HUGEINT) * n_chars) *
        |             (CAST(n_chars AS HUGEINT) * n_chars)) AS BIGINT) AS s4
        |  FROM documents GROUP BY 1),
        |m AS (
        |  SELECT source, n,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |        / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS m2,
        |    (CAST(s3 AS DOUBLE)
        |      - 3.0 * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      + 2.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / CAST(n AS DOUBLE)
        |      AS m3,
        |    (CAST(s4 AS DOUBLE)
        |      - 4.0 * CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
        |      + 6.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |      - 3.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |        * CAST(s1 AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |      / CAST(n AS DOUBLE) AS m4
        |  FROM a)
        |SELECT source, n, mean, m2,
        |  CASE WHEN m2 = 0.0 THEN NULL ELSE m3 / (m2 * sqrt(m2)) END AS skewness,
        |  CASE WHEN m2 = 0.0 THEN NULL ELSE m4 / (m2 * m2) - 3.0 END
        |    AS kurtosis_ex
        |FROM m""".stripMargin,

    "q239_type_overlap" ->
      """WITH eg AS (SELECT DISTINCT user_id AS e, event_type AS g FROM events),
        |sz AS (SELECT g, CAST(count(*) AS BIGINT) AS sz FROM eg GROUP BY 1),
        |it AS (
        |  SELECT a.g AS g1, b.g AS g2, CAST(count(*) AS BIGINT) AS n_both
        |  FROM eg a JOIN eg b ON a.e = b.e AND a.g < b.g GROUP BY 1, 2)
        |SELECT g1 AS group_a, g2 AS group_b, n_both,
        |  CAST(n_both AS DOUBLE) / CAST(x.sz + y.sz - n_both AS DOUBLE)
        |    AS jaccard
        |FROM it JOIN sz x ON it.g1 = x.g JOIN sz y ON it.g2 = y.g
        |ORDER BY group_a, group_b""".stripMargin,

    "q240_pareto_coverage" ->
      s"""WITH per AS (
         |  SELECT o_custkey,
         |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
         |      AS DECIMAL(18,0))) AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |b AS (
         |  SELECT cents - cents % $paretoBucket AS fl,
         |    CAST(count(*) AS BIGINT) AS ne, CAST(sum(cents) AS BIGINT) AS mass
         |  FROM per GROUP BY 1),
         |cum AS (
         |  SELECT fl, ne, mass,
         |    CAST(sum(ne) OVER (ORDER BY fl DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ce,
         |    CAST(sum(mass) OVER (ORDER BY fl DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm
         |  FROM b),
         |tot AS (SELECT CAST(sum(mass) AS BIGINT) AS t,
         |    CAST(sum(ne) AS BIGINT) AS tn FROM b),
         |cr AS (SELECT CAST(max(fl) AS BIGINT) AS cross_fl
         |  FROM cum CROSS JOIN tot WHERE cm * $paretoDen >= t * $paretoNum)
         |SELECT fl AS bucket_floor_cents, ce AS n_top_entities,
         |  tn AS n_entities, CAST(cm AS DOUBLE) / CAST(t AS DOUBLE) AS mass_share
         |FROM cum CROSS JOIN tot CROSS JOIN cr WHERE fl = cross_fl""".stripMargin)
}
