package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft.table
import graft.operators.Features

/** Feature-engineering batch (q251–q255): the model-training prep surface
  * over warehouse tables — the TPC-H Q6 forecast-revenue shape that
  * completes the classic-query inventory, smoothed target encoding,
  * equi-depth binning without a global sort, the hashing trick's
  * collision audit, and crossed-categorical lift. See
  * [[graft.operators.Features]] for the scale rationale.
  */
object FeatureQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // TPC-H Q6 shape (forecast revenue change): a pure scan-side query —
    // all three predicates and both referenced columns push into the
    // parquet scan; one global agg, no shuffle beyond the 1-row reduce.
    "q251_revenue_forecast" -> ((s, d) =>
      table(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(graft.operators.Relational.dec(col("l_extendedprice")) *
            graft.operators.Relational.dec(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))),

    // Smoothed target encoding of part brand by line revenue (m=100):
    // the mean-encoding regularizer every tabular-ML pipeline ships.
    "q252_target_encoding" -> ((s, d) =>
      Features.targetEncode(
        table(s, d, "lineitem")
          .join(table(s, d, "part"),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"), col("l_extendedprice")),
        "p_brand", "l_extendedprice", m = 100.0)),

    // Equi-depth 8-bin profile of order value — bin edges from a one-row
    // exact percentile aggregate, membership evaluated in-row (see
    // Features.equidepthProfile: no ntile global sort).
    "q253_equidepth_bins" -> ((s, d) =>
      Features.equidepthProfile(
        table(s, d, "orders").select("o_totalprice"), "o_totalprice", 8)),

    // Hashing-trick audit: partkeys into 64 hashed feature buckets,
    // per-bucket load + distinct keys (collision census).
    "q254_hash_features" -> ((s, d) =>
      Features.hashBuckets(
        table(s, d, "part").select("p_partkey"), "p_partkey", 64)),

    // Crossed categorical (market segment x order priority) with
    // independence lift — the feature-cross screen.
    "q255_feature_cross" -> ((s, d) =>
      Features.crossLift(
        table(s, d, "orders")
          .join(table(s, d, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), col("o_orderpriority")),
        "c_mktsegment", "o_orderpriority")))

  val oracle: Map[String, String] = Map(

    "q251_revenue_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q252_target_encoding" ->
      """WITH j AS (
        |  SELECT p_brand, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |c AS (
        |  SELECT p_brand AS category, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS s
        |  FROM j GROUP BY 1),
        |g AS (
        |  SELECT sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS gs,
        |    CAST(count(*) AS BIGINT) AS gn
        |  FROM j)
        |SELECT category, n,
        |  CAST(s AS DOUBLE) / n AS raw_mean,
        |  (CAST(s AS DOUBLE) + 100.0 * (CAST(gs AS DOUBLE) / gn))
        |    / (n + 100.0) AS enc
        |FROM c, g""".stripMargin,

    "q253_equidepth_bins" ->
      """WITH e AS (
        |  SELECT quantile_cont(o_totalprice,
        |    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS qs
        |  FROM orders),
        |b AS (
        |  SELECT CAST(len(list_filter(e.qs, q -> o_totalprice > q)) + 1
        |    AS BIGINT) AS bin, o_totalprice AS v
        |  FROM orders, e)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n, min(v) AS lo,
        |  max(v) AS hi,
        |  CAST(sum(CAST(v AS DECIMAL(12,2))) AS DOUBLE) / count(v) AS mean
        |FROM b GROUP BY 1""".stripMargin,

    "q254_hash_features" ->
      """WITH h AS (SELECT p_partkey, p_partkey % 4294967296 AS k32
        |  FROM part)
        |SELECT ((k32 % 65536) * 2654435761
        |    + ((k32 // 65536) * 2654435761) % 65536 * 65536)
        |    % 4294967296 % 64 AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_distinct,
        |  min(p_partkey) AS min_key, max(p_partkey) AS max_key
        |FROM h GROUP BY 1""".stripMargin,

    "q255_feature_cross" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS a, o_orderpriority AS b
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |cell AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n
        |  FROM j GROUP BY 1, 2),
        |ra   AS (SELECT a, CAST(count(*) AS BIGINT) AS na FROM j GROUP BY 1),
        |rb   AS (SELECT b, CAST(count(*) AS BIGINT) AS nb FROM j GROUP BY 1),
        |t    AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM j)
        |SELECT cell.a, cell.b, cell.n,
        |  CAST(cell.n AS DOUBLE) * t.nt
        |    / (CAST(ra.na AS DOUBLE) * rb.nb) AS lift
        |FROM cell JOIN ra USING (a) JOIN rb USING (b), t""".stripMargin)
}
