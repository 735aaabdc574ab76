package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft.table

/** Round-10 function-family completion batch (the q65–q69 series
  * continued): deterministic per-group MODE, the array higher-order
  * function family (distinct/sort/filter/transform-aggregate/exists/
  * slice — the in-row list algebra an LLM pipeline leans on), and the
  * ANSI-safe arithmetic family (try_divide/try_cast and friends) whose
  * null-not-error contract the oracle mirrors with explicit CASE. */
object FunctionQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // Per-source modal document length, ties to the smallest value —
    // dropDuplicates-style arbitrariness is what a reproducible profile
    // can't have. See Relational.modeByGroup.
    "q248_mode_per_group" -> ((s, d) =>
      graft.operators.Relational.modeByGroup(
        table(s, d, "documents"), "source", "n_chars")),

    // Array higher-order family over the token list: distinct count,
    // first sorted token, lambda filter count, transform+aggregate sum,
    // exists, and a slice join — all in-row (codegen'd collection
    // expressions), zero shuffles beyond the scan.
    "q249_array_funcs" -> ((s, d) =>
      table(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("__t"))
        .select(col("doc_id"),
          size(array_distinct(col("__t"))).cast("bigint").as("n_distinct"),
          array_sort(col("__t")).getItem(0).as("first_sorted"),
          size(expr("filter(__t, t -> length(t) >= 6)")).cast("bigint")
            .as("n_long"),
          expr("aggregate(transform(__t, t -> length(t)), 0, (a, x) -> a + x)")
            .cast("bigint").as("len_sum"),
          expr("exists(__t, t -> t = 'spark')").as("has_spark"),
          concat_ws("-", slice(col("__t"), 1, 3)).as("head3"))),

    // ANSI FILTER-clause aggregates: per-condition aggregation WITHOUT
    // self-joins or CASE pyramids — one pass, every conditional metric a
    // FILTER on the same aggregate tree (identical surface in DuckDB).
    // Decimal discipline carried through the filtered sums.
    "q278_filtered_aggregates" -> ((s, d) =>
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_all"),
          expr("count(*) FILTER (WHERE l_quantity > 25)")
            .cast("bigint").as("n_bulk"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) " +
            "FILTER (WHERE l_discount > 0.05) AS DOUBLE)")
            .as("rev_discounted"),
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) " +
            "FILTER (WHERE l_tax < 0.03) AS DOUBLE) / " +
            "count(*) FILTER (WHERE l_tax < 0.03)").as("avg_qty_lowtax"),
          expr("max(l_shipdate) FILTER (WHERE l_linestatus = 'F')")
            .as("last_f_ship"))),

    // ANSI-safe arithmetic: division and casts that yield NULL instead
    // of faulting — the error-handling surface an ANSI-mode pipeline
    // needs; the oracle states the same semantics as explicit CASE.
    "q250_safe_arithmetic" -> ((s, d) =>
      table(s, d, "events")
        .select(col("event_id"),
          try_divide(lit(10L), pmod(col("event_id"), lit(5L))).as("div_mod5"),
          expr("try_cast(props AS INT)").cast("bigint").as("props_as_int"),
          expr("try_cast(substring(event_type, 1, 1) AS INT)").cast("bigint")
            .as("type_as_int"),
          nullif(pmod(col("event_id"), lit(3L)), lit(0L)).as("mod3_nz"),
          coalesce(nullif(pmod(col("event_id"), lit(3L)), lit(0L)), lit(-1L))
            .as("mod3_filled"))))

  val oracle: Map[String, String] = Map(

    "q278_filtered_aggregates" ->
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n_all,
        |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT)
        |    AS n_bulk,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
        |    FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS rev_discounted,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
        |    FILTER (WHERE l_tax < 0.03) AS DOUBLE)
        |    / (count(*) FILTER (WHERE l_tax < 0.03)) AS avg_qty_lowtax,
        |  max(l_shipdate) FILTER (WHERE l_linestatus = 'F')
        |    AS last_f_ship
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q248_mode_per_group" ->
      """WITH c AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |m AS (SELECT source, max(cnt) AS mc FROM c GROUP BY 1)
        |SELECT c.source, CAST(min(c.v) AS BIGINT) AS mode_value,
        |  CAST(max(c.cnt) AS BIGINT) AS mode_count
        |FROM c JOIN m ON c.source = m.source AND c.cnt = m.mc
        |GROUP BY 1""".stripMargin,

    "q249_array_funcs" ->
      """SELECT doc_id,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |    AS n_distinct,
        |  list_sort(string_split(text, ' '))[1] AS first_sorted,
        |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) >= 6))
        |    AS BIGINT) AS n_long,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |    t -> length(t))) AS BIGINT) AS len_sum,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  array_to_string(string_split(text, ' ')[1:3], '-') AS head3
        |FROM documents""".stripMargin,

    "q250_safe_arithmetic" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 5 = 0 THEN NULL
        |    ELSE CAST(10 AS DOUBLE) / CAST(event_id % 5 AS DOUBLE) END
        |    AS div_mod5,
        |  CAST(TRY_CAST(props AS INTEGER) AS BIGINT) AS props_as_int,
        |  CAST(TRY_CAST(substr(event_type, 1, 1) AS INTEGER) AS BIGINT)
        |    AS type_as_int,
        |  nullif(event_id % 3, 0) AS mod3_nz,
        |  coalesce(nullif(event_id % 3, 0), -1) AS mod3_filled
        |FROM events""".stripMargin)
}
