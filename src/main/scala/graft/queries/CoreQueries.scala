package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Graft.table
import graft.operators.Relational._

/** The §2 operator inventory of SURVEY.md, generalized over the driver's
  * TPC-H-ish tables. Each query has a DuckDB oracle in [[CoreQueries.oracle]]
  * with identical column names/types and exact (order-independent) numerics.
  *
  * Reference citations are in each query's comment (file:line into
  * /root/reference).
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // P1/P3/P4 — projection, cast, alias (reference: spark_jobs/silver_openmeteo.py:38-46).
    // floor() both sides: Spark double->int cast truncates, DuckDB rounds.
    "q01_project_cast" -> ((s, d) =>
      table(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity")).cast("int").as("qty_int"),
        col("l_returnflag").as("flag"))),

    // P8 — row filter on predicate columns; Catalyst pushes both predicates
    // into the parquet scan (reference: dags/weather_daily_etl.py:184).
    "q02_filter_predicate" -> ((s, d) =>
      table(s, d, "events")
        .where(col("event_type") === "click" && col("value") > 50.0)
        .select(col("event_id"), col("user_id"), col("value"))),

    // A1 — global (grand-total) aggregate, the Gold job's shape
    // (reference: spark_jobs/gold_openmeteo.py:20-27).
    "q03_global_agg" -> ((s, d) =>
      table(s, d, "lineitem").agg(
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        avgExact(col("l_quantity")).as("avg_qty"),
        sumExact(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_rows"))),

    // A1 generalized to keyed aggregation (SURVEY.md §2.5: Gold should be
    // groupBy(keys) for multi-day input). TPC-H Q1 shape.
    "q04_group_agg" -> ((s, d) =>
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumExact(col("l_quantity")).as("sum_qty"),
          sumExact(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          avgExact(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Gold-parity daily rollup over the events stream: per-day y/m/d int keys
    // (reference: spark_jobs/gold_openmeteo.py:20-29 + load_gold_to_pg.py:26-28).
    "q05_daily_agg" -> ((s, d) =>
      table(s, d, "events")
        .groupBy(
          year(col("ts")).as("y"), month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("d"))
        .agg(
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          avgExact(col("value")).as("avg_value"),
          sumExact(col("value")).as("sum_value"),
          count(lit(1)).as("n_events"))
        .orderBy(col("y"), col("m"), col("d"))),

    // G1/G2 — the Silver pivot: pack rows to parallel arrays, arrays_zip,
    // explode back to long format; exact roundtrip of the source rows
    // (reference: spark_jobs/silver_openmeteo.py:31-37).
    "q06_unnest_roundtrip" -> ((s, d) => {
      val packed = table(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice")))).as("rows"))
        .select(col("l_orderkey"),
          transform(col("rows"), r => r.getField("l_linenumber")).as("ln"),
          transform(col("rows"), r => r.getField("l_quantity")).as("qty"),
          transform(col("rows"), r => r.getField("l_extendedprice")).as("price"))
      packed
        .select(col("l_orderkey"), explode(arrays_zip(col("ln"), col("qty"), col("price"))).as("h"))
        .select(col("l_orderkey"),
          col("h.ln").as("l_linenumber"),
          col("h.qty").as("l_quantity"),
          col("h.price").as("l_extendedprice"))
    }),

    // F1 — to_timestamp of an ISO-8601 "yyyy-MM-dd'T'HH:mm" string
    // (reference: spark_jobs/silver_openmeteo.py:47); roundtrip through the
    // exact string shape the reference parses.
    "q07_timestamp_parse" -> ((s, d) =>
      table(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        to_timestamp(date_format(col("l_shipdate"), "yyyy-MM-dd'T'HH:mm")).as("event_ts"))),

    // Sort + limit (top-k). Plans as TakeOrderedAndProject: per-partition k,
    // then driver merge — no global sort at 100 TB.
    "q08_topk" -> ((s, d) =>
      topK(table(s, d, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        10, col("o_totalprice").desc, col("o_orderkey").asc)),

    // P5/P9/F3 — derived partition columns y/m/d + literal source tag
    // (reference: spark_jobs/silver_openmeteo.py:52-57).
    "q09_partition_cols" -> ((s, d) =>
      table(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        lit("openmeteo").as("source_name"))),

    // A3 — count (reference: dags/weather_daily_etl.py:183-184).
    "q10_count" -> ((s, d) =>
      table(s, d, "lineitem").agg(count(lit(1)).as("n"))),

    // Distinct (SURVEY.md §2.9 checklist).
    "q11_distinct" -> ((s, d) =>
      table(s, d, "customer").select(col("c_mktsegment")).distinct()
        .orderBy(col("c_mktsegment"))),

    // Deterministic keyed dedup (first order per customer) — the engine's
    // dropDuplicates with a total order instead of arbitrary row choice.
    "q12_dedup_first_per_key" -> ((s, d) =>
      dedupeByKey(
        table(s, d, "orders").select(col("o_custkey"), col("o_orderkey"), col("o_orderdate")),
        Seq(col("o_custkey")), Seq(col("o_orderdate").asc, col("o_orderkey").asc))),

    // Inner join + keyed agg. No forced broadcast: customer GROWS with scale
    // (millions of rows at 100x), so the join strategy is left to AQE — it
    // picks broadcast at small SF and degrades to shuffle join at large.
    "q13_join_inner_broadcast" -> ((s, d) =>
      table(s, d, "orders")
        .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"), sumExact(col("o_totalprice")).as("total_spend"))),

    // Left-semi join (EXISTS).
    "q14_join_semi" -> ((s, d) =>
      table(s, d, "customer")
        .join(table(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))),

    // Left-anti join (NOT EXISTS): customers with no large order.
    "q15_join_anti" -> ((s, d) =>
      table(s, d, "customer")
        .join(table(s, d, "orders").where(col("o_totalprice") > 250000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))),

    // 3-way join: fact-fact shuffle join (lineitem ⋈ orders on the join key),
    // customer left to AQE (it grows with scale), nation force-broadcast
    // (genuinely bounded: 25 rows at any SF).
    "q16_join_multi" -> ((s, d) =>
      table(s, d, "lineitem")
        .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_mktsegment"), col("n_name"))
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("c_mktsegment"), col("n_name"))),

    // Left-outer join on dimension chain.
    "q17_join_outer" -> ((s, d) =>
      table(s, d, "nation")
        .join(table(s, d, "region"), col("n_regionkey") === col("r_regionkey"), "left")
        .select(col("n_nationkey"), col("n_name"), col("r_name"))),

    // Window ranking: top-3 orders per customer, deterministic tie-break.
    "q18_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      table(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),

    // Window running sum per user (exact fixed-point accumulation).
    "q19_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, d, "events")
        .select(col("event_id"), col("user_id"),
          sum(dec(col("value"))).over(w).cast("double").as("running_value"))
    }),

    // Window lag: per-user delta between consecutive events.
    "q20_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      table(s, d, "events")
        .select(col("event_id"), col("user_id"),
          (dec(col("value")) - lag(dec(col("value")), 1).over(w))
            .cast("double").as("delta_value"))
    }),

    // Set op: UNION ALL of two heterogeneous projections.
    "q21_union" -> ((s, d) =>
      table(s, d, "customer")
        .select(col("c_custkey").as("key_id"), col("c_name").as("name"),
          lit("customer").as("side"))
        .unionByName(
          table(s, d, "supplier").select(col("s_suppkey").as("key_id"),
            col("s_name").as("name"), lit("supplier").as("side")))),

    // Set op: INTERSECT (distinct semantics in both engines).
    "q22_intersect" -> ((s, d) =>
      table(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(table(s, d, "supplier").select(col("s_nationkey").as("nationkey")))),

    // Set op: EXCEPT (distinct semantics in both engines): part sizes no
    // Brand#1 part comes in.
    "q23_except" -> ((s, d) =>
      table(s, d, "part").select(col("p_size"))
        .except(table(s, d, "part").where(col("p_brand") === "Brand#1")
          .select(col("p_size")))),

    // Rollup (grouping-sets family; SURVEY.md §2.9 checklist).
    "q24_rollup" -> ((s, d) =>
      table(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sumExact(col("l_quantity")).as("sum_qty"))),

    // Tumbling event-time window — the batch equivalent of the Structured
    // Streaming hourly aggregation in graft.streaming. Window start emitted as
    // epoch seconds (bigint) so ns-vs-us parquet timestamp precision cannot
    // skew the oracle compare.
    "q25_tumbling_window" -> ((s, d) =>
      table(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumExact(col("value")).as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("window_start_sec"),
          col("event_type"), col("n"), col("sum_value")))
  )

  val oracle: Map[String, String] = Map(
    "q01_project_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_quantity) AS INTEGER) AS qty_int,
        |  l_returnflag AS flag
        |FROM lineitem""".stripMargin,

    "q02_filter_predicate" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'click' AND value > 50.0""".stripMargin,

    "q03_global_agg" ->
      """SELECT
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n_rows
        |FROM lineitem""".stripMargin,

    "q04_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q05_daily_agg" ->
      """SELECT
        |  CAST(year(ts) AS INTEGER) AS y,
        |  CAST(month(ts) AS INTEGER) AS m,
        |  CAST(day(ts) AS INTEGER) AS d,
        |  min(value) AS min_value,
        |  max(value) AS max_value,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(value) AS avg_value,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
        |  count(*) AS n_events
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q06_unnest_roundtrip" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem""".stripMargin,

    "q07_timestamp_parse" ->
      """SELECT l_orderkey, l_linenumber,
        |  strptime(strftime(l_shipdate, '%Y-%m-%dT%H:%M'), '%Y-%m-%dT%H:%M') AS event_ts
        |FROM lineitem""".stripMargin,

    "q08_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q09_partition_cols" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  'openmeteo' AS source_name
        |FROM orders""".stripMargin,

    "q10_count" -> "SELECT count(*) AS n FROM lineitem",

    "q11_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",

    "q12_dedup_first_per_key" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,

    "q13_join_inner_broadcast" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name""".stripMargin,

    "q14_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q15_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)""".stripMargin,

    "q16_join_multi" ->
      """SELECT c_mktsegment, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY c_mktsegment, n_name
        |ORDER BY c_mktsegment, n_name""".stripMargin,

    "q17_join_outer" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation LEFT JOIN region ON n_regionkey = r_regionkey""".stripMargin,

    "q18_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,

    "q19_window_running" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events""".stripMargin,

    "q20_window_lag" ->
      """SELECT event_id, user_id,
        |  CAST(CAST(value AS DECIMAL(12,2)) - lag(CAST(value AS DECIMAL(12,2)), 1) OVER (
        |    PARTITION BY user_id ORDER BY event_id) AS DOUBLE) AS delta_value
        |FROM events""".stripMargin,

    "q21_union" ->
      """SELECT c_custkey AS key_id, c_name AS name, 'customer' AS side FROM customer
        |UNION ALL
        |SELECT s_suppkey AS key_id, s_name AS name, 'supplier' AS side FROM supplier""".stripMargin,

    "q22_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,

    "q23_except" ->
      """SELECT p_size FROM part
        |EXCEPT
        |SELECT p_size FROM part WHERE p_brand = 'Brand#1'""".stripMargin,

    "q24_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q25_tumbling_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_sec,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin
  )
}
