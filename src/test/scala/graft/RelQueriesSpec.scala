package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics the q182–q187 relational batch must hold beyond the oracle
  * hash: zero-bucket preservation through the outer join, argmax/argmin
  * tie-keeping, and the decorrelated-aggregate equivalence. */
class RelQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val testdataRoot = "/root/testdata"
  val sf = s"$testdataRoot/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q183: the zero-order bucket is a first-class row") {
    // customers with no URGENT order must appear as c_count=0, and the
    // distribution must cover every customer exactly once
    val rows = q("q183_order_count_distribution").collect()
    val nCust = Graft.table(spark, sf, "customer").count()
    assert(rows.map(_.getLong(1)).sum == nCust, "distribution must partition customers")
    val urgentCust = Graft.table(spark, sf, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct().count()
    val zeroBucket = rows.find(_.getLong(0) == 0L).map(_.getLong(1)).getOrElse(0L)
    assert(zeroBucket == nCust - urgentCust, "k=0 bucket = customers the fact table never mentions")
  }

  test("q185: every returned supplier achieves the same (max) revenue") {
    val revs = q("q185_top_revenue_supplier").collect().map(_.getDouble(2)).distinct
    assert(revs.length == 1, s"argmax join-back must keep ties only: $revs")
  }

  test("q186: each part's rows all sit at that part's min cost") {
    val bad = q("q186_cheapest_supplier")
      .groupBy(col("p_partkey"))
      .agg((max(col("unit_cost")) =!= min(col("unit_cost"))).as("mixed"))
      .where(col("mixed")).count()
    assert(bad == 0, "per-part min join-back leaked a non-min cost")
  }

  test("q182: decorrelated aggregate equals a correlated-subquery SQL run") {
    val li = Graft.table(spark, sf, "lineitem")
    val part = Graft.table(spark, sf, "part")
    li.createOrReplaceTempView("li_q182")
    part.createOrReplaceTempView("part_q182")
    val corr = spark.sql(
      """SELECT count(*) AS n_small
        |FROM li_q182 l JOIN part_q182 p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#3' OR p.p_brand = 'Brand#14')
        |  AND l.l_quantity < 0.2 * (
        |    SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE)
        |    FROM li_q182 l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin)
      .collect()(0).getLong(0)
    val ours = q("q182_small_order_revenue").collect()(0).getLong(0)
    assert(ours == corr, "manual decorrelation must match the correlated form")
  }

  test("q187: nation pairs are asymmetric-complete and never self-paired") {
    val pairs = q("q187_nation_pair_volume")
      .select(col("supp_nation"), col("cust_nation")).distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.forall { case (a, b) => a != b }, "self-trade must be excluded")
    assert(pairs.nonEmpty)
  }

  test("q188: semi join equals the correlated EXISTS form, orders never duplicate") {
    Graft.table(spark, sf, "orders").createOrReplaceTempView("ord_q188")
    Graft.table(spark, sf, "lineitem").createOrReplaceTempView("li_q188")
    val exists = spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM ord_q188 o
        |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1995-07-01'
        |  AND EXISTS (
        |    SELECT 1 FROM li_q188 l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
        |GROUP BY o_orderpriority""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val ours = q("q188_priority_late_orders")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(ours == exists, "LEFT SEMI must reproduce EXISTS exactly")
    assert(ours.values.sum > 0)
  }

  test("q190: the two CASE buckets partition the late lines per flag") {
    val rows = q("q190_late_line_priority_mix").collect()
    val total = Graft.table(spark, sf, "lineitem")
      .join(Graft.table(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total,
      "high + low buckets must cover every late line exactly once")
  }

  test("q191: blacklisted suppliers never reach a group's distinct count") {
    // sf0.001 draws no negative-balance supplier, so the blacklist would be
    // vacuous there — this check runs at sf0.01 where it bites
    val sf01 = s"$testdataRoot/sf0.01"
    val bad = Graft.table(spark, sf01, "supplier")
      .where(col("s_acctbal") < 0).select(col("s_suppkey"))
      .collect().map(_.getLong(0)).toSet
    assert(bad.nonEmpty, "fixture must contain negative-balance suppliers")
    val byHand = Graft.table(spark, sf01, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(Graft.table(spark, sf01, "part"), col("l_partkey") === col("p_partkey"))
      .where(col("p_brand") =!= "Brand#5" && col("p_size").isin(1, 4, 9, 16, 25, 36))
      .collect()
      .filterNot(r => bad.contains(r.getAs[Long]("l_suppkey")))
      .groupBy(r => (r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
        r.getAs[Int]("p_size")))
      .view.mapValues(_.map(_.getAs[Long]("l_suppkey")).distinct.length.toLong).toMap
    val ours = SparkEntry.queries("q191_part_supplier_counts")(spark, sf01).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getInt(2)), r.getLong(3))).toMap
    assert(ours == byHand, "anti-join blacklist must match the NOT-IN-by-hand run")
  }

  test("q192: every returned supplier has a bulk pair; non-bulk suppliers are absent") {
    val pairQty = Graft.table(spark, sf, "lineitem")
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .join(Graft.table(spark, sf, "part").where(col("p_name").like("%bolt%"))
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDecimal(2))))
    // mirror the query's decimal-then-double discipline: sum the pair
    // quantities exactly, cast to double only at the final comparison
    val means = pairQty.groupBy(_._1)
      .view.mapValues(ps => ps.map(_._3).sum.toDouble / ps.length).toMap
    val bulk = pairQty.filter { case (p, _, qty) =>
      qty.toDouble > 1.5 * means(p) }.map(_._2).toSet
    val ours = q("q192_bulk_part_suppliers").collect().map(_.getLong(0)).toSet
    assert(ours == bulk, "semi-join list must equal the by-hand bulk supplier set")
  }

  test("q189: profit reconciles against independently-computed components") {
    val rows = q("q189_nation_type_profit").collect()
    assert(rows.nonEmpty)
    val joined = Graft.table(spark, sf, "lineitem")
      .join(Graft.table(spark, sf, "part").where(col("p_name").like("%red%")),
        col("l_partkey") === col("p_partkey"))
      .join(Graft.table(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Graft.table(spark, sf, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Graft.table(spark, sf, "nation"), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(12,2)"))).as("rev"),
        sum(col("p_retailprice").cast("decimal(12,2)") *
          col("l_quantity").cast("decimal(12,2)")).as("cost"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        r.getDecimal(2).doubleValue - r.getDecimal(3).doubleValue / 10.0)).toMap
    rows.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      assert(math.abs(r.getDouble(2) - joined(k)) < 1e-6,
        s"profit mismatch at $k")
    }
  }
}
