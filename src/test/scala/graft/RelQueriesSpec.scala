package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics the q182–q187 relational batch must hold beyond the oracle
  * hash: zero-bucket preservation through the outer join, argmax/argmin
  * tie-keeping, and the decorrelated-aggregate equivalence. */
class RelQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

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
}
