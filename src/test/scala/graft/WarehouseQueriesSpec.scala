package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MlOps, Relational, Stats}

/** Fixture semantics for the q226–q230 warehouse/quality batch: stump
  * split exactness + tie-break, orphan accounting, cent-space digit
  * extraction, the full SCD2 row contract, and grouping-sets margins. */
class WarehouseQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("decisionStump: perfect split found, ties break to smallest threshold") {
    val perfect = Seq((1, true), (2, true), (3, false), (4, false))
      .toDF("v", "y")
    val r = MlOps.decisionStump(perfect, "v", col("y")).collect()(0)
    assert(r.getLong(0) == 2 && math.abs(r.getDouble(1)) < 1e-12)
    assert(r.getLong(2) == 2 && r.getLong(3) == 2) // n_left, pos_left
    assert(r.getLong(4) == 2 && r.getLong(5) == 0) // n_right, pos_right
    // thresholds 1 and 2 tie at g = 1/3 — the smaller must win
    val tied = Seq((1, true), (2, false), (3, true)).toDF("v", "y")
    val t = MlOps.decisionStump(tied, "v", col("y")).collect()(0)
    assert(t.getLong(0) == 1, s"tie must break low: ${t.getLong(0)}")
    assert(math.abs(t.getDouble(1) - 1.0 / 3) < 1e-12)
  }

  test("fkAudit: counts orphans per edge, zero for intact edges") {
    val child = Seq((1, "a"), (2, "b"), (9, "c")).toDF("fk", "x")
    val parent = Seq(1, 2, 3).toDF("pk")
    val r = Relational.fkAudit(Seq(("e1", child, "fk", parent, "pk")))
      .collect()(0)
    assert(r.getString(0) == "e1" && r.getLong(1) == 3 && r.getLong(2) == 1)
    assert(math.abs(r.getDouble(3) - 1.0 / 3) < 1e-12)
  }

  test("benfordScreen: cent-space leading digit, zero-filled digit grid") {
    val df = Seq(1.00, 19.99, 0.23).toDF("v") // cents 100, 1999, 23
    val m = Stats.benfordScreen(df, "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.keySet == (1L to 9L).toSet, "all nine digits present")
    assert(m(1L) == 2 && m(2L) == 1 && m(3L) == 0)
  }

  test("scd2Apply: deletes close, inserts open, changes do both") {
    val old = Seq((1, "A"), (2, "B"), (3, "C")).toDF("k", "payload")
    val next = Seq((1, "A"), (2, "B2"), (4, "D")).toDF("k", "payload")
    val rows = Relational.scd2Apply(old, next, "k", Seq("payload"), 1L, 2L)
      .collect()
      .map(r => (r.getInt(0), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(rows == Set(
      (2, 1L, 2L, false), (3, 1L, 2L, false),           // closed: change, delete
      (1, 1L, -1L, true), (2, 2L, -1L, true), (4, 2L, -1L, true))) // open
  }

  test("q230: grouping-sets margins reconcile with the grand total") {
    val rows = SparkEntry.queries("q230_grouping_sets")(
      spark, "/root/testdata/sf0.001").collect()
    val total = rows.filter(_.getLong(4) == 3L)
    assert(total.length == 1, "exactly one grand-total row")
    val n = total(0).getLong(2)
    // each margin set partitions the corpus
    assert(rows.filter(_.getLong(4) == 1L).map(_.getLong(2)).sum == n) // by source
    assert(rows.filter(_.getLong(4) == 2L).map(_.getLong(2)).sum == n) // by lang
    assert(rows.filter(_.getLong(4) == 0L).map(_.getLong(2)).sum == n) // full cross
  }

  test("expectation suite: one pass, null handling, mixed verdicts") {
    import graft.operators.Expectations._
    val df = Seq((Some(1L), "A", 5.0), (Some(2L), "A", 50.0),
      (None, "B", 7.0), (Some(3L), "C", 9.0))
      .toDF("id", "cat", "v")
    val out = evaluate(df, Seq(
      Completeness("id", 1.0),              // 3/4 -> fail
      Distinctness("id", 1.0),              // 3 distinct / 3 non-null -> pass
      Bounds("v", 0.0, 10.0, 0.9),          // 3/4 -> fail
      Membership("cat", Seq("A", "B"), 0.5) // 3/4 -> pass
    )).collect().map(r => r.getString(0) ->
      (r.getDouble(2), r.getBoolean(4))).toMap
    assert(out("completeness") == ((0.75, false)))
    assert(out("distinctness") == ((1.0, true)),
      "distinctness is over non-null values only")
    assert(out("bounds") == ((0.75, false)))
    assert(out("membership") == ((0.75, true)))
    // single-pass shape: the physical plan scans the fixture once
    val plan = evaluate(df, Seq(Completeness("id", 1.0),
      Bounds("v", 0.0, 10.0, 0.9), Membership("cat", Seq("A"), 0.5)))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Union"), "row-level checks must share one agg")
  }

  test("erasureImpact: counts cascade down the FK chain with exact shares") {
    val cust = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("ck", "subject")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 3L), (13L, 4L))
      .toDF("ok", "ck")
    val items = Seq((10L, 1), (10L, 2), (11L, 1), (12L, 1), (13L, 1))
      .toDF("ok", "line")
    val got = graft.operators.Relational.erasureImpact(
      cust.where($"subject"), "ck", Seq(
        ("customer", cust, "ck", "ck"),
        ("orders", orders, "ck", "ok"),
        ("lineitem", items, "ok", "ok")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("customer") == ((2L, 4L, 0.5)))
    assert(got("orders") == ((2L, 4L, 0.5)), "orders of customers 1+2")
    assert(got("lineitem") == ((3L, 5L, 3.0 / 5)),
      s"3 lines under orders 10/11: $got")
  }

  test("q341: join-IVM delta cells reconcile with an independent full recompute") {
    val sf = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("q341_join_ivm")(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Boolean]("consistent")),
      "bilinear delta rule must hold exactly on every priority")
    assert(r.forall(x => x.getAs[Double]("v_incr") == x.getAs[Double]("v_full")))
    // deltas are non-trivial: both change sides carry real mass
    assert(r.exists(_.getAs[Double]("dv_orders") > 0.0))
    assert(r.exists(_.getAs[Double]("dv_lines") > 0.0))
    // independent recompute of the view, different formulation
    val full = graft.Graft.table(spark, sf, "orders")
      .join(graft.Graft.table(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_extendedprice")
        .cast(org.apache.spark.sql.types.DecimalType(12, 2))).as("v"))
      .collect().map(x => x.getString(0) ->
        x.getDecimal(1).doubleValue).toMap
    r.foreach(x => assert(
      x.getAs[Double]("v_full") == full(x.getString(0)),
      s"recompute mismatch for ${x.getString(0)}"))
  }
}
