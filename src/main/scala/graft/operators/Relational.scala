package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Core relational operator helpers — the generalized §2 surface of SURVEY.md
  * (projection/cast/alias, filters, global & keyed aggregation, top-k, dedup)
  * exposed as composable functions over arbitrary DataFrames.
  *
  * Numeric determinism: double addition is order-dependent, and Spark's
  * partial/final aggregation order differs run-to-run and from any single-node
  * oracle. Every SUM/AVG that must hash-match an oracle is computed over
  * DECIMAL (exact, associative) and only cast back to DOUBLE at the end. This
  * also makes results stable across partition counts — i.e. the same answer on
  * local[32] and on a 1000-executor cluster.
  */
object Relational {

  /** Exact fixed-point view of a (money-like, 2dp) double column. */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Order-independent exact sum of a 2dp double column, returned as double. */
  def sumExact(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-independent exact average (sum/count in exact arithmetic, one final
    * double division). */
  def avgExact(c: Column): Column = sum(dec(c)).cast("double") / count(c)

  /** Deterministic top-k: total order via explicit tie-breaker columns.
    * Physical plan is TakeOrderedAndProject — no global sort, no full shuffle;
    * each partition keeps k rows, driver merges. Safe at any scale for small k. */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Deterministic keyed dedup: keeps exactly one row per key, chosen by the
    * given total order (unlike dropDuplicates, which keeps an arbitrary row).
    * One shuffle on the key; no driver involvement. */
  def dedupeByKey(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Group-wise top-k by (score DESC, id ASC) through
    * [[graft.functions.TopKAgg]] — a k-bounded partial aggregation, NOT a
    * rank window: each map task ships at most k (score, id) pairs per group
    * instead of feeding every row of every group through a sort-shuffle.
    * Same rows as `row_number().over(partitionBy(keys).orderBy(...)) <= k`
    * (which is what a SQL oracle runs); O(k) state per (group, task).
    * Score and id are carried through the aggregate, so the output holds
    * the key columns plus (rnk, idCol, scoreCol as double). */
  def topKPerKey(df: DataFrame, keys: Seq[String], scoreCol: String,
                 idCol: String, k: Int): DataFrame = {
    val topk = graft.functions.TopKAgg.columnAgg(k)
    df.groupBy(keys.map(col): _*)
      .agg(topk(col(scoreCol).cast("double"), col(idCol).cast("long")).as("tk"))
      .select(keys.map(col) :+ posexplode(col("tk")): _*)
      .select(keys.map(col) ++ Seq(
        (col("pos") + 1).cast("bigint").as("rnk"),
        col("col._2").as(idCol),
        col("col._1").as(scoreCol)): _*)
  }
}
