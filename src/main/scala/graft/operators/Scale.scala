package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operators whose whole point is surviving 100x data: salting for skewed
  * aggregation keys and bucketing for shuffle-free co-located joins. */
object Scale {

  /** Two-phase salted sum/count for a LOW-CARDINALITY or skewed key: phase 1
    * aggregates on (key, salt) — spreading each hot key over `salts` reducers
    * — phase 2 combines partials per key. Decimal-exact, so the result is
    * bit-identical to a direct groupBy at any salt count or partitioning.
    * The salt is a deterministic hash of the value column (no rand(): replays
    * and retries must produce identical partials). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(value), lit(salts)))
      .groupBy(key, col("__salt"))
      .agg(sum(Relational.dec(value)).as("__ps"), count(lit(1)).as("__pc"))
      .groupBy(key)
      .agg(sum(col("__ps")).cast("double").as("sum_value"),
        sum(col("__pc")).as("n"))

  /** Write a table bucketed+sorted on the join key: equi-joins between tables
    * bucketed the same way need NO shuffle at read time — the co-location is
    * paid once at write time, amortized over every subsequent join. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables (shuffle-free when bucket specs match). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      col(leftKey) === col(rightKey))
}
