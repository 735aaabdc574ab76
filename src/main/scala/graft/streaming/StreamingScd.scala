package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Continuously-maintained SCD Type-2 history: each arriving snapshot
  * (one micro-batch = one load day's full table state) merges into a
  * persistent versioned store — the streaming form of the batch
  * [[graft.operators.Relational.scd2Apply]] (q229), sharing its row
  * fingerprint and its closed/kept/opened contract:
  *
  *  - CLOSED: a current row whose key vanished or changed gets
  *    valid_to = loadDay, is_current = false;
  *  - KEPT: a current row whose payload matches keeps its ORIGINAL
  *    valid_from (history never rewrites);
  *  - OPENED: new or changed keys open at loadDay.
  *  Non-current (already closed) rows are immutable and pass through.
  *
  * Idempotency is content-derived, the [[IncrementalDedup]] argument: a
  * REPLAYED snapshot finds a store whose current rows already match it
  * hash-for-hash, so closed and opened are both empty and kept preserves
  * every valid_from — replay is a no-op, no batch-id ledger needed.
  *
  * Scale: one key-shuffled outer join of the store's CURRENT slice
  * against the snapshot per load; closed history is appended-to, never
  * rejoined (at warehouse scale the store would partition on
  * is_current, so the current slice is one partition read). */
object StreamingScd {

  private val historySchema = StructType(Seq(
    StructField("key", LongType), StructField("row_hash", StringType),
    StructField("valid_from", LongType), StructField("valid_to", LongType),
    StructField("is_current", BooleanType)))

  /** One load step: merge `snapshot` (full state of the table for
    * `loadDay`) into the history at `storeDir`. Safe to call twice with
    * the same snapshot+day. */
  def processBatch(snapshot: DataFrame, storeDir: String, keyCol: String,
                   valueCols: Seq[String], loadDay: Long): Unit = {
    val spark = snapshot.sparkSession
    val newH = snapshot.select(col(keyCol).cast("long").as("__k"),
      graft.operators.Relational.rowHash(valueCols).as("__hn"))
    // content-aware existence: an EMPTY directory (fresh checkpoint dir,
    // pre-created mount) must read as "no history yet", not a parquet
    // schema-inference failure
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(storePath) && fs.listStatus(storePath).nonEmpty
    val store =
      if (exists) spark.read.parquet(storeDir)
      else spark.createDataFrame(spark.sparkContext
        .emptyRDD[Row], historySchema)
    val cur = store.where(col("is_current"))
      .select(col("key").as("__k"), col("row_hash").as("__ho"),
        col("valid_from").as("__vf"))
    val past = store.where(!col("is_current"))
    val j = cur.join(newH, Seq("__k"), "full_outer")
    val closed = j
      .where(col("__ho").isNotNull &&
        (col("__hn").isNull || col("__hn") =!= col("__ho")))
      .select(col("__k").as("key"), col("__ho").as("row_hash"),
        col("__vf").as("valid_from"), lit(loadDay).as("valid_to"),
        lit(false).as("is_current"))
    val kept = j
      .where(col("__ho").isNotNull && col("__hn").isNotNull &&
        col("__ho") === col("__hn"))
      .select(col("__k").as("key"), col("__ho").as("row_hash"),
        col("__vf").as("valid_from"),
        lit(null).cast("bigint").as("valid_to"), lit(true).as("is_current"))
    val opened = j
      .where(col("__hn").isNotNull &&
        (col("__ho").isNull || col("__hn") =!= col("__ho")))
      .select(col("__k").as("key"), col("__hn").as("row_hash"),
        lit(loadDay).as("valid_from"),
        lit(null).cast("bigint").as("valid_to"), lit(true).as("is_current"))
    // pin before overwriting the store this plan reads — the
    // IncrementalDedup self-invalidating-lineage rule
    val next = past.unionByName(closed).unionByName(kept).unionByName(opened)
      .localCheckpoint()
    next.write.mode("overwrite").parquet(storeDir)
  }

  /** Wire [[processBatch]] into a foreachBatch sink; each micro-batch
    * must carry exactly one load day in `loadDayCol`. */
  def start(snapshots: DataFrame, storeDir: String, checkpointDir: String,
            keyCol: String, valueCols: Seq[String],
            loadDayCol: String): StreamingQuery =
    snapshots.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val days = batch.select(col(loadDayCol)).distinct().collect()
        require(days.length <= 1, s"one load day per batch, got ${days.length}")
        days.headOption.foreach { d =>
          processBatch(batch.toDF(), storeDir, keyCol, valueCols, d.getLong(0))
        }
      }
      .start()
}
