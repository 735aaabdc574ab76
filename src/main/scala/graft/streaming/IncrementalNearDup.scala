package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous corpus ingest with NEAR-duplicate rejection against a
  * persistent MinHash band-signature store — the streaming twin of the
  * batch LSH dedup (q31) the way [[IncrementalDedup]] is the streaming twin
  * of exact fingerprint dedup (q80): a new crawl snapshot should not
  * re-admit a lightly-edited copy of a document accepted last month.
  *
  * Store rows are (band, sig, doc_id): the accepted corpus's banded MinHash
  * signatures (bands 0..n-1) plus one exact-md5 SENTINEL row per accepted
  * doc (band = -1) so short documents that yield no shingle signatures are
  * still replay-guarded. A batch doc is rejected when ANY of its rows —
  * banded or sentinel — collides with a stored signature; within the batch,
  * the smallest doc_id in each collision bucket survives and the rest are
  * rejected (a doc rejected through one bucket can still cause its other
  * buckets' members to be rejected — deliberate: those members near-dup a
  * rejected member of an accepted doc's cluster, the transitive policy the
  * batch connected-components dedup (q61) applies globally).
  *
  * Idempotency is content-based, exactly as in [[IncrementalDedup]]: a
  * replayed batch finds its own signatures (at minimum its sentinels)
  * already in the store and appends nothing — no batch-id ledger.
  *
  * Scale: signature generation is the one-pass native [[graft.functions
  * .MinHashSigs]] expression; the store probe is a (band, sig)-keyed semi
  * join — the batch side is small and the store side would be bucketed on
  * (band, sig) at warehouse scale; nothing is ever all-pairs. */
object IncrementalNearDup {

  private def bandSigs(batch: DataFrame, bands: Int, shingleK: Int): DataFrame = {
    val stacked = (0 until bands)
      .map(b => s"$b, concat(mh[${2 * b}], mh[${2 * b + 1}])").mkString(", ")
    val banded = batch
      .select(col("doc_id"), graft.functions.MinHashSigs.minhash_sigs(
        split(col("text"), " "), shingleK, 2 * bands).as("mh"))
      .where(col("mh").isNotNull)
      .select(col("doc_id"), expr(s"stack($bands, $stacked) AS (band, sig)"))
    val sentinels = batch.select(col("doc_id"),
      lit(-1).as("band"), md5(col("text")).as("sig"))
    banded.unionByName(sentinels)
  }

  /** One ingest step: reject near-dups of the store and of smaller-id batch
    * docs, append the survivors' signatures, return the number of ACCEPTED
    * documents. Safe to call with the same batch twice.
    *
    * ORDER MATTERS for idempotency: the within-batch minima are computed
    * over ALL batch docs FIRST, and the store filter is applied after. The
    * reverse order breaks replay: store-filtering first removes the batch's
    * already-stored docs from the bucket-minimum computation, so a doc that
    * was transitively rejected on the first call (through a chain whose
    * middle doc was itself rejected and therefore never stored) would see
    * different minima on replay and slip in. With batch-first minima, the
    * in-batch verdict is a pure function of batch CONTENT and the store
    * filter alone decides replay — every kept doc's signatures are in the
    * store afterward, so a replayed batch always appends nothing. */
  def processBatch(batch: DataFrame, storeDir: String,
                   bands: Int = 4, shingleK: Int = 3): Long = {
    val spark = batch.sparkSession
    val sigs = bandSigs(batch, bands, shingleK)
    // within-batch rejection over the FULL batch: smallest doc_id per
    // collision bucket survives (transitive by design — see class doc)
    val minPerBucket = sigs.groupBy(col("band"), col("sig"))
      .agg(min(col("doc_id")).as("min_id"))
    val rejected = sigs.join(minPerBucket, Seq("band", "sig"))
      .where(col("doc_id") > col("min_id"))
      .select(col("doc_id")).distinct()
    val batchKept = sigs.join(rejected, Seq("doc_id"), "left_anti")
    // cross-batch rejection: any signature collision with the store
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val storeExists = storePath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(storePath)
    val kept =
      if (storeExists) {
        val store = spark.read.parquet(storeDir).select(col("band"), col("sig"))
        val hit = batchKept.join(store, Seq("band", "sig"), "left_semi")
          .select(col("doc_id")).distinct()
        batchKept.join(hit, Seq("doc_id"), "left_anti")
      } else batchKept
    // pin before the append: counting after the write must not recompute
    // the store probe against the store the write just grew
    val pinned = kept.localCheckpoint()
    pinned.write.mode("append").parquet(storeDir)
    pinned.select(col("doc_id")).distinct().count()
  }

  /** Wire [[processBatch]] into a foreachBatch sink. */
  def start(docs: DataFrame, storeDir: String, checkpointDir: String,
            bands: Int = 4, shingleK: Int = 3): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        processBatch(batch.toDF(), storeDir, bands, shingleK): Unit
      }
      .start()
}
