package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Query-scoped registry for intra-operator persists.
  *
  * Operators that feed one intermediate to several consumers (a shingle/gram
  * table read by both sides of a self-join, a signature table probed twice)
  * persist it through [[persist]] instead of calling `DataFrame.persist`
  * directly; the HARNESS (Bench / Verify / a spec) calls [[drain]] after
  * materializing each query, releasing every block the query pinned.
  * Without this discipline the 80+-query bench accumulates cached blocks for
  * the whole session — r5 measured an unrelated query (q47 cube) regressing
  * 2.5× purely from that cache pressure.
  *
  * Deliberately NOT for cross-query shared intermediates (the LSH candidate
  * graph feeding q31/q60/q61 persists directly and lives for the session —
  * that sharing is the point); this is for persists whose last consumer is
  * inside the same query plan.
  */
object CacheScope {

  private val reg = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK) and register it for the next [[drain]]. */
  def persist(df: DataFrame): DataFrame = {
    reg.add(df)
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist (non-blocking) everything registered since the last drain. */
  def drain(): Unit = {
    var d = reg.poll()
    while (d != null) { d.unpersist(blocking = false); d = reg.poll() }
  }
}
