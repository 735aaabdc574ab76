package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingScd

/** The StreamingScd contract: closed/kept/opened rows across two loads,
  * content-derived replay idempotency, agreement with the batch
  * scd2Apply, and the one-day-per-batch stream wiring. */
class StreamingScdSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-scd-$tag").toString

  private def history(dir: String) =
    spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet

  private def day1 = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "payload")
  private def day2 = Seq((1L, "A"), (2L, "B2"), (4L, "D")).toDF("k", "payload")

  private def h(p: String): String =
    spark.range(1).select(md5(concat_ws("", lit(p))).cast("string"))
      .collect()(0).getString(0)

  private def expectedAfterDay2 = Set(
    (2L, h("B"), 1L, 2L, false), (3L, h("C"), 1L, 2L, false), // closed
    (1L, h("A"), 1L, -1L, true),                               // kept, vf=1
    (2L, h("B2"), 2L, -1L, true), (4L, h("D"), 2L, -1L, true)) // opened

  test("two loads produce closed/kept/opened; replay is a no-op") {
    val store = tmp("replay")
    StreamingScd.processBatch(day1, store, "k", Seq("payload"), 1L)
    assert(history(store) ==
      Set((1L, h("A"), 1L, -1L, true), (2L, h("B"), 1L, -1L, true),
        (3L, h("C"), 1L, -1L, true)))
    StreamingScd.processBatch(day2, store, "k", Seq("payload"), 2L)
    assert(history(store) == expectedAfterDay2)
    // replay of the same snapshot+day: content guard, nothing changes
    StreamingScd.processBatch(day2, store, "k", Seq("payload"), 2L)
    assert(history(store) == expectedAfterDay2)
  }

  test("incremental history equals the batch scd2Apply of the same loads") {
    val store = tmp("batcheq")
    StreamingScd.processBatch(day1, store, "k", Seq("payload"), 1L)
    StreamingScd.processBatch(day2, store, "k", Seq("payload"), 2L)
    val batch = graft.operators.Relational
      .scd2Apply(day1, day2, "k", Seq("payload"), 1L, 2L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    assert(history(store) == batch)
  }

  test("stream wiring merges day-tagged snapshot batches") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("stream")
    val input = MemoryStream[(Long, String, Long)]
    val q = StreamingScd.start(
      input.toDF().toDF("k", "payload", "load_day"),
      store, tmp("ckpt"), "k", Seq("payload"), "load_day")
    try {
      input.addData((1L, "A", 1L), (2L, "B", 1L), (3L, "C", 1L))
      q.processAllAvailable()
      input.addData((1L, "A", 2L), (2L, "B2", 2L), (4L, "D", 2L))
      q.processAllAvailable()
      assert(history(store) == expectedAfterDay2)
    } finally q.stop()
  }
}
