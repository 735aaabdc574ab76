package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, explode, lit}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingAgg.Event

class StreamingTopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  // one skewed window (10:00): "aaa" x36 (60% share — beyond the
  // estimator's 2/sqrt(k)=0.5 separation bound at k=16), "bbb" x12,
  // 12 singleton tail terms — plus one tiny window (12:00) with 5
  // occurrences < k, where the sample IS the window and estimates
  // must be exact
  private def corpus: Seq[Event] = {
    val big = (1 to 36).map(i => Event(i.toLong,
      ts(f"2025-01-01 10:${i % 60}%02d:00"), 1L, "aaa", 1.0)) ++
      (37 to 48).map(i => Event(i.toLong,
        ts(f"2025-01-01 10:${i % 60}%02d:00"), 1L, "bbb", 1.0)) ++
      (49 to 60).map(i => Event(i.toLong,
        ts(f"2025-01-01 10:${i % 60}%02d:00"), 1L, f"t${i - 48}%02d", 1.0))
    val tiny = Seq("x", "x", "x", "y", "z").zipWithIndex.map { case (t, i) =>
      Event(100L + i, ts("2025-01-01 12:05:00"), 1L, t, 1.0)
    }
    big ++ tiny
  }

  test("streaming top-k terms: micro-batch split invariant, exact when n <= k, heavy term on top") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val evs = corpus
    val sk = graft.streaming.StreamingTopK.termSamples(
      input.toDF(), "ts", "event_id", "event_type", k = 16,
      windowDur = "1 hour", watermark = "10 minutes")
    val q = sk.writeStream.format("memory").queryName("topk_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      // split lands MID-window so the emitted sample must come from a
      // cross-batch state merge
      input.addData(evs.take(17): _*)
      q.processAllAvailable()
      input.addData(evs.drop(17): _*)
      q.processAllAvailable()
      // update mode: keep each window's LAST emit (max n)
      val sink = spark.sql(
        """SELECT window_start, sample, n FROM (
          |  SELECT *, row_number() OVER (PARTITION BY window_start
          |    ORDER BY n DESC) AS rn FROM topk_stream)
          |WHERE rn = 1""".stripMargin)
      val streamed = graft.streaming.StreamingTopK
        .topKFromSamples(sink, topN = 3)
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getInt(2),
          r.getLong(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet

      // batch reference: the IDENTICAL aggregator + finisher over the
      // same rows in one pass, repartitioned differently — semilattice
      // merge makes both invariant, so equality is bit-for-bit
      val bk = graft.functions.BottomKTermSampleAgg.columnAgg(16)
      val batchSink = evs.toDF().repartition(7)
        .groupBy(org.apache.spark.sql.functions
          .window(col("ts"), "1 hour"))
        .agg(bk(graft.operators.Sketches.hash60(col("event_id")),
          col("event_type")).as("sample"), count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("sample"), col("n"))
      val batch = graft.streaming.StreamingTopK
        .topKFromSamples(batchSink, topN = 3)
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getInt(2),
          r.getLong(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
      assert(streamed == batch,
        s"streamed top-k must be bit-equal to batch: $streamed vs $batch")

      // the 40%-share term dominates the 10:00 window's rank 1
      val big = streamed.filter(_._1 == ts("2025-01-01 10:00:00"))
      assert(big.exists(t => t._2 == "aaa" && t._3 == 1),
        s"heavy term aaa must rank 1: $big")

      // tiny window (n=5 < k=16): sample is the window, estimates exact
      val tiny = streamed.filter(_._1 == ts("2025-01-01 12:00:00"))
        .map(t => (t._2, t._3, t._4, t._6)).toList.sortBy(_._2)
      assert(tiny == List(("x", 1, 3L, 3.0), ("y", 2, 1L, 1.0),
        ("z", 3, 1L, 1.0)), s"tiny window must be exact: $tiny")
    } finally q.stop()
  }

  test("streaming PII census: per-window detector counts match the batch census across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val docs = Seq(
      (ts("2025-01-01 10:05:00"), "contact a@b.co and c.d@e-f.org now"),
      (ts("2025-01-01 10:15:00"), "run 123456789 plain"),
      (ts("2025-01-01 10:25:00"), "ip 10.0.0.1 go https://x.y/z"),
      (ts("2025-01-01 12:05:00"), "nothing suspicious"))
    val q = graft.streaming.StreamingPiiCensus
      .windowedCensus(input.toDF().toDF("ts", "text"), "ts", "text",
        windowDur = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("pii_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val got = spark.sql(
        """SELECT window_start, pii_type, docs, docs_hit, matches FROM (
          |  SELECT *, row_number() OVER (PARTITION BY window_start,
          |    pii_type ORDER BY docs DESC) AS rn FROM pii_stream)
          |WHERE rn = 1""".stripMargin).collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val w1 = ts("2025-01-01 10:00:00")
      assert(got((w1, "email")) == (3L, 1L, 2L))
      assert(got((w1, "digit_run")) == (3L, 1L, 1L))
      assert(got((w1, "ipv4")) == (3L, 1L, 1L))
      assert(got((w1, "url")) == (3L, 1L, 1L))
      assert(got((w1, "hex_secret")) == (3L, 0L, 0L))
      assert(got((ts("2025-01-01 12:00:00"), "email")) == (1L, 0L, 0L))
      assert(got.size == 10, s"every (window, type) cell present: $got")
    } finally q.stop()
  }

  test("streaming MMD drift: emitted cells bit-equal to the batch fold across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Seq[Float])]
    // two windows; window 10:00 carries two drifted groups (a ~ +1 on
    // dim 0, b ~ -1), window 12:00 one group only (no pair emitted)
    val vecs = Seq(
      (ts("2025-01-01 10:05:00"), "a", Seq(1.0f, 0.25f)),
      (ts("2025-01-01 10:10:00"), "a", Seq(0.5f, 0.75f)),
      (ts("2025-01-01 10:15:00"), "a", Seq(1.5f, 0.125f)),
      (ts("2025-01-01 10:20:00"), "b", Seq(-1.0f, 0.25f)),
      (ts("2025-01-01 10:25:00"), "b", Seq(-0.5f, 0.33f)),
      (ts("2025-01-01 12:05:00"), "a", Seq(0.0f, 0.0f)))
    val q = graft.streaming.StreamingMmdDrift.componentSums(
        input.toDF().toDF("ts", "g", "embedding"), "ts", "g", "embedding",
        windowDur = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("mmd_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      // adversarial split: group a's window-1 rows straddle the batches
      input.addData(vecs.take(2): _*)
      q.processAllAvailable()
      input.addData(vecs.drop(2): _*)
      q.processAllAvailable()
      val sink = spark.sql(
        """SELECT window_start, g, d, s, n FROM (
          |  SELECT *, row_number() OVER (PARTITION BY window_start, g, d
          |    ORDER BY n DESC) AS rn FROM mmd_stream)
          |WHERE rn = 1""".stripMargin)
      val streamed = graft.streaming.StreamingMmdDrift.mmdFromSums(sink)
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
      // batch reference: the SAME rows through the batch operator,
      // per-window — micro-unit-at-first-appearance makes it bit-equal
      val batch = vecs.toDF("ts", "g", "embedding")
        .withColumn("w", org.apache.spark.sql.functions
          .window(col("ts"), "1 hour").getField("start"))
        .groupBy(col("w")).agg(count(lit(1)).as("__n"))
        .collect().map(_.getTimestamp(0)).flatMap { w =>
          graft.operators.Similarity.linearMmdDrift(
              vecs.toDF("ts", "g", "embedding")
                .where(org.apache.spark.sql.functions
                  .window(col("ts"), "1 hour").getField("start") === w),
              "g", "embedding")
            .collect().map(r => (w, r.getString(0), r.getString(1),
              r.getLong(2), r.getLong(3), r.getDouble(4)))
        }.toSet
      assert(streamed == batch,
        s"streamed MMD must be bit-equal to batch: $streamed vs $batch")
      // window 1 has the constructed pair; window 2 has one group -> none
      assert(streamed.exists(t => t._1 == ts("2025-01-01 10:00:00") &&
        t._2 == "a" && t._3 == "b" && t._4 == 3L && t._5 == 2L && t._6 > 1.0))
      assert(!streamed.exists(_._1 == ts("2025-01-01 12:00:00")))
    } finally q.stop()
  }

  test("sampledTopTerms (batch twin): exact when n <= k; repartition-invariant") {
    import spark.implicits._
    val occ = Seq(
      ("s1", "o1", "aa"), ("s1", "o2", "aa"), ("s1", "o3", "aa"),
      ("s1", "o4", "bb"), ("s1", "o5", "cc"),
      ("s2", "o6", "zz")).toDF("source", "occ_id", "term")
    def run(parts: Int) = graft.operators.Sketches
      .sampledTopTerms(occ.repartition(parts), "source", "occ_id", "term",
        k = 16, topN = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
    val a = run(1)
    // n < k in both keys: the sample is the key's occurrence set, so
    // counts, shares and estimated counts are all exact
    assert(a == Set(
      ("s1", 1L, "aa", 3L, 0.6, 3.0, 5L),
      ("s1", 2L, "bb", 1L, 0.2, 1.0, 5L),
      ("s2", 1L, "zz", 1L, 1.0, 1.0, 1L)))
    assert(run(7) == a, "estimator must not depend on partitioning")
  }

  test("bottom-k term sample is repartition-invariant and caps at k") {
    import spark.implicits._
    val df = corpus.toDF()
    val bk = graft.functions.BottomKTermSampleAgg.columnAgg(16)
    def sample(parts: Int) = df.repartition(parts)
      .agg(bk(graft.operators.Sketches.hash60(col("event_id")),
        col("event_type")).as("sample"))
      .select(explode(col("sample"))).collect()
      .map(r => r.getStruct(0)).map(s => (s.getLong(0), s.getString(1))).toList
    val a = sample(1); val b = sample(13)
    assert(a == b, "sample must not depend on partitioning")
    assert(a.length == 16 && a == a.sorted, "sorted, capped at k")
  }
}
