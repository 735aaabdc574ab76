package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextPrep

class TextPrepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def chunksOf(nTokens: Int, size: Int, stride: Int): Seq[(Long, Int)] = {
    import spark.implicits._
    val text = (1 to nTokens).map(i => s"t$i").mkString(" ")
    TextPrep.chunk(Seq((1, text)).toDF("id", "text"), "id", "text", size, stride)
      .select(col("chunk_id"),
        org.apache.spark.sql.functions.size(split(col("chunk"), " ")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
  }

  test("chunking: short doc yields one whole-doc chunk") {
    assert(chunksOf(10, 32, 24) == Seq((0L, 10)))
    assert(chunksOf(24, 32, 24) == Seq((0L, 24)))
  }

  test("chunking: stride boundary produces a trailing short chunk with overlap") {
    // 40 tokens, windows start at 0 and 24: [1..32] and [25..40]
    assert(chunksOf(40, 32, 24) == Seq((0L, 32), (1L, 16)))
    // consecutive chunks overlap by size - stride = 8 tokens
    import spark.implicits._
    val text = (1 to 40).map(i => s"t$i").mkString(" ")
    val rows = TextPrep.chunk(Seq((1, text)).toDF("id", "text"), "id", "text", 32, 24)
      .orderBy("chunk_id").collect().map(_.getString(2).split(" ").toSeq)
    assert(rows(0).takeRight(8) == rows(1).take(8))
  }

  test("packing: offsets are the contiguous token stream cut every ctxLen, per bucket") {
    import spark.implicits._
    // 6 docs of 100 tokens each in 2 buckets -> per bucket a 300-token
    // stream cut every 128: starts at 0,100,200 -> windows 0,0,1
    val docs = (0 until 6)
      .map(i => (i.toLong, (1 to 100).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = TextPrep.packSequences(docs, "doc_id", "text", ctxLen = 128, nBuckets = 2)
      .orderBy("bucket", "doc_id").collect()
    assert(packed.length == 6)
    for (b <- 0 to 1) {
      val rows = packed.filter(_.getLong(1) == b)
      assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 0L, 1L), "seq ids")
      assert(rows.map(_.getLong(3)).toSeq == Seq(0L, 100L, 72L), "offsets")
    }
    // every offset is inside the window and token counts survive
    assert(packed.forall(r => r.getLong(3) >= 0 && r.getLong(3) < 128))
    assert(packed.map(_.getLong(4)).sum == 600)
  }

  test("packing: window is partitioned by bucket — never a global sort") {
    import spark.implicits._
    val docs = (0 until 20).map(i => (i.toLong, "a b c")).toDF("doc_id", "text")
    val p = TextPrep.packSequences(docs, "doc_id", "text", 64, 4)
      .queryExecution.executedPlan.toString
    // physical Window prints [functions], [partitionSpec], [orderSpec] —
    // the partition spec bracket must carry the bucket key
    val winLine = p.linesIterator.find(_.contains("Window "))
    assert(winLine.isDefined, p.linesIterator.take(8).mkString("\n"))
    assert(winLine.get.contains("], [bucket#"),
      s"packing must shard the cumsum window by bucket: ${winLine.get}")
  }

  test("chunking: every token of the source appears in some chunk") {
    import spark.implicits._
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val covered = TextPrep.chunk(Seq((1, text)).toDF("id", "text"), "id", "text", 32, 24)
      .select(explode(split(col("chunk"), " "))).distinct().count()
    assert(covered == 100)
  }

  test("normalize collapses mixed whitespace and case") {
    import spark.implicits._
    val out = Seq(("  A  B\t\tC\nd  ")).toDF("t")
      .select(TextPrep.normalize(col("t"))).collect().head.getString(0)
    assert(out == "a b c d")
  }

  test("redact replaces emails and long digit runs, leaves short numbers") {
    import spark.implicits._
    val out = Seq(("mail a.b+c@x-y.org num 1234567 keep 123 end")).toDF("t")
      .select(TextPrep.redact(col("t"))).collect().head.getString(0)
    assert(out == "mail <EMAIL> num <NUM> keep 123 end")
  }
}
