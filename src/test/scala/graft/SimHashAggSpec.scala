package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{SimHashAgg, TextHashes}

class SimHashAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("chunked-document simhash equals whole-document simhash") {
    import spark.implicits._
    val docs = Graft.table(spark, sf, "documents").limit(50)
    val whole = docs.select(col("doc_id"),
        TextHashes.simhash64(split(col("text"), " ")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // chunk every document into rows of ~7 tokens, then aggregate the votes
    val chunks = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("chunk", (col("pos") / 7).cast("int"))
      .groupBy("doc_id", "chunk")
      .agg(collect_list(col("tok")).as("tokens"))
      .as[(Long, Int, Seq[String])]

    val agg = chunks.groupByKey(_._1).mapValues(_._3)
      .agg(SimHashAgg.toColumn.name("h"))
      .collect().toMap
    assert(agg == whole, "vote aggregation across chunks must reproduce the one-row hash")
  }

  test("aggregated simhash is partition- and order-independent") {
    import spark.implicits._
    val data = (0 until 40).map(i => (i % 4L, Seq(s"tok$i", "common", s"x${i % 5}")))
    def hash(par: Int) =
      data.toDF("k", "tokens").repartition(par).as[(Long, Seq[String])]
        .groupByKey(_._1).mapValues(_._2)
        .agg(SimHashAgg.toColumn.name("h"))
        .collect().sortBy(_._1)
    assert(hash(1).sameElements(hash(13)))
  }
}
