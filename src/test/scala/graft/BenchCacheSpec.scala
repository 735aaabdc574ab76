package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the Bench order-independence contract: every session-shared
  * (TrieMap-memoized) builder in graft.queries must be registered in
  * [[graft.queries.SharedCaches]], and each builder must actually memoize
  * per (session, dir) — otherwise Bench's pre-materialization pass can't
  * keep per-query times free of order-dependent build attribution.
  */
class BenchCacheSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("SharedCaches registry covers every TrieMap-memoized builder in graft.queries") {
    val dir = java.nio.file.Paths.get("src/main/scala/graft/queries")
    assert(java.nio.file.Files.isDirectory(dir), s"expected sources at $dir")
    import scala.jdk.CollectionConverters._
    val caches = java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      .map(src => "TrieMap\\.empty\\[\\(SparkSession, String\\), DataFrame\\]".r
        .findAllIn(src).size)
      .sum
    assert(caches == graft.queries.SharedCaches.builders.size,
      s"$caches TrieMap-memoized caches in graft.queries but " +
        s"${graft.queries.SharedCaches.builders.size} registered in " +
        "SharedCaches.builders — register the new cache (see scaladoc)")
  }

  test("registry is dependency-ordered: dedup_worklist builds AFTER minhash_pair_graph") {
    // dedup_worklist memoizes THROUGH nearDupPairs; if it built first it
    // would absorb minhash's whole pair-graph build and the bench
    // breakdown would misattribute the cost (Bench builds in Seq order).
    val names = graft.queries.SharedCaches.builders.map(_._1)
    assert(names.indexOf("minhash_pair_graph") < names.indexOf("dedup_worklist"),
      s"dependency order violated in SharedCaches.builders: $names")
    // kn_bigram_model memoizes THROUGH kn_doc_bigrams — same rule
    assert(names.indexOf("kn_doc_bigrams") < names.indexOf("kn_bigram_model"),
      s"dependency order violated in SharedCaches.builders: $names")
  }

  test("each registered builder memoizes: second call returns the same plan instance") {
    graft.queries.SharedCaches.builders.foreach { case (name, b) =>
      val first = b(spark, sf)
      val second = b(spark, sf)
      assert(first eq second, s"builder $name did not memoize per (session, dir)")
      assert(first.storageLevel.useMemory || first.storageLevel.useDisk,
        s"builder $name result is not persisted")
    }
  }
}
