package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/JIT/shuffle machinery so the first timed query doesn't
    // absorb one-time JVM costs (observed ~2-4 s on whichever query ran first).
    Graft.table(spark, sfDir, "nation")
      .groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()
    // Full materialization: the noop sink computes every column of every row
    // (unlike count(), which lets Catalyst prune all projections away).
    // Sorted order => per-query times are comparable across rounds.
    // Failures are NOT swallowed: each failed query is reported in an
    // "errors" map and the process exits nonzero, so a broken query can
    // never masquerade as a fast green bar.
    // SPARK_GRAFT_ONLY=q75,q50 restricts the run for local iteration; the
    // driver never sets it (full suite).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(e.getClass.getSimpleName) }
      // release the query's own persisted intermediates; timed WITH the
      // query (cache lifetime is part of its cost). Cross-query shared
      // caches (the LSH pair graph) are not registered and survive.
      graft.operators.CacheScope.drain()
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // 3-decimal seconds keep the one-line summary short enough to survive
    // log-tail truncation downstream (full-precision doubles pushed the r3
    // line past the tail window and cut q01-q12 out of the round artifact).
    def sec(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(c)) => s"\"" + k + "\":\"" + c + "\"" }
    val errJson = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val total = results.map(_._2).sum
    // Line order is dictated by the driver's ~2 KB log-TAIL capture: the r6
    // artifact lost q01-q25 because the 100-query full-name line overflowed
    // it. So the long full-name line goes FIRST (intact in complete logs,
    // sacrificial in the tail), then per-query CHUNK lines with short keys
    // (qNN prefix — unique by construction; 4 chunks ≈ 400 B each), with the
    // short total line LAST so it always survives.
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs$errJson,"sf":"$sfDir"}""")
    val shortKeyed = results.map { case (k, v, _) =>
      s"\"" + k.takeWhile(_ != '_') + "\":" + sec(v) }
    val nChunks = math.max(1, (shortKeyed.size + 24) / 25)
    shortKeyed.grouped(25).zipWithIndex.foreach { case (chunk, i) =>
      println(s"""{"metric":"queries_${i + 1}of$nChunks","q":${chunk.mkString("{", ",", "}")}}""")
    }
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
