package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Graft.table
import graft.operators.EntityRes

/** Entity-resolution batch: blocked Jaro-Winkler candidate matching over
  * part names — the record-linkage stage between exact dedup (q28) and
  * edit-distance near-dup (q152), scored by the native comparator whose
  * bit-level agreement with DuckDB's `jaro_winkler_similarity` the
  * oracle itself enforces on every verified pair.
  */
object EntityResQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q283 blocking cap / threshold. */
  private val erCap = 100
  private val erThreshold = 0.88

  val queries: Map[String, Q] = Map(

    // Within-brand approximate name matches: block on p_brand (cap 100
    // smallest partkeys per block), score Jaro-Winkler, keep >= 0.88.
    // See EntityRes.blockedNameMatch for the Σ|b|² / cap² scale bound.
    "q283_er_name_match" -> ((s, d) =>
      EntityRes.blockedNameMatch(table(s, d, "part"), "p_partkey",
        "p_name", Seq("p_brand"), cap = erCap, threshold = erThreshold)))

  // The threshold rides in as a STRING cast to DOUBLE (bare numeric
  // literals parse as DECIMAL — the q195 lesson); jw itself is raw,
  // asserting true bit-equality of the two implementations.
  val oracle: Map[String, String] = Map(

    "q283_er_name_match" ->
      s"""WITH r AS (
         |  SELECT p_brand, p_partkey, p_name,
         |    row_number() OVER (PARTITION BY p_brand
         |      ORDER BY p_partkey) AS rn
         |  FROM part),
         |b AS (SELECT p_brand, p_partkey, p_name FROM r WHERE rn <= $erCap)
         |SELECT a.p_brand, a.p_partkey AS id_a, b2.p_partkey AS id_b,
         |  jaro_winkler_similarity(a.p_name, b2.p_name) AS jw
         |FROM b a JOIN b b2 ON a.p_brand = b2.p_brand
         |  AND a.p_partkey < b2.p_partkey
         |WHERE jaro_winkler_similarity(a.p_name, b2.p_name)
         |  >= '$erThreshold'::DOUBLE""".stripMargin)
}
