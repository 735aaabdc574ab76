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

  /** q321 Fellegi-Sunter parameters, shared verbatim with the oracle:
    * declared m-probabilities per comparison field, the name-agreement
    * JW threshold, and the match/possible decision cuts in micro-nats. */
  private val fsMType = 0.95
  private val fsMSize = 0.85
  private val fsMBand = 0.80
  private val fsMName = 0.90
  private val fsJw = 0.92
  private val fsUpper = 4000000L
  private val fsLower = 0L

  val queries: Map[String, Q] = Map(

    // Within-brand approximate name matches: block on p_brand (cap 100
    // smallest partkeys per block), score Jaro-Winkler, keep >= 0.88.
    // See EntityRes.blockedNameMatch for the Σ|b|² / cap² scale bound.
    "q283_er_name_match" -> ((s, d) =>
      EntityRes.blockedNameMatch(table(s, d, "part"), "p_partkey",
        "p_name", Seq("p_brand"), cap = erCap, threshold = erThreshold)),

    // Fellegi-Sunter probabilistic linkage on the q283 candidate space:
    // four-field agreement vectors (type/size/price-band/JW-name),
    // data-estimated u-probabilities, declared m's, micro-nat
    // log-likelihood weights, match/possible/non_match decisions.
    "q321_fs_linkage" -> ((s, d) =>
      EntityRes.fsLinkage(table(s, d, "part"), "p_partkey", "p_name",
        "p_brand", "p_type", "p_size", "p_retailprice", cap = erCap,
        jwThreshold = fsJw, mType = fsMType, mSize = fsMSize,
        mBand = fsMBand, mName = fsMName, upperMicro = fsUpper,
        lowerMicro = fsLower)))

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
         |  >= '$erThreshold'::DOUBLE""".stripMargin,

    // Mirrors EntityRes.fsLinkage: same capped blocked pairs, Σf²/n²
    // categorical u's, pair-sample name u, identical ln sequences
    // micro-quantized at first appearance, exact BIGINT weight totals.
    // The 1−m literals are JVM-computed and interpolated so both
    // engines parse the identical double.
    "q321_fs_linkage" ->
      s"""WITH base AS (
         |  SELECT p_brand, p_partkey, p_name, p_type, p_size,
         |    CAST(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100
         |      AS DECIMAL(18,0)) AS BIGINT) // 10000 AS band
         |  FROM part),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
         |sqt AS (SELECT CAST(sum(c * c) AS BIGINT) AS sq FROM
         |  (SELECT CAST(count(*) AS BIGINT) AS c FROM base
         |   GROUP BY p_type)),
         |sqs AS (SELECT CAST(sum(c * c) AS BIGINT) AS sq FROM
         |  (SELECT CAST(count(*) AS BIGINT) AS c FROM base
         |   GROUP BY p_size)),
         |sqb AS (SELECT CAST(sum(c * c) AS BIGINT) AS sq FROM
         |  (SELECT CAST(count(*) AS BIGINT) AS c FROM base
         |   GROUP BY band)),
         |r AS (SELECT base.*, row_number() OVER (PARTITION BY p_brand
         |    ORDER BY p_partkey) AS rn FROM base),
         |k AS (SELECT p_brand, p_partkey, p_name, p_type, p_size, band
         |  FROM r WHERE rn <= $erCap),
         |pairs AS (
         |  SELECT a.p_brand, a.p_partkey AS id_a, b.p_partkey AS id_b,
         |    CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END AS agr_type,
         |    CASE WHEN a.p_size = b.p_size THEN 1 ELSE 0 END AS agr_size,
         |    CASE WHEN a.band = b.band THEN 1 ELSE 0 END AS agr_band,
         |    CASE WHEN jaro_winkler_similarity(a.p_name, b.p_name)
         |      >= '$fsJw'::DOUBLE THEN 1 ELSE 0 END AS agr_name
         |  FROM k a JOIN k b ON a.p_brand = b.p_brand
         |    AND a.p_partkey < b.p_partkey),
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS np,
         |  CAST(sum(agr_name) AS BIGINT) AS na FROM pairs),
         |u AS (SELECT
         |    CAST(sqt.sq AS DOUBLE)
         |      / (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE)) AS ut,
         |    CAST(sqs.sq AS DOUBLE)
         |      / (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE)) AS us,
         |    CAST(sqb.sq AS DOUBLE)
         |      / (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE)) AS ub,
         |    CAST(ns.na AS DOUBLE) / CAST(ns.np AS DOUBLE) AS un
         |  FROM sqt, sqs, sqb, n, ns),
         |w AS (
         |  SELECT p.*,
         |    CASE WHEN agr_type = 1 THEN CAST(round(
         |        ln('$fsMType'::DOUBLE / ut) * '1000000'::DOUBLE)
         |        AS BIGINT)
         |      ELSE CAST(round(ln('${1.0 - fsMType}'::DOUBLE
         |        / ('1.0'::DOUBLE - ut)) * '1000000'::DOUBLE) AS BIGINT)
         |      END AS wt,
         |    CASE WHEN agr_size = 1 THEN CAST(round(
         |        ln('$fsMSize'::DOUBLE / us) * '1000000'::DOUBLE)
         |        AS BIGINT)
         |      ELSE CAST(round(ln('${1.0 - fsMSize}'::DOUBLE
         |        / ('1.0'::DOUBLE - us)) * '1000000'::DOUBLE) AS BIGINT)
         |      END AS ws,
         |    CASE WHEN agr_band = 1 THEN CAST(round(
         |        ln('$fsMBand'::DOUBLE / ub) * '1000000'::DOUBLE)
         |        AS BIGINT)
         |      ELSE CAST(round(ln('${1.0 - fsMBand}'::DOUBLE
         |        / ('1.0'::DOUBLE - ub)) * '1000000'::DOUBLE) AS BIGINT)
         |      END AS wb,
         |    CASE WHEN agr_name = 1 THEN CAST(round(
         |        ln('$fsMName'::DOUBLE / un) * '1000000'::DOUBLE)
         |        AS BIGINT)
         |      ELSE CAST(round(ln('${1.0 - fsMName}'::DOUBLE
         |        / ('1.0'::DOUBLE - un)) * '1000000'::DOUBLE) AS BIGINT)
         |      END AS wn
         |  FROM pairs p CROSS JOIN u)
         |SELECT p_brand, id_a, id_b, agr_type, agr_size, agr_band,
         |  agr_name, wt + ws + wb + wn AS weight_micro,
         |  CASE WHEN wt + ws + wb + wn >= $fsUpper THEN 'match'
         |    WHEN wt + ws + wb + wn >= $fsLower THEN 'possible'
         |    ELSE 'non_match' END AS decision
         |FROM w""".stripMargin)
}
