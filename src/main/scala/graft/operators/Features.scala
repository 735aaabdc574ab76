package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering operators for model-training prep over warehouse
  * tables: smoothed target encoding, equi-depth binning against exact
  * quantile edges, multiplicative-hash feature bucketing (the hashing
  * trick's collision audit), and categorical cross frequency/lift.
  *
  * Scale design shared by all four: every operator reduces the data to a
  * bounded model table first (one row per category / bin / bucket / cross
  * cell) with a single keyed aggregation, and only ever broadcasts
  * 1-row-or-category-bounded tables. No operator carries a global sort or
  * an unbounded window: equi-depth edges come from a one-row `percentile`
  * aggregate rather than an ntile over the data (an ntile is a global
  * sort-shuffle; the edge aggregate is a single reduce whose swap for
  * `approx_percentile` at extreme scale changes one function name, the
  * q49/q96 posture).
  *
  * Determinism: money sums go through DECIMAL(12,2) ([[Relational.dec]]);
  * doubles appear only in final formulas written with the same operation
  * order as the DuckDB oracle.
  */
object Features {

  import Relational.dec

  /** Smoothed (m-estimate) target encoding of `catCol` by the mean of
    * `targetCol`: enc = (sum_cat + m * global_mean) / (n_cat + m).
    * The classic mean-encoding regularizer — rare categories shrink
    * toward the global mean instead of memorizing noise.
    *
    * One keyed agg (category-bounded result) + one 1-row global agg,
    * combined by broadcast. Output: category, n, raw_mean, enc.
    */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
                   m: Double): DataFrame = {
    val perCat = df.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n"), sum(dec(col(targetCol))).as("__s"))
    val global = df.agg(sum(dec(col(targetCol))).as("__gs"),
      count(lit(1)).as("__gn"))
    perCat.crossJoin(broadcast(global))
      .select(col("category"), col("n"),
        (col("__s").cast("double") / col("n")).as("raw_mean"),
        ((col("__s").cast("double") +
          lit(m) * (col("__gs").cast("double") / col("__gn"))) /
          (col("n") + lit(m))).as("enc"))
  }

  /** Equi-depth binning of `valCol` into `bins` buckets against exact
    * interpolated quantile edges, with a per-bin profile (count, min,
    * max, exact mean). Bin b spans (edge_{b-1}, edge_b]; membership is
    * `1 + |{edges e : v > e}|` evaluated in-row against the broadcast
    * edge array — no global ntile sort anywhere.
    */
  def equidepthProfile(df: DataFrame, valCol: String, bins: Int): DataFrame = {
    val probs = (1 until bins).map(i => i.toDouble / bins)
      .map(p => s"${p}D").mkString(", ")
    val edges = df.agg(
      expr(s"percentile($valCol, array($probs))").as("__edges"))
    df.crossJoin(broadcast(edges))
      .select(col(valCol).as("__v"),
        (size(filter(col("__edges"), e => col("__v") > e)) + 1)
          .cast("bigint").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min("__v").as("lo"), max("__v").as("hi"),
        Relational.avgExact(col("__v")).as("mean"))
  }

  /** Hashing-trick bucket audit: Knuth multiplicative hash of an integral
    * key into `buckets` buckets, with per-bucket load and the collision
    * profile a fixed-width feature space implies. The hash is
    * (k mod 2^32) * 2654435761 mod 2^32 mod buckets, computed via a
    * 16-bit split of the key so no intermediate exceeds ~2^33: the naive
    * single multiply wraps 64-bit for keys ≳ 3.46e9 (and engines like
    * DuckDB ERROR on BIGINT overflow instead of wrapping), which broke
    * the bit-for-bit portability claim outside small key ranges
    * (ADVICE r10). All arithmetic stays in safely-positive BIGINT range,
    * so any engine reproduces it bit-for-bit for any non-negative key.
    */
  def hashBuckets(df: DataFrame, keyCol: String, buckets: Int): DataFrame = {
    val c = 2654435761L
    val k32 = col(keyCol).cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    val kh = shiftrightunsigned(k32, 16)                 // high 16 bits
    val kl = k32.bitwiseAND(lit(0xFFFFL))                // low 16 bits
    // (kh*2^16 + kl)*c mod 2^32 = ((kh*c mod 2^16)*2^16 + kl*c) mod 2^32;
    // max intermediate 65535*c + 2^32 ≈ 1.7e14 — no 64-bit wrap anywhere.
    val prod = (kl * lit(c) +
        (kh * lit(c)).bitwiseAND(lit(0xFFFFL)) * lit(65536L))
      .bitwiseAND(lit(0xFFFFFFFFL))
    df.select((prod % lit(buckets.toLong)).as("bucket"), col(keyCol).as("__k"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_keys"),
        countDistinct(col("__k")).as("n_distinct"),
        min("__k").as("min_key"), max("__k").as("max_key"))
  }

  /** Crossed-categorical frequency with independence lift:
    * lift = n_cell * N / (n_row * n_col). One keyed agg per marginal
    * (both category-bounded) + the cell agg; marginals join back
    * broadcast. Exact integer counts; the lift double is the only float.
    */
  def crossLift(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
    val aTot = df.groupBy(col(aCol).as("a")).agg(count(lit(1)).as("__na"))
    val bTot = df.groupBy(col(bCol).as("b")).agg(count(lit(1)).as("__nb"))
    val tot = df.agg(count(lit(1)).as("__nt"))
    cells.join(broadcast(aTot), "a").join(broadcast(bTot), "b")
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("n"),
        (col("n").cast("double") * col("__nt") /
          (col("__na").cast("double") * col("__nb"))).as("lift"))
  }
}
