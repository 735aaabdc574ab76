package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.StringSimFunctions.jaro_winkler

/** Entity resolution: blocked approximate-name matching — the
  * record-linkage candidate stage (Fellegi & Sunter 1969's comparison
  * space, with blocking as the standard scale device): records compare
  * only WITHIN a block (shared coarse key), scored by the native
  * Jaro-Winkler comparator ([[graft.functions.JaroWinkler]]), never
  * all-pairs.
  *
  * Scale design — the Affinity/TextDedup bucketed-pair posture:
  *  - the candidate join shuffles on the BLOCK key (equi-join), so pair
  *    expansion is Σ_b |b|², never n²;
  *  - a hot block (a too-coarse key at crawl scale) is capped
  *    deterministically to the `cap` smallest ids — the df-cap argument:
  *    cap² bounds every block's expansion, and the cap is the knob the
  *    blocking-key design would otherwise hide;
  *  - the comparator is a codegen expression inside the join's
  *    whole-stage span — no UDF, no interpreted fallback.
  */
object EntityRes {

  /** Candidate pairs (id_a < id_b) within each block whose Jaro-Winkler
    * name similarity reaches `threshold`. Output: blockCols, id_a, id_b,
    * jw. Blocks larger than `cap` keep their `cap` smallest ids
    * (deterministic; the per-block rank window partitions by block). */
  def blockedNameMatch(df: DataFrame, idCol: String, nameCol: String,
                       blockCols: Seq[String], cap: Int,
                       threshold: Double): DataFrame = {
    val ranked = df
      .select(blockCols.map(col) ++
        Seq(col(idCol).as("__id"), col(nameCol).as("__nm")): _*)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(blockCols.map(col): _*).orderBy(col("__id"))))
      .where(col("__rn") <= cap)
      .drop("__rn")
    // fresh lineage on both sides: a self-join on shared column ids would
    // otherwise resolve both sides to the same attribute
    val a = ranked.toDF(blockCols ++ Seq("id_a", "name_a"): _*)
    val b = ranked.toDF(blockCols ++ Seq("id_b", "name_b"): _*)
    a.join(b, blockCols)
      .where(col("id_a") < col("id_b"))
      .withColumn("jw", jaro_winkler(col("name_a"), col("name_b")))
      .where(col("jw") >= threshold)
      .select(blockCols.map(col) ++
        Seq(col("id_a"), col("id_b"), col("jw")): _*)
  }

  /** Fellegi-Sunter (1969) probabilistic linkage over the same blocked
    * candidate space as [[blockedNameMatch]]: every capped within-block
    * pair is scored on a four-field agreement vector — exact type, exact
    * size, price band ($100 integer-cents bands), and Jaro-Winkler name
    * agreement at `jwThreshold` — and each field contributes its
    * log-likelihood match weight ln(m/u) on agreement or
    * ln((1−m)/(1−u)) on disagreement.
    *
    * m-probabilities are declared parameters (the reviewer's prior that
    * true matches agree on the field); u-probabilities are estimated
    * from the data — for the three categorical fields the random-pair
    * agreement probability Σ_v f_v²/n² over the FULL table, for the name
    * field the observed agreement rate of the blocked candidate space
    * itself (the standard comparison-space estimate; slightly match-
    * inflated, which only makes the name weight conservative).
    *
    * Determinism: each per-field weight is micro-quantized at its FIRST
    * appearance (round(ln·1e6) → BIGINT, the CorpusStats discipline), so
    * the pair total is an exact BIGINT sum of four integers. Scale: the
    * u stats are keyed aggregates + 1-row broadcasts; the pair space is
    * the capped block join (Σ_b min(|b|,cap)² — never n²); Σc² stays in
    * BIGINT up to ~3·10⁹ rows per value, DECIMAL-widen beyond.
    * Output: block, id_a, id_b, agr_type/size/band/name (0/1),
    * weight_micro, decision (match ≥ `upperMicro` / possible ≥
    * `lowerMicro` / non_match). */
  def fsLinkage(df: DataFrame, idCol: String, nameCol: String,
                blockCol: String, typeCol: String, sizeCol: String,
                priceCol: String, cap: Int, jwThreshold: Double,
                mType: Double, mSize: Double, mBand: Double, mName: Double,
                upperMicro: Long, lowerMicro: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val base = df.select(col(blockCol), col(idCol), col(nameCol),
        col(typeCol), col(sizeCol),
        (col(priceCol).cast(DecimalType(12, 2)) * 100)
          .cast(DecimalType(18, 0)).cast("long").as("__cents"))
      .withColumn("__band", expr("__cents DIV 10000"))
    val n1 = base.agg(count(lit(1)).as("__n"))
    def sqFreq(c: String, alias: String) =
      base.groupBy(col(c)).agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c") * col("__c")).as(alias))
    val stats = n1
      .crossJoin(broadcast(sqFreq(typeCol, "__sqt")))
      .crossJoin(broadcast(sqFreq(sizeCol, "__sqs")))
      .crossJoin(broadcast(sqFreq("__band", "__sqb")))
    val ranked = base
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(blockCol)).orderBy(col(idCol))))
      .where(col("__rn") <= cap)
      .drop("__rn", "__cents")
    val a = ranked.toDF(blockCol, "id_a", "name_a", "type_a", "size_a",
      "band_a")
    val b = ranked.toDF(blockCol, "id_b", "name_b", "type_b", "size_b",
      "band_b")
    // the capped pair join with its per-pair Jaro-Winkler is the
    // operator's dominant stage and feeds BOTH the name-agreement
    // aggregate and the weighted output — persist (query-scoped, drained
    // by the harness) so it runs once instead of twice
    val pairs = CacheScope.persist(a.join(b, blockCol)
      .where(col("id_a") < col("id_b"))
      .select(col(blockCol), col("id_a"), col("id_b"),
        (col("type_a") === col("type_b")).cast("int").as("agr_type"),
        (col("size_a") === col("size_b")).cast("int").as("agr_size"),
        (col("band_a") === col("band_b")).cast("int").as("agr_band"),
        (jaro_winkler(col("name_a"), col("name_b")) >= lit(jwThreshold))
          .cast("int").as("agr_name")))
    val nameStats = pairs.agg(count(lit(1)).as("__np"),
      sum(col("agr_name")).as("__na"))
    def fsW(agr: Column, m: Double, u: Column): Column =
      when(agr === 1,
        round(log(lit(m) / u) * lit(1e6)).cast("long"))
        .otherwise(
          round(log(lit(1.0 - m) / (lit(1.0) - u)) * lit(1e6))
            .cast("long"))
    val wtd = pairs.crossJoin(broadcast(stats))
      .crossJoin(broadcast(nameStats))
      .withColumn("__ut", col("__sqt").cast("double") /
        (col("__n").cast("double") * col("__n").cast("double")))
      .withColumn("__us", col("__sqs").cast("double") /
        (col("__n").cast("double") * col("__n").cast("double")))
      .withColumn("__ub", col("__sqb").cast("double") /
        (col("__n").cast("double") * col("__n").cast("double")))
      .withColumn("__un", col("__na").cast("double") /
        col("__np").cast("double"))
      .withColumn("__wt", fsW(col("agr_type"), mType, col("__ut")))
      .withColumn("__ws", fsW(col("agr_size"), mSize, col("__us")))
      .withColumn("__wb", fsW(col("agr_band"), mBand, col("__ub")))
      .withColumn("__wn", fsW(col("agr_name"), mName, col("__un")))
      .withColumn("weight_micro",
        col("__wt") + col("__ws") + col("__wb") + col("__wn"))
    wtd.select(col(blockCol), col("id_a"), col("id_b"),
      col("agr_type"), col("agr_size"), col("agr_band"), col("agr_name"),
      col("weight_micro"),
      when(col("weight_micro") >= upperMicro, "match")
        .when(col("weight_micro") >= lowerMicro, "possible")
        .otherwise("non_match").as("decision"))
  }
}
