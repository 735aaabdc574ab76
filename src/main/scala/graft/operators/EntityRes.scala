package graft.operators

import org.apache.spark.sql.DataFrame
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
}
