package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises scan → broadcast join → keyed agg → window-free ordering.
    * Same plan as the oracled q100_flagship, plus a presentation sort. */
  def entry(spark: SparkSession): DataFrame = {
    Graft.tune(spark)
    queries("q100_flagship")(spark, "/root/testdata/sf0.001")
      .orderBy(col("c_mktsegment"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ scale extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++ graft.queries.LlmQueries.queries ++
      graft.queries.ScaleQueries.queries ++ graft.queries.StatQueries.queries ++
      graft.queries.RelQueries.queries ++ graft.queries.RelQueries3.queries ++
      graft.queries.MlQueries.queries ++ graft.queries.InferQueries.queries ++
      graft.queries.WarehouseQueries.queries ++ graft.queries.SeriesQueries.queries ++
      graft.queries.ProfileQueries.queries ++ graft.queries.EvalQueries.queries ++
      graft.queries.ExperimentQueries.queries ++ graft.queries.FunctionQueries.queries ++
      graft.queries.FeatureQueries.queries ++ graft.queries.AffinityQueries.queries ++
      graft.queries.EntityResQueries.queries

  /** Oracles whose SQL embeds a Spark-computed constant (the q195
    * eigenvector). Verify evaluates these against the dump's sfDir and
    * merges them into oracle_sql.json, so the driver's DuckDB compare
    * hash-gates them like any static oracle. */
  def oracleDynamic: Map[String, (SparkSession, String) => String] =
    graft.queries.MlQueries.oracleDynamic

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++ graft.queries.LlmQueries.oracle ++
      graft.queries.ScaleQueries.oracle ++ graft.queries.StatQueries.oracle ++
      graft.queries.RelQueries.oracle ++ graft.queries.RelQueries3.oracle ++
      graft.queries.MlQueries.oracle ++ graft.queries.InferQueries.oracle ++
      graft.queries.WarehouseQueries.oracle ++ graft.queries.SeriesQueries.oracle ++
      graft.queries.ProfileQueries.oracle ++ graft.queries.EvalQueries.oracle ++
      graft.queries.ExperimentQueries.oracle ++ graft.queries.FunctionQueries.oracle ++
      graft.queries.FeatureQueries.oracle ++ graft.queries.AffinityQueries.oracle ++
      graft.queries.EntityResQueries.oracle
}
