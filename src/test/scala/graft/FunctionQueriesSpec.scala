package graft

import org.scalatest.funsuite.AnyFunSuite

/** The q248 semantics the oracle can't explain: the mode tie-break. */
class FunctionQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("modeByGroup: frequency wins, ties break to the smallest value") {
    val df = Seq(("g", 5), ("g", 5), ("g", 3), ("g", 3), ("g", 1),
      ("h", 9)).toDF("g", "v")
    val m = graft.operators.Relational.modeByGroup(df, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("g") == ((3L, 2L)), s"tie 3-vs-5 must break low: ${m("g")}")
    assert(m("h") == ((9L, 1L)))
  }
}
