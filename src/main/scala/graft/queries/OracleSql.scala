package graft.queries

/** Shared DuckDB-oracle SQL fragments — the cross-engine numeric
  * workarounds that more than one oracle needs, kept in ONE place so a
  * scale-dependent divergence class gets fixed (and re-diagnosed) once.
  */
object OracleSql {

  /** DECIMAL → DOUBLE routed THROUGH VARCHAR.
    *
    * DuckDB's direct DECIMAL→DOUBLE cast double-rounds (int128 → double,
    * then /10^scale — measured 1 ulp off on sf0.1 Σx² sums whose unscaled
    * values pass 2⁶³), while Spark's BigDecimal.doubleValue and DuckDB's
    * string parse are both correctly rounded. Exact sums whose unscaled
    * value stays below 2⁵³ are unaffected either way — use this whenever
    * an oracle casts a wide exact DECIMAL sum to DOUBLE and the unscaled
    * magnitude can cross 2⁵³ at a larger scale factor (e.g. revenue sums
    * ~7e15 around sf10): the cheap insurance beats re-diagnosing the
    * 1-ulp gate failure. */
  def decToDouble(x: String): String = s"CAST(CAST($x AS VARCHAR) AS DOUBLE)"
}
