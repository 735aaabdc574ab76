package graft.pipeline

import java.sql.{Connection, DriverManager}

/** The relational tail of the pipeline: DDL, dedup-AVG, UPSERT, stage cleanup
  * (reference: dags/weather_daily_etl.py:160-214) — executed driver-side over
  * plain JDBC, exactly like the reference's psql task. All four statements run
  * in ONE transaction (the reference relies on psql ON_ERROR_STOP=1,
  * dags/weather_daily_etl.py:170; an explicit transaction gives the same
  * all-or-nothing replay safety).
  *
  * The Postgres SQL text is canonical and unit-tested verbatim
  * ([[Upsert.Postgres]]); the Derby dialect exists so the replay contract is
  * integration-tested in-process (no Postgres in the sandbox). Observable
  * semantics are identical: duplicate stage rows for a day are AVERAGED
  * (reference: dags/weather_daily_etl.py:186-196 — not last-write-wins), the
  * final table keeps exactly one row per (y,m,d), and the day's stage rows are
  * deleted after merge.
  */
object Upsert {

  private val metricCols =
    Seq("min_temp_c", "max_temp_c", "avg_temp_c", "precip_mm_sum", "avg_humidity_pct")

  sealed trait Dialect {
    def ensureTables(conn: Connection, stage: String, fin: String): Unit
    def upsert(conn: Connection, stage: String, fin: String, y: Int, m: Int, d: Int): Unit

    /** Identifier quoting for the shared count/delete statements. Postgres:
      * unquoted (psql-text parity — unquoted folds to lowercase). Derby:
      * double-quoted, because Spark's JDBC writer creates columns with quoted
      * lowercase names, which unquoted (uppercase-folding) SQL can't see. */
    def q(id: String): String
  }

  /** Canonical dialect — SQL text matches the reference's psql heredoc
    * (dags/weather_daily_etl.py:172-206). */
  object Postgres extends Dialect {

    def ddl(stage: String, fin: String): Seq[String] = Seq(
      s"""CREATE TABLE IF NOT EXISTS $fin (
         |  y INT, m INT, d INT,
         |  min_temp_c FLOAT, max_temp_c FLOAT, avg_temp_c FLOAT,
         |  precip_mm_sum FLOAT, avg_humidity_pct FLOAT,
         |  PRIMARY KEY (y,m,d)
         |)""".stripMargin,
      s"""CREATE TABLE IF NOT EXISTS $stage (
         |  y INT, m INT, d INT,
         |  min_temp_c FLOAT, max_temp_c FLOAT, avg_temp_c FLOAT,
         |  precip_mm_sum FLOAT, avg_humidity_pct FLOAT
         |)""".stripMargin)

    /** Dedup-AVG + ON CONFLICT upsert in one statement
      * (reference: dags/weather_daily_etl.py:186-206). */
    def upsertSql(stage: String, fin: String): String =
      s"""WITH agg AS (
         |  SELECT ?::INT AS y, ?::INT AS m, ?::INT AS d,
         |    AVG(min_temp_c) AS min_temp_c, AVG(max_temp_c) AS max_temp_c,
         |    AVG(avg_temp_c) AS avg_temp_c, AVG(precip_mm_sum) AS precip_mm_sum,
         |    AVG(avg_humidity_pct) AS avg_humidity_pct
         |  FROM $stage WHERE y = ? AND m = ? AND d = ?
         |  HAVING COUNT(*) > 0
         |)
         |INSERT INTO $fin (y,m,d,min_temp_c,max_temp_c,avg_temp_c,precip_mm_sum,avg_humidity_pct)
         |SELECT y,m,d,min_temp_c,max_temp_c,avg_temp_c,precip_mm_sum,avg_humidity_pct FROM agg
         |ON CONFLICT (y,m,d) DO UPDATE SET
         |  min_temp_c = EXCLUDED.min_temp_c, max_temp_c = EXCLUDED.max_temp_c,
         |  avg_temp_c = EXCLUDED.avg_temp_c, precip_mm_sum = EXCLUDED.precip_mm_sum,
         |  avg_humidity_pct = EXCLUDED.avg_humidity_pct""".stripMargin

    override def ensureTables(conn: Connection, stage: String, fin: String): Unit =
      ddl(stage, fin).foreach { sql =>
        val st = conn.createStatement(); try st.execute(sql) finally st.close()
      }

    override def upsert(conn: Connection, stage: String, fin: String,
                        y: Int, m: Int, d: Int): Unit = {
      val ps = conn.prepareStatement(upsertSql(stage, fin))
      try {
        Seq(y, m, d, y, m, d).zipWithIndex.foreach { case (v, i) => ps.setInt(i + 1, v) }
        ps.executeUpdate()
      } finally ps.close()
    }

    override def q(id: String): String = id
  }

  /** In-process test dialect (Derby has neither ON CONFLICT nor IF NOT
    * EXISTS); same observable semantics: AVG-collapse, then update-or-insert. */
  object Derby extends Dialect {

    override def q(id: String): String = "\"" + id + "\""

    private def tableExists(conn: Connection, name: String): Boolean = {
      val rs = conn.getMetaData.getTables(null, null, name.toUpperCase, null)
      try rs.next() finally rs.close()
    }

    override def ensureTables(conn: Connection, stage: String, fin: String): Unit = {
      def cols(pk: Boolean) =
        (Seq("y", "m", "d").map(c => s"${q(c)} INT") ++
          metricCols.map(c => s"${q(c)} DOUBLE") ++
          (if (pk) Seq(s"PRIMARY KEY (${q("y")},${q("m")},${q("d")})") else Nil))
          .mkString("(", ", ", ")")
      Seq(fin -> cols(pk = true), stage -> cols(pk = false)).foreach { case (t, defn) =>
        if (!tableExists(conn, t)) {
          val st = conn.createStatement()
          try st.execute(s"CREATE TABLE $t $defn") finally st.close()
        }
      }
    }

    override def upsert(conn: Connection, stage: String, fin: String,
                        y: Int, m: Int, d: Int): Unit = {
      val sel = conn.prepareStatement(
        s"""SELECT ${metricCols.map(c => s"AVG(${q(c)})").mkString(", ")}, COUNT(*)
           |FROM $stage WHERE ${q("y")} = ? AND ${q("m")} = ? AND ${q("d")} = ?""".stripMargin)
      // AVG over an all-NULL column is SQL NULL — preserved as such (the
      // Postgres dialect's upsert writes NULL too; reading with getDouble
      // alone would silently coerce it to 0.0 and diverge).
      val avgs: Option[Seq[Option[Double]]] =
        try {
          sel.setInt(1, y); sel.setInt(2, m); sel.setInt(3, d)
          val rs = sel.executeQuery()
          try {
            rs.next()
            if (rs.getLong(metricCols.size + 1) == 0L) None
            else Some(metricCols.indices.map { i =>
              val v = rs.getDouble(i + 1)
              if (rs.wasNull()) None else Some(v)
            })
          } finally rs.close()
        } finally sel.close()

      def bind(ps: java.sql.PreparedStatement, pos: Int, v: Option[Double]): Unit =
        v match {
          case Some(x) => ps.setDouble(pos, x)
          case None => ps.setNull(pos, java.sql.Types.DOUBLE)
        }

      avgs.foreach { vals =>
        val upd = conn.prepareStatement(
          s"UPDATE $fin SET ${metricCols.map(c => s"${q(c)} = ?").mkString(", ")} " +
            s"WHERE ${q("y")} = ? AND ${q("m")} = ? AND ${q("d")} = ?")
        val updated =
          try {
            vals.zipWithIndex.foreach { case (v, i) => bind(upd, i + 1, v) }
            upd.setInt(6, y); upd.setInt(7, m); upd.setInt(8, d)
            upd.executeUpdate()
          } finally upd.close()
        if (updated == 0) {
          val ins = conn.prepareStatement(
            s"INSERT INTO $fin (${(Seq("y", "m", "d") ++ metricCols).map(q).mkString(",")}) " +
              "VALUES (?,?,?,?,?,?,?,?)")
          try {
            ins.setInt(1, y); ins.setInt(2, m); ins.setInt(3, d)
            vals.zipWithIndex.foreach { case (v, i) => bind(ins, i + 4, v) }
            ins.executeUpdate()
          } finally ins.close()
        }
      }
    }
  }

  def dialectFor(cfg: PgCfg): Dialect =
    if (cfg.driver.contains("derby")) Derby else Postgres

  /** Count staged rows for the day (diagnostic K8,
    * reference: dags/weather_daily_etl.py:183-184). */
  def stageCount(conn: Connection, dialect: Dialect, stage: String,
                 y: Int, m: Int, d: Int): Long = {
    import dialect.q
    val ps = conn.prepareStatement(
      s"SELECT COUNT(*) FROM $stage WHERE ${q("y")} = ? AND ${q("m")} = ? AND ${q("d")} = ?")
    try {
      ps.setInt(1, y); ps.setInt(2, m); ps.setInt(3, d)
      val rs = ps.executeQuery()
      try { rs.next(); rs.getLong(1) } finally rs.close()
    } finally ps.close()
  }

  /** DDL → count → dedup-AVG upsert → stage DELETE, one transaction.
    * Returns the pre-merge staged-row count. */
  def runDay(cfg: PgCfg, y: Int, m: Int, d: Int): Long = {
    val conn = DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try {
      conn.setAutoCommit(false)
      val dialect = dialectFor(cfg)
      import dialect.q
      dialect.ensureTables(conn, cfg.tableStage, cfg.tableFinal)
      val n = stageCount(conn, dialect, cfg.tableStage, y, m, d)
      dialect.upsert(conn, cfg.tableStage, cfg.tableFinal, y, m, d)
      val del = conn.prepareStatement(
        s"DELETE FROM ${cfg.tableStage} WHERE ${q("y")} = ? AND ${q("m")} = ? AND ${q("d")} = ?")
      try { del.setInt(1, y); del.setInt(2, m); del.setInt(3, d); del.executeUpdate() }
      finally del.close()
      conn.commit()
      n
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally conn.close()
  }
}
