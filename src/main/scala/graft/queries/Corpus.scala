package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The full correctness-gate corpus: every operator from SURVEY.md §2
  * re-expressed over the synthetic testdata, keyed by operator id.
  */
object Corpus {
  def defs: Seq[QueryDef] = {
    val base =
      ScanQueries.defs ++
        ProjQueries.defs ++
        AggQueries.defs ++
        WindowQueries.defs ++
        JoinQueries.defs ++
        SortSetQueries.defs ++
        FunctionQueries.defs ++
        GoldQueries.defs ++
        GoldQueries2.defs ++
        GoldQueries3.defs ++
        GoldenQueries.defs ++
        MaintenanceQueries.defs ++
        DashQueries.defs ++
        DashQueries2.defs ++
        LlmQueries.defs ++
        GraphQueries.defs ++
        StreamingQueries.defs
    base :+ corpusComplete(base.size + 1)
  }

  /** Corpus-integrity gate: in round 5, two gates crashed out of the
    * harness and VANISHED from the correctness report (184 reported vs
    * 186 declared) — absence reads as "nothing wrong". This gate makes
    * declared−reported ≠ 0 a LOUD hash mismatch: the oracle pins
    * (declared, written, failed) = (n, n, 0), and graft.Verify
    * OVERWRITES this gate's parquet after the run loop with the counts
    * it actually observed, so any crashed gate turns this row red
    * instead of silently shrinking the report. */
  private def corpusComplete(n: Int): QueryDef = QueryDef(
    "corpus_complete",
    (s, _) => {
      import s.implicits._
      Seq((n.toLong, n.toLong, 0L)).toDF("declared", "written", "failed")
    },
    Some(s"""SELECT CAST($n AS BIGINT) AS declared,
             CAST($n AS BIGINT) AS written,
             CAST(0 AS BIGINT) AS failed"""))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  /** Collapse builder-side indentation to single spaces — keeps the JSON
    * dump readable and avoids control chars in the oracle file. */
  private def normalize(sql: String): String =
    sql.replaceAll("\\s+", " ").trim
}
