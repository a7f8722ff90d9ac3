package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The full correctness-gate corpus: every operator from SURVEY.md §2
  * re-expressed over the synthetic testdata, keyed by operator id.
  */
object Corpus {
  def defs: Seq[QueryDef] =
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
      MaintenanceQueries.defs ++
      DashQueries.defs ++
      LlmQueries.defs ++
      StreamingQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  /** Collapse builder-side indentation to single spaces — keeps the JSON
    * dump readable and avoids control chars in the oracle file. */
  private def normalize(sql: String): String =
    sql.replaceAll("\\s+", " ").trim
}
