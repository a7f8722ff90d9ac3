package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Corpus

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The fact_rounds-style pricing rollup: one wide groupBy over the fact
    * table with conditional counts, distinct counts and exact-decimal sums
    * (SURVEY §2.4 A14 / §2.8 fact_rounds).
    */
  def entry(spark: SparkSession): DataFrame =
    Corpus.queries("a14_mega_rollup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Corpus.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Corpus.oracleSql

  /** Session-cache lifecycle hook: evict every shared frame the query
    * corpus pinned for `spark` — the gold fact_rounds cache, the
    * retrieval index caches, the graph cell assignments, and the graph
    * operators' structural persists. The caches are keyed by session
    * and deliberately never self-evict (within one Verify/Bench run the
    * retention IS the production contract — indexes build once, every
    * gate probes them); a long-lived session running many workloads
    * calls this between them to keep executor memory bounded. Verify
    * and Bench call it when their query phase ends. */
  def clearSharedCaches(spark: SparkSession): Unit = {
    graft.queries.GoldQueries.clearSharedFactRounds(spark)
    graft.queries.LlmQueries.clearSharedIndexes(spark)
    graft.queries.GraphQueries.clearSharedCells(spark)
    graft.llm.Graph.clearRetainedCaches(spark)
  }
}
