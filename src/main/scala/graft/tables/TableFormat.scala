package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The table-maintenance surface the engine needs from a storage layer —
  * extracted so a real table format is a drop-in backend when its jars
  * are available. `ParquetTable` is the Spark-native implementation this
  * container ships; a Delta or Iceberg backend maps each op onto one
  * engine call:
  *
  * | op                  | Delta Lake                              | Iceberg                                   |
  * |---------------------|------------------------------------------|-------------------------------------------|
  * | createOrReplace     | `CREATE OR REPLACE TABLE ... USING delta`| `CREATE OR REPLACE TABLE ... USING iceberg`|
  * | refreshPartitions   | `replaceWhere` overwrite                 | `overwritePartitions()`                    |
  * | alignToSchema       | `mergeSchema=true` write option          | schema evolution on write                  |
  * | merge               | `DeltaTable.merge(...)`                  | `MERGE INTO` SQL                           |
  * | compact             | `OPTIMIZE`                               | `rewrite_data_files` procedure             |
  * | writeQuarantine     | plain JSON write (format-agnostic)       | plain JSON write                           |
  * | writeRunSummary     | plain JSON write (format-agnostic)       | plain JSON write                           |
  *
  * What a format backend adds beyond this trait (and plain parquet cannot
  * give): ACID commits (no swap-rename window), snapshot isolation for
  * concurrent writers, and time travel. Callers that need those must run
  * on a format backend; the parquet impl documents its non-atomic swap
  * window instead.
  */
trait TableFormat {

  /** M2 — create (or fully replace) a partitioned table. */
  def createOrReplace(df: DataFrame, path: String, partitionCols: Seq[String]): Unit

  /** M1 — idempotent partition refresh: only partitions present in `df`
    * are replaced. */
  def refreshPartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit

  /** M3 — align `df` to `target` by name: add missing as NULL, drop
    * extras, order as target. */
  def alignToSchema(df: DataFrame, target: StructType): DataFrame

  /** M4 — MERGE INTO semantics: update matched on `keys`, insert
    * unmatched source rows, keep unmatched target rows. */
  def merge(
      spark: SparkSession,
      path: String,
      source: DataFrame,
      keys: Seq[String],
      updates: Map[String, (Column, Column) => Column] = Map.empty,
      targetFilter: Option[Column] = None): Unit

  /** OPTIMIZE — rewrite fragment files into ~targetBytes outputs,
    * optionally clustered by `clusterBy` for row-group data skipping
    * (the ZORDER intent); returns (filesBefore, filesAfter). */
  def compact(
      spark: SparkSession, path: String, partitionCols: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024,
      clusterBy: Seq[String] = Nil): (Long, Long)

  /** M5 — quarantine rows as JSON under a run-scoped path; returns it. */
  def writeQuarantine(df: DataFrame, baseDir: String, courseId: String,
      ingestDate: String, runId: String): String

  /** M6 — single-record JSON run summary. */
  def writeRunSummary(spark: SparkSession, path: String, summary: Map[String, String]): Unit
}
