package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics index + pruned scan — the data-skipping
  * half of a real table format (Iceberg manifests, Delta file stats),
  * hand-built over plain parquet directories.
  *
  * `build` computes one row per data file (min/max per indexed column)
  * in a single distributed pass grouped by `input_file_name()` and
  * stores the result as a tiny parquet manifest under `_stats/`.
  * `scanBetween` consults the manifest on the driver (manifest size =
  * file count, thousands of rows at most — the same driver-side scale
  * Iceberg's planning reads), selects only the files whose [min, max]
  * range intersects the predicate, and reads exactly those files.
  *
  * Why it matters at 100 TB: partition pruning only skips the partition
  * grain (e.g. `event_date`); a range predicate on a NON-partition
  * column (`fix_timestamp`, `vec_id`, an id range) otherwise scans every
  * file. With files clustered on the column ([[ParquetTable.compact]]'s
  * `clusterBy`), file-level ranges are tight and a point/range query
  * reads O(matching files). The pruned scan stays a plain parquet
  * relation — pushdown, column pruning and codegen all still apply on
  * top of the file-list cut.
  */
object StatsIndex {

  /** One distributed pass: per-file min/max for `cols`, written as a
    * parquet manifest at `path/_stats`. Returns the file count. */
  def build(spark: SparkSession, path: String, cols: Seq[String]): Long = {
    require(cols.nonEmpty, "stats index needs at least one column")
    val df = spark.read.parquet(path)
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    val stats = df
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
    // the manifest must not land inside the data dir glob — parquet
    // readers skip underscore-prefixed dirs, so _stats is invisible to
    // normal scans of `path`
    stats.coalesce(1).write.mode("overwrite").parquet(s"$path/_stats")
    spark.read.parquet(s"$path/_stats").count()
  }

  /** Files whose [min_col, max_col] intersects [lo, hi] (inclusive).
    * Driver-side: the manifest is file-count-sized. Files with a null
    * range (all-null column chunk) are kept — skipping them would drop
    * rows a null-safe predicate could still match. */
  private def candidateFiles(
      spark: SparkSession, path: String, c: String,
      lo: Any, hi: Any): Seq[String] = {
    val stats = spark.read.parquet(s"$path/_stats")
    stats
      .filter(col(s"min_$c").isNull ||
        (col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)))
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Range scan `lo <= col <= hi` reading only stats-selected files.
    * Returns (dataframe, filesRead, filesTotal) so callers — and the
    * gate's spec — can assert the skip actually happened. The predicate
    * is re-applied on the scan: the file cut is a superset guarantee,
    * correctness never depends on the stats. */
  def scanBetween(
      spark: SparkSession, path: String, c: String,
      lo: Any, hi: Any): (DataFrame, Long, Long) = {
    val total = spark.read.parquet(s"$path/_stats").count()
    val files = candidateFiles(spark, path, c, lo, hi)
    // basePath keeps hive partition columns in the pruned scan's schema
    // (mirrors IncrementalTable.read) — without it a partitioned table's
    // pruned read would drop partition columns and a range predicate on
    // one would fail to resolve
    val df =
      if (files.isEmpty)
        spark.read.parquet(path).filter(lit(false))
      else
        spark.read.option("basePath", path).parquet(files: _*)
          .filter(col(c) >= lit(lo) && col(c) <= lit(hi))
    (df, files.size.toLong, total)
  }
}
