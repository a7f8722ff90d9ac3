package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hash-bucketed external tables — the shuffle-free co-located join
  * layout for fact-fact joins.
  *
  * The reference lands its big tables Iceberg-partitioned on
  * (course_id, event_date) (pipeline/silver/etl.py:680-682); Iceberg's
  * other layout lever is the `bucket(N, col)` partition transform, whose
  * Spark-native counterpart is the metastore bucketed table written
  * here. Both sides of a recurring fact-fact join (events ⋈ rounds,
  * orders ⋈ lineitem) written with the SAME bucket count on their join
  * keys make the join's ClusteredDistribution requirement already
  * satisfied at scan time: Catalyst plans SortMergeJoin with ZERO
  * Exchange, and a follow-up groupBy on the same key rides the join's
  * output partitioning exchange-free too (asserted in PlanSpec for the
  * m22 gate).
  *
  * At 100 TB this is the difference between re-shuffling both fact
  * tables on every join of the daily pipeline and paying the
  * partitioning cost ONCE at write time: each executor reads its own
  * buckets and joins locally. The bucket count is a layout constant
  * (pick ~2-4× planned executor count; changing it is a rewrite), so it
  * belongs to high-fan-in join keys that the workload hits repeatedly —
  * one-off joins keep the plain layout and let AQE size the shuffle.
  *
  * Tables are EXTERNAL (explicit `path`) so the data lives with the rest
  * of the lake and the catalog entry only carries the bucket spec — any
  * session that re-registers the table gets the exchange-free plans
  * back; dropping it leaves the data in place.
  */
object BucketedTable {

  /** Write `df` as an external bucketed (and optionally sort-ordered)
    * table. Overwrites both catalog entry and data on re-run. */
  def write(df: DataFrame, name: String, path: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketed write needs bucket columns")
    val w = df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(name)
  }

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog, so use this — a bare parquet read of `path` would lose
    * the bucket spec and re-shuffle). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
