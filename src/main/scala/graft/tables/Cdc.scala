package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold an ordered change feed (upserts AND
  * deletes, each stamped with a monotonically increasing sequence — the
  * Debezium/binlog shape) into a keyed table. [[ParquetTable.merge]]
  * covers upsert-only MERGE; real CDC ingestion additionally needs
  * row-level deletes and last-write-wins resolution when one key
  * carries several changes in the same batch.
  *
  * Shape at scale: the feed first collapses to ONE change per key (a
  * window by key — one shuffle of the feed, which is batch-sized, not
  * table-sized), then a single full-outer join by key against the
  * target applies it. At 100 TB the target side is partition-pruned the
  * same way merge is (`targetFilter`): a feed touching one day touches
  * one partition.
  */
object Cdc {

  /** Collapse a change feed to the latest change per key (greatest
    * `seqCol` wins; ties broken by preferring the delete — a
    * delete+reinsert at the same sequence must not resurrect silently,
    * mirroring how log compaction treats tombstones). */
  def latestChanges(
      changes: DataFrame, keys: Seq[String], seqCol: String,
      opCol: String): DataFrame = {
    // unknown ops fail the job, not silently upsert: a feed with
    // "update"/"truncate"/typo'd ops means a producer contract break
    val checked = changes.withColumn(opCol,
      when(lower(col(opCol)).isin("upsert", "delete"), lower(col(opCol)))
        .otherwise(raise_error(concat(
          lit("Cdc: unknown op '"), col(opCol),
          lit("' (expected upsert|delete)")))))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc,
        when(col(opCol) === "delete", 0).otherwise(1).asc)
    checked.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Apply the feed to `target`: per key, the latest change either
    * replaces the row (`op = "upsert"`) or removes it (`op = "delete"`);
    * keys absent from the feed pass through. The feed's data columns
    * must cover the target's columns (aligned by name). */
  def applyChanges(
      target: DataFrame, changes: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    val latest = latestChanges(changes, keys, seqCol, opCol)
    val dataCols = target.columns.toSeq
    val c = latest.select(
      (keys.map(k => col(k).as(s"__c_$k")) :+
        lower(col(opCol)).as("__c_op")) ++
        dataCols.filterNot(keys.contains).map(n => col(n).as(s"__c_$n")): _*)
    val cond = keys.map(k => col(k) <=> col(s"__c_$k")).reduce(_ && _)
    val joined = target.join(c, cond, "full_outer")
    val hasChange = col("__c_op").isNotNull
    joined
      .filter(!hasChange || col("__c_op") =!= "delete")
      .select(dataCols.map { n =>
        val merged =
          if (keys.contains(n)) coalesce(col(n), col(s"__c_$n"))
          else when(hasChange, col(s"__c_$n")).otherwise(col(n))
        merged.as(n)
      }: _*)
  }

  /** [[applyChanges]] against a parquet table on disk, swap-written so a
    * failed job never half-replaces the table. */
  def applyToTable(
      spark: SparkSession, path: String, changes: DataFrame,
      keys: Seq[String], seqCol: String, opCol: String): Unit = {
    val result = applyChanges(
      spark.read.parquet(path), changes, keys, seqCol, opCol)
    ParquetTable.swapWrite(result, path)
  }
}
