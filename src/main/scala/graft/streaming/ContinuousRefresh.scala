package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.{broadcast, col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.tables.{Cdc, IncrementalTable, IncrementalView, ParquetTable}

/** The streaming → lakehouse hop: land each micro-batch through the SAME
  * idempotent maintenance op the batch backfill uses
  * (ParquetTable.refreshPartitions → dynamic partition overwrite).
  *
  * Exactly-once story: Structured Streaming replays a failed micro-batch
  * from the checkpoint; because the landing op OVERWRITES the partitions
  * present in the batch (never appends), a replay rewrites the same
  * partitions with the same rows — idempotent, no dedup pass needed.
  *
  * CONTRACT: micro-batches must carry complete partitions (the
  * reference's landing model — one upload = one course/ingest-date).
  * A partition spread across several batches would be truncated to the
  * latest batch's rows; use an upstream session/window close (emit a
  * partition only when its watermark passes) or [[ParquetTable.merge]]
  * in the foreachBatch body when that invariant can't hold. */
object ContinuousRefresh {

  def start(
      stream: DataFrame, path: String, partitionCols: Seq[String],
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty)
          ParquetTable.refreshPartitions(batch, path, partitionCols)
      }
      .start()

  /** The same hop landing into the VERSIONED table: every micro-batch
    * commits as a new [[IncrementalTable]] manifest version, so the live
    * stream produces a table with time travel, rollback and row-level
    * diff — the streaming-sink half of a real table format. Same
    * complete-partition contract as [[start]]; a checkpoint replay
    * rewrites the same partitions with the same rows, adding a version
    * whose content (and row-level diff vs its predecessor) is empty —
    * content-idempotent, history-visible. */
  def startVersioned(
      stream: DataFrame, path: String, partitionCols: Seq[String],
      checkpointDir: String,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val w = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty)
          IncrementalTable.refreshPartitions(batch, path, partitionCols): Unit
      }
    trigger.foreach(w.trigger)
    w.start()
  }

  /** M25's continuous form — a continuously-maintained gold rollup:
    * each micro-batch lands into the base incremental table
    * (partition refresh, an audited version) and then ADVANCES the
    * materialized SUM/COUNT view to that version through
    * [[IncrementalView.maintain]] — signed delta merge over
    * `IncrementalTable.diff`, which scans only the files the two
    * versions disagree on, so per-batch view cost is O(batch + view
    * grain), never a base-table rescan. The first batch bootstraps the
    * view with `build`. Exactness carries over from the batch IVM: the
    * maintained view is bit-identical to a from-scratch recompute after
    * every batch (decimal-exact signed merging), which is what lets the
    * continuous rollup serve dashboards directly. A checkpoint replay
    * re-lands the same partitions (content-idempotent) and maintain
    * sees an empty diff — a no-op version advance. */
  def startViewMaintenance(
      stream: DataFrame, tablePath: String, viewPath: String,
      partitionCols: Seq[String], keys: Seq[String], measures: Seq[String],
      checkpointDir: String, trigger: Option[Trigger] = None): StreamingQuery = {
    val w = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          IncrementalTable.refreshPartitions(batch, tablePath, partitionCols): Unit
          if (IncrementalTable.versions(viewPath).isEmpty)
            IncrementalView.build(spark, tablePath, viewPath, keys, measures): Unit
          else
            IncrementalView.maintain(spark, tablePath, viewPath, keys, measures): Unit
        }
      }
    trigger.foreach(w.trigger)
    w.start()
  }

  /** A continuously-maintained GOLD MODEL beyond SUM/COUNT — the
    * streaming form of the full dbt-style rollup (fact_rounds: MIN/MAX
    * sections, distinct holes/nines, CASE round-length ladder, flag
    * counts). Each micro-batch lands into the versioned base table and
    * then advances the materialized model through
    * [[IncrementalView.maintainGrouped]]: the row diff names the
    * affected group keys, ONLY those groups re-aggregate from their
    * current rows, and the rest of the view carries forward — O(changed
    * groups + view grain) per batch, with output identical to running
    * the model from scratch (each emitted row IS a model output over
    * full group state, so non-additive aggregates are exact by
    * construction, not by merge arithmetic). First batch bootstraps via
    * buildGrouped. Same complete-partition landing contract and replay
    * idempotence as [[startViewMaintenance]]. */
  def startModelMaintenance(
      stream: DataFrame, tablePath: String, viewPath: String,
      partitionCols: Seq[String], keys: Seq[String],
      model: DataFrame => DataFrame,
      checkpointDir: String,
      attachKeys: DataFrame => DataFrame = identity,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val w = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          IncrementalTable.refreshPartitions(batch, tablePath, partitionCols): Unit
          if (IncrementalTable.versions(viewPath).isEmpty)
            IncrementalView.buildGrouped(
              spark, tablePath, viewPath, keys, model, attachKeys): Unit
          else
            IncrementalView.maintainGrouped(
              spark, tablePath, viewPath, keys, model, attachKeys): Unit
        }
      }
    trigger.foreach(w.trigger)
    w.start()
  }

  /** CDC ingestion as a stream (M16's continuous form): each micro-batch
    * of a Debezium-shaped change feed (key cols + data cols + `op` =
    * upsert|delete + monotone `seq`) folds into the VERSIONED table
    * through [[graft.tables.Cdc.applyChanges]] — last-write-wins within
    * the batch, row-level deletes honored, every batch an audited
    * manifest commit.
    *
    * Scale shape: with `partitionCols` set, a batch reads and rewrites
    * ONLY the hive partitions its own rows name — O(changed partitions)
    * per commit, like the batch refresh. The feed must carry the
    * partition columns (in any real CDC topic they are derivable from
    * the key), and a key's partition value must be stable — a key that
    * MOVES partitions needs the unpartitioned form, which folds against
    * the whole snapshot. A batch whose deletes empty an entire
    * partition commits that removal through `deleteWhere` first
    * (refreshPartitions can only replace partitions present in its
    * input).
    *
    * Exactly-once: a checkpoint replay re-applies the same changes to
    * the already-advanced snapshot; upserts rewrite identical rows and
    * deletes find nothing, so the replayed commit's row-level diff is
    * empty — content-idempotent, history-visible, same as
    * [[startVersioned]]. */
  def startCdc(
      changes: DataFrame, path: String, keys: Seq[String],
      seqCol: String, opCol: String, checkpointDir: String,
      partitionCols: Seq[String] = Nil,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val w = changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty)
          applyCdcBatch(batch.toDF(), path, keys, seqCol, opCol, partitionCols)
      }
    trigger.foreach(w.trigger)
    w.start()
  }

  /** One micro-batch of [[startCdc]] — exposed for direct spec coverage
    * of the bootstrap, partition-pruning and emptied-partition
    * interleavings. */
  def applyCdcBatch(
      batch: DataFrame, path: String, keys: Seq[String],
      seqCol: String, opCol: String, partitionCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val dataCols =
      batch.columns.filterNot(c => c == seqCol || c == opCol).toSeq
    def emptyTarget = batch.select(dataCols.map(col): _*).limit(0)
    val bootstrap = IncrementalTable.versions(path).isEmpty
    if (partitionCols.isEmpty) {
      val target =
        if (bootstrap) emptyTarget else IncrementalTable.read(spark, path)
      IncrementalTable.commitFull(
        Cdc.applyChanges(target, batch, keys, seqCol, opCol), path): Unit
    } else {
      require(partitionCols.forall(batch.columns.contains),
        s"CDC feed must carry partition columns ${partitionCols.mkString(",")}")
      if (bootstrap) {
        IncrementalTable.commitFull(
          Cdc.applyChanges(emptyTarget, batch, keys, seqCol, opCol),
          path, partitionCols): Unit
      } else {
        // prune the target to the batch's own partitions — the whole
        // point: a batch touching one day reads one day
        val parts = batch.select(partitionCols.map(col): _*).distinct()
        val slice = IncrementalTable.read(spark, path)
          .join(broadcast(parts), partitionCols, "left_semi")
        val applied =
          Cdc.applyChanges(slice, batch, keys, seqCol, opCol).cache()
        try {
          // partitions the batch named but left ROWLESS must be removed
          // explicitly; refreshPartitions only replaces present ones
          val emptied = parts.exceptAll(
              applied.select(partitionCols.map(col): _*).distinct())
            .collect() // bounded: partitions touched by ONE batch
          if (emptied.nonEmpty) {
            val pred = emptied.map(r =>
              partitionCols.zipWithIndex.map { case (c, i) =>
                col(c) <=> lit(r.get(i))
              }.reduce(_ && _)).reduce(_ || _)
            IncrementalTable.deleteWhere(spark, path, partitionCols, pred): Unit
          }
          if (!applied.isEmpty)
            IncrementalTable.refreshPartitions(applied, path, partitionCols): Unit
        } finally { applied.unpersist(); () }
      }
    }
  }
}
