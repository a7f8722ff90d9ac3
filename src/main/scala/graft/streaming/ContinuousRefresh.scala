package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.tables.{IncrementalTable, ParquetTable}

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
}
