package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Gap-based sessionization — the batch form of the session windows the
  * streaming surface builds with flatMapGroupsWithState, and the round/
  * visit segmentation the reference's pace analytics implies (a "round"
  * IS a session of GPS fixes; cf. round_start/round_end derivation,
  * reference pipeline/silver/etl.py:447-474).
  *
  * Scale design: both steps are keyed by the entity column — the lag/
  * cumulative-sum window and the per-session rollup partition by
  * `entityCol`, so the work distributes across executors with ONE
  * shuffle on the entity key (the rollup reuses the window's hash
  * partitioning; no global ordering anywhere).
  */
object Sessions {

  /** Epoch micros of a timestamp of EITHER flavor: `unix_micros` is
    * `DATATYPE_MISMATCH` on TIMESTAMP_NTZ, so cast first — a no-op on
    * TimestampType, and for NTZ it interprets the wall-clock in the
    * session TZ (pinned UTC everywhere), so gap arithmetic is identical
    * whichever physical type the source delivered. */
  private def micros(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Assign each event a per-entity `session_id` (0-based, in time
    * order): a new session starts when the gap to the previous event
    * exceeds `gapSec`. `tieCol` breaks equal-timestamp ties so the
    * assignment is deterministic. */
  def withSessionId(
      df: DataFrame, entityCol: String, tsCol: String, tieCol: String,
      gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(asc_nulls_first(tsCol), asc_nulls_first(tieCol))
    // Compare at MICROSECOND (native timestamp) precision: unix_timestamp
    // truncates to whole seconds, which would merge events 1800.9s apart
    // under gapSec=1800 — "splits iff gap > gapSec" must hold for
    // sub-second timestamps too.
    val gapMicros = micros(col(tsCol)) -
      micros(lag(col(tsCol), 1).over(w))
    df.withColumn("__new_session",
        when(gapMicros.isNull || gapMicros > gapSec * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
      .drop("__new_session")
  }

  /** Per-session rollup: event count, start/end, duration. One row per
    * (entity, session). */
  def sessionize(
      df: DataFrame, entityCol: String, tsCol: String, tieCol: String,
      gapSec: Long): DataFrame =
    withSessionId(df, entityCol, tsCol, tieCol, gapSec)
      .groupBy(col(entityCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        // whole seconds of the TRUE (microsecond) duration — not a
        // difference of per-timestamp second truncations
        floor((micros(max(col(tsCol))) - micros(min(col(tsCol))))
            / 1000000L).cast("long")
          .as("duration_sec"))

  /** The same segmentation through Spark's NATIVE session_window — the
    * form that runs unchanged as a streaming query (watermark + merging
    * session state; see streaming.StreamingTelemetry.sessionizedPace).
    * Boundary semantics differ from [[sessionize]] by one point: a
    * session window spans [first_ts, last_ts + gap), so two events
    * exactly `gapSec` apart SPLIT here (merge iff gap < gapSec) where
    * the lag-based form merges (splits iff gap > gapSec). */
  def sessionWindows(
      df: DataFrame, entityCol: String, tsCol: String,
      gap: String): DataFrame =
    df.groupBy(col(entityCol), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(entityCol),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"))
}
