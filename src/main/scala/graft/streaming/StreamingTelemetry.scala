package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface — beyond the reference (which is batch
  * incremental only, SURVEY §2.10): the same telemetry semantics as a
  * continuous pipeline.
  *
  * readStream → dedup-within-watermark → window agg / stateful round
  * tracking → writeStream. Each piece mirrors a batch operator:
  *
  *   - W1 dedup  → `dropDuplicatesWithinWatermark` on the same
  *     (round_id, fix_timestamp, location_index) key;
  *   - fact_round_hole_performance-style rollups → watermarked tumbling
  *     windows (late fixes beyond the watermark are dropped, state is
  *     bounded — the property that keeps this running forever at scale);
  *   - fact_rounds → `flatMapGroupsWithState` with event-time timeout:
  *     a round's summary is emitted once its stream goes quiet.
  */
object StreamingTelemetry {

  /** One streaming fix — the silver grain's streaming shape. */
  final case class Fix(
      roundId: String, courseId: String,
      fixTimestamp: java.sql.Timestamp,
      locationIndex: Int, holeNumber: Option[Int], pace: Option[Double],
      isCache: Boolean)

  final case class RoundSummary(
      roundId: String, courseId: String,
      fixCount: Long, firstFix: java.sql.Timestamp, lastFix: java.sql.Timestamp,
      avgPace: Option[Double])

  /** Mutable-per-key accumulator held in the state store. */
  final case class RoundState(
      courseId: String, fixCount: Long,
      firstFix: Long, lastFix: Long,
      paceSum: Double, paceCount: Long)

  /** File-source streaming read of landed JSON rounds — at scale this is
    * the continuous version of the bronze→silver hop (same directory
    * layout, schema locked up front: streaming sources must not infer). */
  /** JSON wire format for fix timestamps: full microsecond precision —
    * the default (millisecond) format silently truncates event times,
    * which shifts session/window boundaries for sub-ms telemetry. */
  val FixTimestampFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def readFixStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
      .schema(
        "roundId STRING, courseId STRING, fixTimestamp TIMESTAMP, " +
          "locationIndex INT, holeNumber INT, pace DOUBLE, isCache BOOLEAN")
      .option("timestampFormat", FixTimestampFormat)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.json(dir)
  }

  /** W1's streaming form: exact-once per (round, ts, index) within the
    * watermark horizon. State size is bounded by the watermark — the
    * batch window dedup's unbounded shuffle becomes a TTL'd state store. */
  def dedupStream(fixes: DataFrame, watermark: String = "10 minutes"): DataFrame =
    fixes
      .withWatermark("fixTimestamp", watermark)
      .dropDuplicatesWithinWatermark("roundId", "fixTimestamp", "locationIndex")

  /** Tumbling-window pace rollup per course — the streaming analogue of
    * the gold seasonality/pace models. */
  def windowedPace(
      fixes: DataFrame,
      watermark: String = "10 minutes",
      windowLength: String = "5 minutes"): DataFrame =
    fixes
      .withWatermark("fixTimestamp", watermark)
      .groupBy(col("courseId"), window(col("fixTimestamp"), windowLength))
      .agg(
        count(lit(1)).as("fixes"),
        avg(col("pace")).as("avg_pace"),
        approx_count_distinct(col("roundId")).as("active_rounds"))
      .select(
        col("courseId"),
        col("window.start").as("window_start"),
        col("fixes"), col("avg_pace"), col("active_rounds"))

  /** Gap-based session windows over the fix stream — the NATIVE
    * streaming session operator (merging session state in the state
    * store, closed and emitted once the watermark passes the session
    * end). Batch twin: analytics.Sessions.sessionWindows — same
    * session_window call, so batch backfill and the live stream compute
    * identical segmentations. */
  def sessionizedPace(
      fixes: DataFrame,
      watermark: String = "10 minutes",
      gap: String = "30 minutes"): DataFrame =
    fixes
      .withWatermark("fixTimestamp", watermark)
      .groupBy(col("roundId"), session_window(col("fixTimestamp"), gap).as("sw"))
      .agg(count(lit(1)).as("fixes"), avg(col("pace")).as("avg_pace"))
      .select(col("roundId"),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("fixes"), col("avg_pace"))

  /** Stream-STATIC dimension enrichment: each micro-batch of the fix
    * stream joins the (small, slowly-changing) dim by equality — the
    * continuous form of the J2 dim-enrich join. The static side is
    * explicitly broadcast: stream-static joins re-plan per micro-batch,
    * and a shuffle of the unbounded stream side against a dim that fits
    * in memory would be the wrong plan every time. No watermark is
    * needed — no streaming state accrues; the dim is re-read per batch,
    * which is exactly how slowly-changing enrichment stays fresh. */
  def enrichFixes(fixes: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    fixes.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key))

  /** Streaming read of a landed alert feed (roundId, alertTimestamp,
    * alertId) — the second stream for the interval join below. */
  def readAlertStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("alertRoundId STRING, alertTimestamp TIMESTAMP, alertId INT")
      .option("timestampFormat", FixTimestampFormat)
      .json(dir)

  /** Stream-stream INTERVAL join: each fix is enriched with the alerts
    * of the same round whose timestamp falls within ±`tolerance` of the
    * fix — the live correlate-two-feeds primitive (telemetry × alert
    * bus, clicks × impressions). Both sides carry watermarks and the
    * join condition bounds event time in BOTH directions, so each
    * side's buffered state is evicted once the other side's watermark
    * passes the interval — state is O(rate × (watermark + tolerance)),
    * never unbounded. Inner joins emit eagerly on match (no flush
    * batches needed); only state CLEANUP waits for the watermark.
    *
    * `joinType = "left_outer"` adds the unmatched-fix rows with NULL
    * alert columns — those emit only when the watermark passes the
    * fix's join interval (the engine must PROVE no matching alert can
    * still arrive before it may emit the null), so a terminating run
    * needs late flush batches to drag the watermark past the last real
    * fix, exactly like the session gate. */
  def alertJoinedFixes(
      fixes: DataFrame, alerts: DataFrame,
      tolerance: String = "5 minutes",
      watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val f = fixes.withWatermark("fixTimestamp", watermark)
    val a = alerts.withWatermark("alertTimestamp", watermark)
    f.join(a,
      col("roundId") === col("alertRoundId") &&
        col("alertTimestamp") >= col("fixTimestamp") - expr(s"INTERVAL $tolerance") &&
        col("alertTimestamp") <= col("fixTimestamp") + expr(s"INTERVAL $tolerance"),
      joinType)
  }

  /** fact_rounds as a stateful stream: accumulate per-round counters in
    * the state store, emit the summary when the round's event-time stream
    * goes quiet past the timeout. KeyValueGroupedDataset +
    * flatMapGroupsWithState — the engine-native replacement for the
    * reference's batch DELETE+append refresh of round summaries. */
  def roundSummaries(
      spark: SparkSession,
      fixes: Dataset[Fix],
      watermark: String = "10 minutes"): Dataset[RoundSummary] = {
    import spark.implicits._

    fixes
      .withWatermark("fixTimestamp", watermark)
      .groupByKey(_.roundId)
      .flatMapGroupsWithState[RoundState, RoundSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (roundId, batch, state: GroupState[RoundState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(RoundSummary(
              roundId, s.courseId, s.fixCount,
              new java.sql.Timestamp(s.firstFix), new java.sql.Timestamp(s.lastFix),
              if (s.paceCount > 0) Some(s.paceSum / s.paceCount) else None))
          } else {
            val updated = batch.foldLeft(state.getOption.getOrElse(
              RoundState("", 0L, Long.MaxValue, Long.MinValue, 0.0, 0L))) { (s, f) =>
              RoundState(
                f.courseId,
                s.fixCount + 1,
                math.min(s.firstFix, f.fixTimestamp.getTime),
                math.max(s.lastFix, f.fixTimestamp.getTime),
                s.paceSum + f.pace.getOrElse(0.0),
                s.paceCount + (if (f.pace.isDefined) 1 else 0))
            }
            state.update(updated)
            // round is "done" when no fix arrives for 15 event-time minutes
            state.setTimeoutTimestamp(updated.lastFix, "15 minutes")
            Iterator.empty
          }
      }
  }
}
