package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The interactive/dashboard query surface (`dashboard/utils/queries.py`,
  * ~60 SQL strings → the distinct query families, parameterized). Each
  * function takes the silver telemetry frame and returns the query's
  * DataFrame — the engine-native replacement for Streamlit → Trino SQL
  * strings (SURVEY §3.3). Everything targets silver directly, matching
  * the reference's "no Gold dependency" dashboard design.
  *
  * Functions with a `courseId` parameter filter FIRST so partition
  * pruning on `(course_id, event_date)` kicks in at scale.
  */
object DashboardQueries {

  private val nonPadding = col("is_location_padding") === false

  /** OVERVIEW_STATS (queries.py:11-21): one-row lake overview. */
  def overviewStats(silver: DataFrame): DataFrame =
    silver.agg(
      countDistinct(col("course_id")).as("total_courses"),
      countDistinct(col("round_id")).as("total_rounds"),
      count(lit(1)).as("total_events"),
      sum(when(nonPadding, 1).otherwise(0)).as("real_events"),
      min(col("event_date")).as("earliest_date"),
      max(col("event_date")).as("latest_date"))

  /** COURSE_SUMMARY (queries.py:23-46): per-course stats + inferred type. */
  def courseSummary(silver: DataFrame): DataFrame =
    silver.groupBy(col("course_id"))
      .agg(
        countDistinct(col("round_id")).as("round_count"),
        count(lit(1)).as("event_count"),
        sum(when(nonPadding, 1).otherwise(0)).as("real_events"),
        min(col("event_date")).as("first_date"),
        max(col("event_date")).as("last_date"),
        (datediff(max(col("event_date")), min(col("event_date"))) + 1).as("total_days"),
        countDistinct(when(nonPadding, col("event_date"))).as("playing_days"),
        max(col("section_number")).as("max_section"),
        max(col("hole_number")).as("max_hole"))
      .withColumn("inferred_type",
        when(col("max_hole") >= 10, "18-hole")
          .when(col("max_section") > 54, "27-hole")
          .when(col("max_section") > 27, "18-hole (loop)")
          .otherwise("9-hole"))
      .orderBy(col("course_id"))

  /** DATA_QUALITY_SCORE (queries.py:52-160): 18 completeness metrics +
    * the weighted composite (Core 40% / Position 25% / Context 20% /
    * Device 15%). */
  def dataQualityScore(silver: DataFrame): DataFrame = {
    def pctNotNull(c: Column): Column =
      lit(100.0) * sum(when(c.isNotNull, 1).otherwise(0)) / nullif(count(lit(1)), lit(0))
    val metrics = Seq(
      "pace" -> 0.15, "pace_gap" -> 0.05, "positional_gap" -> 0.05,
      "fix_timestamp" -> 0.05, "hole_number" -> 0.08, "section_number" -> 0.08,
      "location_index" -> 0.05, "current_hole" -> 0.02, "current_hole_section" -> 0.02,
      "round_start_time" -> 0.05, "round_end_time" -> 0.05, "start_hole" -> 0.04,
      "start_section" -> 0.03, "is_complete" -> 0.03,
      "device" -> 0.10, "battery_percentage" -> 0.05)
    val gps = lit(0.10) * (lit(100.0) *
      sum(when(col("latitude").isNotNull && col("longitude").isNotNull, 1).otherwise(0)) /
      nullif(count(lit(1)), lit(0)))
    val composite = metrics.map { case (c, w) => lit(w) * pctNotNull(col(c)) }
      .reduce(_ + _) + gps
    val aggs =
      count(lit(1)).as("total_events") +:
        round(composite, 1).as("quality_score") +:
        metrics.map { case (c, _) => round(pctNotNull(col(c)), 1).as(s"${c}_pct") }
    silver.filter(nonPadding)
      .groupBy(col("course_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("course_id"))
  }

  /** get_round_sample (queries.py:400+): bounded per-round fix sample. */
  def roundSample(silver: DataFrame, courseId: String, roundId: Option[String],
      limit: Int = 500): DataFrame = {
    val base = silver.filter(col("course_id") === courseId && nonPadding)
    roundId.fold(base)(r => base.filter(col("round_id") === r))
      .orderBy(col("round_id"), col("location_index"))
      .limit(limit)
  }

  /** get_round_map_points (queries.py:1035-1059): GPS trace of one round. */
  def roundMapPoints(silver: DataFrame, courseId: String, roundId: String): DataFrame =
    silver
      .filter(col("course_id") === courseId && col("round_id") === roundId &&
        nonPadding && col("latitude").isNotNull && col("longitude").isNotNull)
      // partitioned by the round the filter pinned: same numbering, but
      // no single-partition global window (and still correct if a caller
      // ever maps this over many rounds)
      .withColumn("event_sequence",
        row_number().over(
          Window.partitionBy(col("round_id")).orderBy(col("location_index"))))
      .select(
        col("location_index"), col("latitude"), col("longitude"),
        col("nine_number"), col("hole_number"), col("section_number"),
        col("fix_timestamp"), col("pace"), col("event_sequence"))
      .orderBy(col("location_index"))

  /** get_round_progression (queries.py:997-1034): W3/W4 sequencing with
    * hole/section transition classification for ONE round. The window
    * partitions by the round the filter pinned — identical output, but a
    * hash-partitioned WindowExec instead of a single-partition global
    * sort. */
  def roundProgression(silver: DataFrame, courseId: String, roundId: String): DataFrame = {
    val w = Window.partitionBy(col("round_id")).orderBy(col("location_index"))
    def transition(c: Column): Column = {
      val prev = lag(c, 1).over(w)
      when(prev.isNull, "start")
        .when(c === prev, "same")
        .when(c === prev + 1, "next")
        .when(c < prev, "backwards")
        .otherwise("skip")
    }
    silver
      .filter(col("course_id") === courseId && col("round_id") === roundId && nonPadding)
      .select(
        col("round_id"), col("location_index"), col("nine_number"),
        col("hole_number"), col("section_number"), col("fix_timestamp"),
        col("pace"))
      .withColumn("event_sequence", row_number().over(w))
      .withColumn("hole_transition", transition(col("hole_number")))
      .withColumn("section_transition", transition(col("section_number")))
      .drop("round_id")
      .orderBy(col("location_index"))
  }

  /** get_round_progression_summary (queries.py:1060-1120): per-round
    * anomaly counts from LAG transitions (backwards/skip = anomaly). */
  def roundProgressionSummary(silver: DataFrame, courseId: String): DataFrame = {
    val w = Window.partitionBy(col("round_id")).orderBy(col("location_index"))
    def isAnomaly(c: Column, prev: Column): Column =
      when(prev.isNull || c === prev || c === prev + 1, 0).otherwise(1)
    silver
      .filter(col("course_id") === courseId && nonPadding &&
        col("hole_number").isNotNull && col("section_number").isNotNull)
      .select(col("round_id"), col("location_index"),
        col("hole_number"), col("section_number"))
      .withColumn("prev_hole", lag(col("hole_number"), 1).over(w))
      .withColumn("prev_section", lag(col("section_number"), 1).over(w))
      .groupBy(col("round_id"))
      .agg(
        count(lit(1)).as("total_events"),
        sum(isAnomaly(col("hole_number"), col("prev_hole"))).as("hole_anomalies"),
        sum(isAnomaly(col("section_number"), col("prev_section"))).as("section_anomalies"),
        min(col("hole_number")).as("start_hole"),
        max(col("hole_number")).as("end_hole"),
        countDistinct(col("hole_number")).as("holes_visited"))
      .withColumn("hole_anomaly_pct",
        round(lit(100.0) * col("hole_anomalies") /
          nullif(col("total_events"), lit(0)), 1))
      .withColumn("section_anomaly_pct",
        round(lit(100.0) * col("section_anomalies") /
          nullif(col("total_events"), lit(0)), 1))
      .withColumn("progression_quality",
        when(col("hole_anomalies") === 0 && col("section_anomalies") === 0, "clean")
          .when(col("hole_anomalies") <= 2 && col("section_anomalies") <= 5,
            "minor_issues")
          .otherwise("needs_review"))
      .orderBy(desc("hole_anomalies"), desc("section_anomalies"), col("round_id"))
  }

  /** get_hole_duration_for_course (queries.py:950-996): per-hole duration
    * stats with realistic-bounds filter (0 < minutes < 60). */
  def holeDurations(silver: DataFrame, courseId: String): DataFrame =
    silver
      .filter(col("course_id") === courseId && nonPadding &&
        col("hole_number").isNotNull && col("fix_timestamp").isNotNull)
      .groupBy(col("course_id"), col("round_id"), col("hole_number"))
      .agg(min(col("fix_timestamp")).as("hole_start"),
        max(col("fix_timestamp")).as("hole_end"))
      .withColumn("hole_duration_minutes",
        floor((unix_timestamp(col("hole_end")) - unix_timestamp(col("hole_start"))) / 60))
      .filter(col("hole_duration_minutes") > 0 && col("hole_duration_minutes") < 60)
      .groupBy(col("hole_number"))
      .agg(
        count(lit(1)).as("sample_count"),
        round(avg(col("hole_duration_minutes")), 1).as("avg_duration_min"),
        round(expr("percentile_approx(hole_duration_minutes, 0.5, 10000)"), 1)
          .as("median_duration_min"),
        min(col("hole_duration_minutes")).as("min_duration_min"),
        max(col("hole_duration_minutes")).as("max_duration_min"),
        round(stddev(col("hole_duration_minutes")), 1).as("stddev_duration"))
      .orderBy(col("hole_number"))

  /** PACE_BY_HOLE (queries.py:1319-1433): bottleneck classification —
    * hole avg vs course avg (J7), realistic pace bounds. */
  def paceByHole(silver: DataFrame, courseId: Option[String] = None): DataFrame = {
    val base0 = silver.filter(nonPadding && col("pace").isNotNull &&
      col("pace") > 0 && col("pace") < 60 && col("hole_number").isNotNull)
    val base = courseId.fold(base0)(c => base0.filter(col("course_id") === c))
    val courseAvg = base.groupBy(col("course_id").as("ca_course_id"))
      .agg(round(avg(col("pace")), 1).as("course_avg_pace"))
    // sample_rounds decomposed from the stats agg: countDistinct +
    // percentile_approx in ONE agg makes the distinct rewrite build a
    // partial quantile sketch per (course, hole, round) — see
    // DashboardQueries2.globalPaceComparison for the measured cost.
    val stats = base
      .groupBy(col("course_id"), col("hole_number"))
      .agg(
        count(lit(1)).as("sample_events"),
        round(avg(col("pace")), 1).as("avg_pace"),
        round(expr("percentile_approx(pace, 0.5, 10000)"), 1).as("median_pace"),
        round(min(col("pace")), 1).as("min_pace"),
        round(max(col("pace")), 1).as("max_pace"),
        round(stddev(col("pace")), 1).as("pace_stddev"),
        avg(col("pace")).as("raw_avg_pace"))
    base
      .groupBy(col("course_id"), col("hole_number"))
      .agg(countDistinct(col("round_id")).as("sample_rounds"))
      .join(stats, Seq("course_id", "hole_number"))
      .select(col("course_id"), col("hole_number"), col("sample_rounds"),
        col("sample_events"), col("avg_pace"), col("median_pace"),
        col("min_pace"), col("max_pace"), col("pace_stddev"),
        col("raw_avg_pace"))
      .join(broadcast(courseAvg), col("course_id") === col("ca_course_id"))
      // + 0.0 normalizes IEEE signed zero: the raw difference can be a
      // ±1e-14 summation-order residue, and round() preserves the sign
      // bit (-0.0 vs +0.0 hash differently downstream). -0.0 + 0.0 = +0.0.
      .withColumn("pace_vs_avg",
        round(col("raw_avg_pace") - col("course_avg_pace"), 1) + lit(0.0))
      .withColumn("hole_category",
        when(col("raw_avg_pace") > col("course_avg_pace") * 1.15, "bottleneck")
          .when(col("raw_avg_pace") < col("course_avg_pace") * 0.85, "fast")
          .otherwise("normal"))
      .drop("ca_course_id", "raw_avg_pace")
      .orderBy(col("course_id"), col("hole_number"))
  }

  /** PACE_BY_SECTION (queries.py:1434-1459). */
  def paceBySection(silver: DataFrame, courseId: Option[String] = None): DataFrame = {
    val base0 = silver.filter(nonPadding && col("pace").isNotNull &&
      col("pace") > 0 && col("pace") < 60 &&
      col("hole_number").isNotNull && col("section_number").isNotNull)
    val base = courseId.fold(base0)(c => base0.filter(col("course_id") === c))
    // decomposed distinct count — same Expand-vs-sketch hazard as paceByHole
    val stats = base
      .groupBy(col("course_id"), col("hole_number"), col("section_number"))
      .agg(
        round(avg(col("pace")), 1).as("avg_pace"),
        round(expr("percentile_approx(pace, 0.5, 10000)"), 1).as("median_pace"))
    base
      .groupBy(col("course_id"), col("hole_number"), col("section_number"))
      .agg(countDistinct(col("round_id")).as("sample_rounds"))
      .join(stats, Seq("course_id", "hole_number", "section_number"))
      .select(col("course_id"), col("hole_number"), col("section_number"),
        col("sample_rounds"), col("avg_pace"), col("median_pace"))
      .orderBy(col("course_id"), col("hole_number"), col("section_number"))
  }

  /** get_nine_loop_pace_comparison (queries.py:1460-1502): the fatigue
    * query — same hole, first vs second pass, 18-hole rounds only. The
    * grain behind the published 207s/247s oracle (PRESENTATION_NOTES). */
  def nineLoopPaceComparison(silver: DataFrame, courseId: String): DataFrame = {
    val base = silver
      .filter(col("course_id") === courseId && nonPadding &&
        col("is_nine_hole") === false &&
        col("pace").isNotNull && col("pace") > 0 && col("pace") < 60 &&
        col("hole_number").isNotNull && col("nine_number").isNotNull)
    // decomposed distinct count — same Expand-vs-sketch hazard as paceByHole
    val stats = base
      .groupBy(col("hole_number"), col("nine_number"))
      .agg(
        count(lit(1)).as("sample_events"),
        round(avg(col("pace")), 1).as("avg_pace"),
        round(expr("percentile_approx(pace, 0.5, 10000)"), 1).as("median_pace"),
        round(min(col("pace")), 1).as("min_pace"),
        round(max(col("pace")), 1).as("max_pace"),
        round(stddev(col("pace")), 1).as("pace_stddev"))
    base
      .groupBy(col("hole_number"), col("nine_number"))
      .agg(countDistinct(col("round_id")).as("sample_rounds"))
      .join(stats, Seq("hole_number", "nine_number"))
      .select(col("hole_number"), col("nine_number"), col("sample_rounds"),
        col("sample_events"), col("avg_pace"), col("median_pace"),
        col("min_pace"), col("max_pace"), col("pace_stddev"))
      .withColumn("pass_number",
        when(col("nine_number") === 1, "first_nine")
          .when(col("nine_number") === 2, "second_nine")
          .otherwise(concat(lit("nine_"), col("nine_number"))))
      .orderBy(col("hole_number"), col("nine_number"))
  }

  /** get_round_nine_combinations_for_course (queries.py:589-621, A11):
    * which nine-combinations rounds play, keyed by a '+'-joined sorted
    * distinct-nines string. */
  def nineCombinations(silver: DataFrame, courseId: String): DataFrame =
    silver
      .filter(col("course_id") === courseId && nonPadding &&
        col("nine_number").isNotNull)
      .groupBy(col("round_id"))
      .agg(array_join(array_sort(collect_set(col("nine_number"))), "+")
        .as("nines_combination"))
      .groupBy(col("nines_combination"))
      .agg(count(lit(1)).as("rounds"))
      .orderBy(desc_nulls_last("rounds"), col("nines_combination"))
}
