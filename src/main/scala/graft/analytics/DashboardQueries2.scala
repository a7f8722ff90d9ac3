package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dashboard query surface, part 2 — the remaining families from
  * `dashboard/utils/queries.py`: completeness/padding profiling, course
  * profile joins, round validation, device fleet, map centroids, and the
  * cross-course GLOBAL_* comparisons. Same conventions as
  * [[DashboardQueries]]: silver in, DataFrame out, course filters first
  * for partition pruning.
  */
object DashboardQueries2 {

  private val nonPadding = col("is_location_padding") === false

  private def pctNotNull(c: Column): Column =
    round(lit(100.0) * sum(when(c.isNotNull, 1).otherwise(0)) / count(lit(1)), 1)

  /** COLUMN_COMPLETENESS (queries.py:156-177). */
  def columnCompleteness(silver: DataFrame): DataFrame =
    silver.filter(nonPadding)
      .groupBy(col("course_id"))
      .agg(
        count(lit(1)).as("total_events"),
        pctNotNull(col("pace")).as("pace_pct"),
        pctNotNull(col("pace_gap")).as("pace_gap_pct"),
        pctNotNull(col("hole_number")).as("hole_pct"),
        pctNotNull(col("section_number")).as("section_pct"),
        round(lit(100.0) * sum(when(
          col("latitude").isNotNull && col("longitude").isNotNull, 1).otherwise(0)) /
          count(lit(1)), 1).as("gps_pct"),
        pctNotNull(col("fix_timestamp")).as("fix_timestamp_pct"),
        pctNotNull(col("start_hole")).as("start_hole_pct"),
        pctNotNull(col("start_section")).as("start_section_pct"),
        pctNotNull(col("is_complete")).as("is_complete_pct"),
        pctNotNull(col("battery_percentage")).as("battery_pct"),
        pctNotNull(col("device")).as("device_pct"))
      .orderBy(col("course_id"))

  /** COLUMN_COMPLETENESS_EXTENDED (queries.py:179-216): the 4-tier
    * grouping used for deep debugging. */
  def columnCompletenessExtended(silver: DataFrame): DataFrame = {
    val tiers = Seq(
      // Core Telemetry
      "pace", "pace_gap", "positional_gap", "latitude", "longitude", "fix_timestamp",
      // Position Tracking
      "hole_number", "section_number", "location_index", "current_hole",
      "current_hole_section",
      // Round Context
      "round_start_time", "round_end_time", "start_hole", "start_section",
      "is_complete", "goal_name", "is_projected", "is_problem", "goal_time",
      "end_section",
      // Device Health
      "device", "battery_percentage")
    val aggs = count(lit(1)).as("total_events") +: tiers.map(c =>
      pctNotNull(col(c)).as(c match {
        case "hole_number" => "hole_pct"
        case "section_number" => "section_pct"
        case "battery_percentage" => "battery_pct"
        case other => s"${other}_pct"
      }))
    silver.filter(nonPadding)
      .groupBy(col("course_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("course_id"))
  }

  /** PADDING_ANALYSIS (queries.py:218-233). */
  def paddingAnalysis(silver: DataFrame): DataFrame =
    silver.groupBy(col("course_id"))
      .agg(
        count(lit(1)).as("total_events"),
        sum(when(col("is_location_padding"), 1).otherwise(0)).as("padding_events"),
        sum(when(nonPadding, 1).otherwise(0)).as("real_events"),
        round(lit(100.0) * sum(when(col("is_location_padding"), 1).otherwise(0)) /
          count(lit(1)), 1).as("padding_pct"))
      .orderBy(desc("padding_pct"))

  /** TOPOLOGY (queries.py:235-250) over the topology dim. */
  def topology(topo: DataFrame): DataFrame =
    topo.select(
        col("facility_id").as("course_id"),
        col("unit_name"), col("nine_number"),
        col("section_start"), col("section_end"),
        (col("section_end") - col("section_start") + 1).as("sections_in_nine"))
      .orderBy(col("course_id"), col("nine_number"))

  /** COURSE_PROFILE (queries.py:252-264) over the human-entered profile dim. */
  def courseProfile(profile: DataFrame): DataFrame =
    profile.select(
        col("course_id"), col("course_type"),
        coalesce(col("is_loop_course"), lit(false)).as("is_loop_course"),
        col("volume_profile"),
        col("peak_season_start_month"), col("peak_season_end_month"),
        col("notes"))
      .orderBy(col("course_id"))

  /** LOOP_COURSES (queries.py:266-276). */
  def loopCourses(profile: DataFrame): DataFrame =
    profile
      .filter(col("is_loop_course") === true || col("course_type").like("%loop%"))
      .select(col("course_id"), col("course_type"), col("notes"))
      .orderBy(col("course_id"))

  /** COURSE_SUMMARY_WITH_PROFILE (queries.py:278-315): inferred stats
    * LEFT-joined with the profile dim (tiny → broadcast). */
  def courseSummaryWithProfile(silver: DataFrame, profile: DataFrame): DataFrame = {
    val cs = DashboardQueries.courseSummary(silver)
      .select(
        col("course_id"), col("round_count"), col("event_count"), col("real_events"),
        col("first_date"), col("last_date"), col("total_days"), col("playing_days"),
        col("inferred_type"))
    cs.join(broadcast(profile), Seq("course_id"), "left")
      .select(
        cs("course_id"), col("round_count"), col("event_count"), col("real_events"),
        col("first_date"), col("last_date"), col("total_days"), col("playing_days"),
        col("inferred_type"),
        coalesce(col("course_type"), col("inferred_type")).as("course_type"),
        coalesce(col("is_loop_course"), lit(false)).as("is_loop_course"),
        col("volume_profile"), col("notes"))
      .orderBy(col("course_id"))
  }

  /** SECTIONS_PER_HOLE (queries.py:317-338) — computed from telemetry. */
  def sectionsPerHole(silver: DataFrame): DataFrame =
    silver
      .filter(nonPadding &&
        col("hole_number").isNotNull && col("section_number").isNotNull)
      .groupBy(col("course_id"), col("hole_number"))
      .agg(
        min(col("section_number")).as("section_start"),
        max(col("section_number")).as("section_end"),
        countDistinct(col("section_number")).as("sections_count"))
      .withColumn("section_range",
        when(col("section_start").isNotNull && col("section_end").isNotNull,
          col("section_end") - col("section_start") + 1))
      .orderBy(col("course_id"), col("hole_number"))

  /** SECTIONS_PER_HOLE_DIM (queries.py:340-354) — over the precomputed dim. */
  def sectionsPerHoleDim(dim: DataFrame): DataFrame =
    dim.select(
        col("course_id"), col("hole_number"),
        col("section_start"), col("section_end"), col("sections_count"),
        (col("section_end") - col("section_start") + 1).as("section_range"))
      .orderBy(col("course_id"), col("hole_number"))

  /** ROUND_TYPES (queries.py:356-377): round-grain flags rolled to course. */
  def roundTypes(silver: DataFrame): DataFrame =
    silver.groupBy(col("course_id"), col("round_id"))
      .agg(
        max(col("is_nine_hole").cast("int")).as("is_nine_hole"),
        max(col("is_complete").cast("int")).as("is_complete"),
        min(col("start_hole")).as("start_hole"))
      .groupBy(col("course_id"))
      .agg(
        count(lit(1)).as("total_rounds"),
        sum(when(col("is_nine_hole") === 1, 1).otherwise(0)).as("nine_hole_rounds"),
        sum(when(col("is_nine_hole") === 0, 1).otherwise(0)).as("full_rounds"),
        sum(when(col("is_complete") === 1, 1).otherwise(0)).as("complete_rounds"),
        sum(when(col("start_hole") =!= 1, 1).otherwise(0)).as("shotgun_starts"))
      .orderBy(col("course_id"))

  /** ROUND_DURATION (queries.py:379-397): bounded-duration stats. */
  def roundDuration(silver: DataFrame): DataFrame =
    silver
      .filter(col("round_duration_minutes").isNotNull &&
        col("round_duration_minutes") > 0 && col("round_duration_minutes") < 600)
      .groupBy(col("course_id"))
      .agg(
        countDistinct(col("round_id")).as("rounds_with_duration"),
        round(avg(col("round_duration_minutes")), 0).as("avg_duration_min"),
        round(min(col("round_duration_minutes")), 0).as("min_duration_min"),
        round(max(col("round_duration_minutes")), 0).as("max_duration_min"))
      .orderBy(col("course_id"))

  /** ROUND_DURATION_DETAILS (queries.py:882-909): one row per round with
    * duration, holes visited and round type, bounded to plausible
    * durations — the input of the dashboard's distribution/outlier
    * views. Pass `courseId` for the per-course variant
    * (get_round_duration_for_course, queries.py:912-941); the filter
    * lands BEFORE the rollup so partition pruning applies. */
  def roundDurationDetails(
      silver: DataFrame, courseId: Option[String] = None): DataFrame = {
    val base0 = silver.filter(nonPadding)
    val base = courseId.fold(base0)(c => base0.filter(col("course_id") === c))
    base.groupBy(col("course_id"), col("round_id"))
      .agg(
        max(col("round_duration_minutes")).as("duration_minutes"),
        (max(col("is_nine_hole").cast("int")) === 1).as("is_nine_hole"),
        countDistinct(col("hole_number")).as("holes_visited"),
        min(col("event_date")).as("round_date"))
      .filter(col("duration_minutes").isNotNull &&
        col("duration_minutes") > 0 && col("duration_minutes") < 600)
      .select(
        col("course_id"), col("round_id"), col("round_date"),
        col("duration_minutes"), col("is_nine_hole"), col("holes_visited"),
        when(col("is_nine_hole"), "9-hole").otherwise("18-hole").as("round_type"))
      .orderBy(col("course_id"), desc("round_date"))
  }

  /** get_round_duration_for_course (queries.py:912): one-course slice. */
  def roundDurationForCourse(silver: DataFrame, courseId: String): DataFrame =
    roundDurationDetails(silver, Some(courseId))

  /** ROUND_LIST (queries.py:424-440): bounded exploration listing. */
  def roundList(silver: DataFrame, limit: Int = 100): DataFrame =
    silver.filter(nonPadding)
      .groupBy(col("course_id"), col("round_id"))
      .agg(min(col("event_date")).as("round_date"), count(lit(1)).as("event_count"))
      .orderBy(col("course_id"), desc("round_date"))
      .limit(limit)

  /** DEVICE_STATS (queries.py:442-466). */
  def deviceStats(silver: DataFrame): DataFrame = {
    def pctOf(cond: Column): Column =
      round(lit(100.0) * sum(when(cond, 1).otherwise(0)) / count(lit(1)), 1)
    silver.filter(nonPadding)
      .groupBy(col("course_id"))
      .agg(
        countDistinct(col("device")).as("unique_devices"),
        round(avg(col("battery_percentage")), 1).as("avg_battery"),
        round(min(col("battery_percentage")), 1).as("min_battery"),
        count(lit(1)).as("total_events"),
        sum(when(col("battery_percentage") < 20, 1).otherwise(0)).as("low_battery_events"),
        pctOf(col("battery_percentage") < 20).as("low_battery_pct"),
        sum(when(col("is_cache"), 1).otherwise(0)).as("cached_events"),
        pctOf(col("is_cache")).as("cached_pct"),
        sum(when(col("is_problem"), 1).otherwise(0)).as("problem_events"),
        pctOf(col("is_problem")).as("problem_pct"),
        sum(when(col("is_projected"), 1).otherwise(0)).as("projected_events"),
        pctOf(col("is_projected")).as("projected_pct"))
      .orderBy(col("course_id"))
  }

  /** COURSE_CENTROIDS (queries.py:468-483): one map point per course. */
  def courseCentroids(silver: DataFrame): DataFrame =
    silver
      .filter(nonPadding && col("latitude").isNotNull && col("longitude").isNotNull)
      .groupBy(col("course_id"))
      .agg(
        round(avg(col("latitude")), 6).as("latitude"),
        round(avg(col("longitude")), 6).as("longitude"),
        count(lit(1)).as("event_count"),
        sum(when(col("is_projected"), 1).otherwise(0)).as("projected_events"))
      .orderBy(col("course_id"))

  /** get_course_topology_map_points (queries.py:485-517): (nine, hole,
    * section) centroids for one course's map. Course filter first →
    * partition-pruned. */
  def courseTopologyMapPoints(silver: DataFrame, courseId: String): DataFrame =
    silver
      .filter(col("course_id") === courseId)
      .filter(nonPadding &&
        col("latitude").isNotNull && col("longitude").isNotNull &&
        col("nine_number").isNotNull && col("hole_number").isNotNull &&
        col("section_number").isNotNull)
      .groupBy(col("course_id"), col("nine_number"), col("hole_number"),
        col("section_number"))
      .agg(
        round(avg(col("latitude")), 6).as("latitude"),
        round(avg(col("longitude")), 6).as("longitude"),
        count(lit(1)).as("event_count"),
        sum(when(col("is_projected"), 1).otherwise(0)).as("projected_events"),
        round(lit(100.0) * sum(when(col("is_projected"), 1).otherwise(0)) /
          count(lit(1)), 1).as("projected_pct"))
      .orderBy(col("nine_number"), col("hole_number"), col("section_number"))

  /** ROUND_LENGTH_DISTRIBUTION (queries.py:549-587): holes-visited buckets. */
  def roundLengthDistribution(silver: DataFrame): DataFrame =
    silver
      .filter(nonPadding && col("hole_number").isNotNull)
      .groupBy(col("course_id"), col("round_id"))
      .agg(countDistinct(col("hole_number")).as("holes_visited"))
      .withColumn("round_length_bucket",
        when(col("holes_visited") < 9, "<9")
          .when(col("holes_visited") === 9, "9")
          .when(col("holes_visited") === 18, "18")
          .when(col("holes_visited") === 27, "27")
          .when(col("holes_visited") > 27, ">27")
          .otherwise("other (10–26)"))
      .groupBy(col("course_id"), col("round_length_bucket"))
      .agg(count(lit(1)).as("round_count"))
      .orderBy(col("course_id"),
        when(col("round_length_bucket") === "<9", 1)
          .when(col("round_length_bucket") === "9", 2)
          .when(col("round_length_bucket") === "18", 3)
          .when(col("round_length_bucket") === "27", 4)
          .when(col("round_length_bucket") === ">27", 5)
          .otherwise(6))

  /** ROUND_VALIDATION (queries.py:664-742): logical-consistency flags per
    * round (duration / sequence / event-count / pace-coverage). */
  def roundValidation(silver: DataFrame, courseId: Option[String] = None): DataFrame = {
    val base = courseId.fold(silver)(c => silver.filter(col("course_id") === c))
    // two countDistincts in one round-grain agg Expand the FIX-grain
    // scan ×3 before partial aggregation (measured: 5.3 s at sf0.1,
    // slope 0.82 at ×100-skew). Pre-roll to visit grain (course, round,
    // hole, section) first — one map-side-combined corpus shuffle; every
    // other aggregate decomposes over it, and the multi-distinct Expand
    // then multiplies ~50 visit rows per round, not ~120 fixes.
    val pre = base
      .groupBy(col("course_id"), col("round_id"),
        col("hole_number"), col("section_number"))
      .agg(
        max(col("round_duration_minutes")).as("__dur"),
        min(col("start_hole")).as("__sh"),
        count(lit(1)).as("__cnt"),
        sum(when(nonPadding, 1).otherwise(0)).as("__real"),
        max(col("is_complete").cast("int")).as("__ic"),
        max(col("is_nine_hole").cast("int")).as("__inh"),
        sum(when(col("pace").isNotNull, 1).otherwise(0)).as("__pc"))
    pre
      .groupBy(col("course_id"), col("round_id"))
      .agg(
        max(col("__dur")).as("duration_minutes"),
        min(col("__sh")).as("start_hole"),
        min(col("hole_number")).as("min_hole"),
        max(col("hole_number")).as("max_hole"),
        countDistinct(col("hole_number")).as("holes_visited"),
        countDistinct(col("section_number")).as("sections_visited"),
        sum(col("__cnt")).as("event_count"),
        sum(col("__real")).as("real_events"),
        max(col("__ic")).as("is_complete"),
        max(col("__inh")).as("is_nine_hole"),
        sum(col("__pc")).as("events_with_pace"))
      .withColumn("duration_valid",
        when(col("duration_minutes").isNull, false)
          .when(col("is_nine_hole") === 1 &&
            col("duration_minutes").between(45, 200), true)
          .when(col("is_nine_hole") === 0 &&
            col("duration_minutes").between(90, 400), true)
          .otherwise(false))
      .withColumn("sequence_valid",
        when(col("start_hole").isNull, false)
          .when(col("min_hole").isNull, false)
          .when(col("start_hole") > 1 && col("min_hole") === col("start_hole"), true)
          .when(col("start_hole") === 1 && col("min_hole") === 1, true)
          .otherwise(false))
      .withColumn("events_valid",
        when(col("real_events") < 10, false)
          .when(col("is_nine_hole") === 1 && col("real_events") >= 9, true)
          .when(col("is_nine_hole") === 0 && col("real_events") >= 18, true)
          .otherwise(false))
      .withColumn("pace_valid",
        when(col("events_with_pace") === 0, false)
          .when(col("events_with_pace").cast("double") /
            nullif(col("real_events"), lit(0)) >= 0.5, true)
          .otherwise(false))
      .orderBy(col("course_id"), col("round_id"))
  }

  /** ROUND_VALIDATION_SUMMARY (queries.py:820-880). */
  def roundValidationSummary(silver: DataFrame): DataFrame =
    roundValidation(silver)
      .groupBy(col("course_id"))
      .agg(
        count(lit(1)).as("total_rounds"),
        sum(col("duration_valid").cast("int")).as("rounds_duration_valid"),
        sum(col("events_valid").cast("int")).as("rounds_events_valid"),
        sum(col("pace_valid").cast("int")).as("rounds_pace_valid"),
        round(lit(100.0) * sum(col("duration_valid").cast("int")) / count(lit(1)), 1)
          .as("pct_duration_valid"),
        round(lit(100.0) * sum(col("events_valid").cast("int")) / count(lit(1)), 1)
          .as("pct_events_valid"),
        round(lit(100.0) * sum(col("pace_valid").cast("int")) / count(lit(1)), 1)
          .as("pct_pace_valid"))
      .orderBy(col("course_id"))

  /** get_pace_comparison_for_hole (queries.py:1503-1529). */
  def paceComparisonForHole(
      silver: DataFrame, courseId: String, holeNumber: Int): DataFrame =
    silver
      .filter(col("course_id") === courseId)
      .filter(nonPadding && col("is_nine_hole") === false &&
        col("pace").isNotNull && col("pace") > 0 && col("pace") < 60 &&
        col("hole_number") === holeNumber && col("nine_number").isNotNull)
      .select(
        col("round_id"), col("nine_number"),
        when(col("nine_number") === 1, "first_nine")
          .when(col("nine_number") === 2, "second_nine")
          .otherwise(concat(lit("nine_"), col("nine_number"))).as("pass_number"),
        col("pace"), col("fix_timestamp"))
      .orderBy(col("round_id"), col("fix_timestamp"))

  /** BOTTLENECK_SUMMARY (queries.py:1531-1577): per-course bottleneck /
    * fast hole counts vs the course average (J7 self-comparison as a
    * window, no self-join). */
  def bottleneckSummary(silver: DataFrame): DataFrame = {
    val holePace = silver.filter(nonPadding &&
      col("pace").isNotNull && col("pace") > 0 && col("pace") < 60 &&
      col("hole_number").isNotNull)
    val holeStats = holePace
      .groupBy(col("course_id"), col("hole_number"))
      .agg(avg(col("pace")).as("avg_pace"), sum(col("pace")).as("psum"),
        count(col("pace")).as("pcnt"))
      // course avg over FIXES (not hole averages): ratio of summed pace
      .withColumn("course_avg_pace",
        sum(col("psum")).over(Window.partitionBy(col("course_id"))) /
          sum(col("pcnt")).over(Window.partitionBy(col("course_id"))))
    holeStats
      .groupBy(col("course_id"))
      .agg(
        count(lit(1)).as("total_holes"),
        sum(when(col("avg_pace") > col("course_avg_pace") * 1.15, 1).otherwise(0))
          .as("bottleneck_holes"),
        sum(when(col("avg_pace") < col("course_avg_pace") * 0.85, 1).otherwise(0))
          .as("fast_holes"),
        round(max(col("course_avg_pace")), 1).as("course_avg_pace"),
        round(max(col("avg_pace")), 1).as("slowest_hole_pace"),
        round(min(col("avg_pace")), 1).as("fastest_hole_pace"))
      .orderBy(desc("bottleneck_holes"))
  }

  // ---------------------------------------------------- GLOBAL_* family

  /** GLOBAL_OVERVIEW (queries.py:1125-1141). */
  def globalOverview(silver: DataFrame): DataFrame = {
    // four countDistincts in one agg Expand the full scan ×5 before
    // partial aggregation. Decompose per the gm_global_overview
    // discipline: one codegen counter agg + a column-pruned two-level
    // distinct agg per distinct column; all are single-row frames, so
    // the crossJoins are free.
    val base = silver.filter(nonPadding)
    val counters = base.agg(
      count(lit(1)).as("total_events"),
      sum(when(nonPadding, 1).otherwise(0)).as("real_events"),
      min(col("event_date")).as("earliest_date"),
      max(col("event_date")).as("latest_date"),
      round(avg(col("pace")), 1).as("global_avg_pace"),
      round(avg(col("battery_percentage")), 1).as("global_avg_battery"))
    def dcount(c: String, as: String): DataFrame =
      base.select(col(c)).agg(countDistinct(col(c)).as(as))
    counters
      .crossJoin(dcount("course_id", "total_courses"))
      .crossJoin(dcount("round_id", "total_rounds"))
      .crossJoin(dcount("device", "unique_devices"))
      .crossJoin(dcount("event_date", "total_playing_days"))
      .select(col("total_courses"), col("total_rounds"), col("total_events"),
        col("real_events"), col("unique_devices"), col("earliest_date"),
        col("latest_date"), col("total_playing_days"),
        col("global_avg_pace"), col("global_avg_battery"))
  }

  /** GLOBAL_PACE_COMPARISON (queries.py:1143-1162). */
  def globalPaceComparison(silver: DataFrame): DataFrame = {
    // countDistinct is DECOMPOSED into its own aggregation: mixing it
    // with percentile_approx in one agg makes the distinct-rewrite's
    // first stage group by (course_id, round_id) and build a partial
    // accuracy-10000 quantile sketch PER ROUND (measured 24 s at sf0.1
    // vs ~1.5 s decomposed — and per-group sketch memory at 100 TB).
    // Two cheap scans + a group-grain join beat one Expand plan.
    val base = silver
      .filter(nonPadding && col("pace").isNotNull &&
        col("pace") > 0 && col("pace") < 600)
    val stats = base
      .groupBy(col("course_id"))
      .agg(
        round(avg(col("pace")), 1).as("avg_pace"),
        round(percentile_approx(col("pace"), lit(0.5), lit(10000)), 1).as("median_pace"),
        round(min(col("pace")), 1).as("min_pace"),
        round(max(col("pace")), 1).as("max_pace"),
        round(stddev(col("pace")), 1).as("pace_stddev"),
        round(avg(col("pace_gap")), 1).as("avg_pace_gap"))
    base
      .groupBy(col("course_id"))
      .agg(countDistinct(col("round_id")).as("round_count"))
      .join(stats, Seq("course_id"))
      .select(col("course_id"), col("round_count"), col("avg_pace"),
        col("median_pace"), col("min_pace"), col("max_pace"),
        col("pace_stddev"), col("avg_pace_gap"))
      .orderBy(col("avg_pace"))
  }

  /** GLOBAL_ROUND_DURATION_COMPARISON (queries.py:1164-1193). */
  def globalRoundDurationComparison(silver: DataFrame): DataFrame =
    silver
      .filter(nonPadding && col("round_duration_minutes").isNotNull &&
        col("round_duration_minutes") > 30 && col("round_duration_minutes") < 480)
      .groupBy(col("course_id"), col("round_id"))
      .agg(
        max(col("round_duration_minutes")).as("duration_minutes"),
        (max(col("is_nine_hole").cast("int")) === 1).as("is_nine_hole"))
      .groupBy(col("course_id"))
      .agg(
        count(lit(1)).as("round_count"),
        round(avg(col("duration_minutes")), 0).as("avg_duration_min"),
        round(percentile_approx(col("duration_minutes"), lit(0.5), lit(10000)), 0)
          .as("median_duration_min"),
        round(min(col("duration_minutes")), 0).as("min_duration_min"),
        round(max(col("duration_minutes")), 0).as("max_duration_min"),
        round(stddev(col("duration_minutes")), 0).as("duration_stddev"),
        sum(when(col("is_nine_hole"), 1).otherwise(0)).as("nine_hole_rounds"),
        sum(when(!col("is_nine_hole"), 1).otherwise(0)).as("full_rounds"))
      .orderBy(col("avg_duration_min"))

  /** GLOBAL_WEEKDAY_HEATMAP (queries.py:1195-1207). */
  def globalWeekdayHeatmap(silver: DataFrame): DataFrame =
    silver
      .filter(nonPadding && col("event_weekday").isNotNull)
      .groupBy(col("course_id"), col("event_weekday"))
      .agg(countDistinct(col("round_id")).as("round_count"))
      .orderBy(col("course_id"), col("event_weekday"))

  /** GLOBAL_HOURLY_DISTRIBUTION (queries.py:1209-1221). */
  def globalHourlyDistribution(silver: DataFrame): DataFrame =
    silver
      .filter(nonPadding && col("round_start_time").isNotNull)
      .groupBy(col("course_id"), hour(col("round_start_time")).as("start_hour"))
      .agg(countDistinct(col("round_id")).as("round_count"))
      .orderBy(col("course_id"), col("start_hour"))

  /** GLOBAL_DATA_QUALITY_RANKING (queries.py:1223-1249). */
  def globalDataQualityRanking(silver: DataFrame): DataFrame = {
    val metrics = silver.filter(nonPadding)
      .groupBy(col("course_id"))
      .agg(
        count(lit(1)).as("total_events"),
        round(lit(100.0) * sum(when(col("pace").isNotNull, 1).otherwise(0)) /
          nullif(count(lit(1)), lit(0)), 1).as("pace_completeness"),
        round(lit(100.0) * sum(when(
          col("latitude").isNotNull && col("longitude").isNotNull, 1).otherwise(0)) /
          nullif(count(lit(1)), lit(0)), 1).as("gps_completeness"),
        round(lit(100.0) * sum(when(col("hole_number").isNotNull, 1).otherwise(0)) /
          nullif(count(lit(1)), lit(0)), 1).as("hole_completeness"),
        round(lit(100.0) * sum(when(col("fix_timestamp").isNotNull, 1).otherwise(0)) /
          nullif(count(lit(1)), lit(0)), 1).as("timestamp_completeness"))
    val score = (col("pace_completeness") + col("gps_completeness") +
      col("hole_completeness") + col("timestamp_completeness")) / 4
    // RANK as 1 + count of strictly-greater scores via a broadcast
    // self-join of the tiny per-course aggregate (same shape as w5_rank):
    // no WindowExec at all, so nothing single-partition even in the plan.
    val scored = metrics.withColumn("avg_quality_score", round(score, 1))
      .withColumn("__score", score)
    val rankByScore = scored.select(col("__score")).distinct()
      .join(broadcast(scored.select(col("__score").as("__s2"))),
        col("__s2") > col("__score"), "left")
      .groupBy(col("__score"))
      .agg((count(col("__s2")) + 1).cast("int").as("quality_rank"))
    scored.join(broadcast(rankByScore), Seq("__score"))
      .drop("__score")
      .orderBy(col("quality_rank"))
  }

  /** GLOBAL_DEVICE_FLEET (queries.py:1251-1267). */
  def globalDeviceFleet(silver: DataFrame): DataFrame =
    silver.filter(nonPadding)
      .groupBy(col("course_id"))
      .agg(
        countDistinct(col("device")).as("unique_devices"),
        countDistinct(col("round_id")).as("rounds_tracked"),
        round(countDistinct(col("round_id")).cast("double") /
          nullif(countDistinct(col("device")), lit(0)), 1).as("rounds_per_device"),
        round(avg(col("battery_percentage")), 1).as("avg_battery"),
        round(min(col("battery_percentage")), 1).as("min_battery"),
        sum(when(col("battery_percentage") < 20, 1).otherwise(0)).as("low_battery_events"),
        sum(when(col("is_problem"), 1).otherwise(0)).as("problem_events"))
      .orderBy(desc("unique_devices"))

  /** GLOBAL_MONTHLY_TREND (queries.py:1269-1283). */
  def globalMonthlyTrend(silver: DataFrame): DataFrame =
    silver
      .filter(nonPadding && col("event_year").isNotNull && col("event_month").isNotNull)
      .groupBy(col("event_year"), col("event_month"), col("course_id"))
      .agg(countDistinct(col("round_id")).as("round_count"))
      .orderBy(col("event_year"), col("event_month"), col("course_id"))

  /** GLOBAL_COMPLETION_RATES (queries.py:1285-1313). */
  def globalCompletionRates(silver: DataFrame): DataFrame =
    silver.filter(nonPadding)
      .groupBy(col("course_id"), col("round_id"))
      .agg(
        max(col("is_complete").cast("int")).as("is_complete"),
        countDistinct(col("hole_number")).as("holes_visited"),
        max(col("is_nine_hole").cast("int")).as("is_nine_hole"))
      .groupBy(col("course_id"))
      .agg(
        count(lit(1)).as("total_rounds"),
        sum(col("is_complete")).as("complete_rounds"),
        round(lit(100.0) * sum(col("is_complete")) / nullif(count(lit(1)), lit(0)), 1)
          .as("completion_rate"),
        round(avg(col("holes_visited")), 1).as("avg_holes_visited"),
        sum(col("is_nine_hole")).as("nine_hole_rounds"),
        sum(when(col("is_nine_hole") === 0, 1).otherwise(0)).as("eighteen_hole_rounds"))
      .orderBy(desc("completion_rate"))

  /** INFRASTRUCTURE_STATS (queries.py:1579-1591). */
  def infrastructureStats(silver: DataFrame): DataFrame =
    silver.agg(
      countDistinct(col("course_id")).as("total_courses"),
      countDistinct(col("round_id")).as("total_rounds"),
      count(lit(1)).as("total_events"),
      sum(when(nonPadding, 1).otherwise(0)).as("real_events"),
      min(col("event_date")).as("earliest_date"),
      max(col("event_date")).as("latest_date"),
      countDistinct(col("event_date")).as("total_days"),
      countDistinct(col("ingest_date")).as("ingest_batches"))

  /** EVENTS_PER_COURSE (queries.py:1593-1607). */
  def eventsPerCourse(silver: DataFrame): DataFrame =
    silver.groupBy(col("course_id"))
      .agg(
        countDistinct(col("round_id")).as("rounds"),
        count(lit(1)).as("total_events"),
        sum(when(nonPadding, 1).otherwise(0)).as("real_events"),
        min(col("event_date")).as("first_date"),
        max(col("event_date")).as("last_date"),
        countDistinct(col("event_date")).as("playing_days"),
        round(count(lit(1)) * lit(1.0) /
          nullif(countDistinct(col("round_id")), lit(0)), 0).as("avg_events_per_round"))
      .orderBy(desc("total_events"))

  /** EVENTS_BY_MONTH (queries.py:1609-1623). */
  def eventsByMonth(silver: DataFrame): DataFrame =
    silver
      .filter(col("event_year").isNotNull && col("event_month").isNotNull)
      .groupBy(col("event_year"), col("event_month"))
      .agg(
        countDistinct(col("course_id")).as("courses_active"),
        countDistinct(col("round_id")).as("rounds"),
        count(lit(1)).as("events"))
      .orderBy(col("event_year"), col("event_month"))
}
