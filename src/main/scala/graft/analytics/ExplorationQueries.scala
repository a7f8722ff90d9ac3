package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The audit-phase exploration corpus (`pipeline/queries/exploration/`),
  * completing the interactive surface beyond [[DashboardQueries]]/
  * [[DashboardQueries2]]. Same conventions: silver in, DataFrame out.
  */
object ExplorationQueries {

  private def cnt(cond: Column): Column = sum(when(cond, 1).otherwise(0))
  private def pctOf(cond: Column, scale: Int = 1): Column =
    round(lit(100.0) * cnt(cond) / count(lit(1)), scale)

  /** executive_summary.sql:1-7. */
  def executiveSummary(silver: DataFrame): DataFrame =
    silver.agg(
      countDistinct(col("course_id")).as("total_courses"),
      countDistinct(col("round_id")).as("total_rounds"),
      count(lit(1)).as("total_events"))

  /** battery_analysis.sql:1-11. */
  def batteryAnalysis(silver: DataFrame): DataFrame =
    silver.filter(col("battery_percentage").isNotNull)
      .groupBy(col("course_id"))
      .agg(
        count(lit(1)).as("total_events"),
        cnt(col("battery_percentage") < 20).as("low_battery"),
        pctOf(col("battery_percentage") < 20).as("pct_low_battery"))
      .orderBy(desc("pct_low_battery"))

  /** pace_gap_coverage.sql:1-10. */
  def paceGapCoverage(silver: DataFrame): DataFrame =
    silver.groupBy(col("course_id"))
      .agg(
        count(lit(1)).as("total_events"),
        cnt(col("pace_gap").isNull).as("missing_pace_gap"),
        pctOf(col("pace_gap").isNull).as("pct_missing"))
      .orderBy(desc("pct_missing"))

  /** dataset_variance.sql:1-16. */
  def datasetVariance(silver: DataFrame): DataFrame =
    silver.groupBy(col("course_id"))
      .agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("round_id")).as("total_rounds"),
        round(count(lit(1)).cast("double") / countDistinct(col("round_id")), 1)
          .as("avg_events_per_round"),
        min(col("fix_timestamp")).as("earliest_data"),
        max(col("fix_timestamp")).as("latest_data"),
        countDistinct(to_date(col("fix_timestamp"))).as("unique_days"),
        max(col("location_index")).as("max_location_index"),
        countDistinct(col("hole_number")).as("unique_holes_seen"),
        countDistinct(col("start_hole")).as("unique_start_holes"))
      .orderBy(desc("total_events"))

  /** null_analysis.sql:1-34: per-course null breakdown. */
  def nullAnalysis(silver: DataFrame): DataFrame =
    silver.groupBy(col("course_id"))
      .agg(
        count(lit(1)).as("total_rows"),
        cnt(col("is_timestamp_missing") === true).as("null_timestamp"),
        pctOf(col("is_timestamp_missing") === true, 2).as("pct_null_timestamp"),
        cnt(col("pace").isNull).as("null_pace"),
        pctOf(col("pace").isNull, 2).as("pct_null_pace"),
        cnt(col("pace_gap").isNull).as("null_pace_gap"),
        pctOf(col("pace_gap").isNull, 2).as("pct_null_pace_gap"),
        cnt(col("positional_gap").isNull).as("null_positional_gap"),
        pctOf(col("positional_gap").isNull, 2).as("pct_null_positional_gap"),
        cnt(col("hole_number").isNull).as("null_hole"),
        pctOf(col("hole_number").isNull, 2).as("pct_null_hole"),
        cnt(col("section_number").isNull).as("null_section"),
        pctOf(col("section_number").isNull, 2).as("pct_null_section"),
        cnt(col("latitude").isNull || col("longitude").isNull).as("null_gps"),
        pctOf(col("latitude").isNull || col("longitude").isNull, 2).as("pct_null_gps"),
        cnt(col("battery_percentage").isNull).as("null_battery"),
        pctOf(col("battery_percentage").isNull, 2).as("pct_null_battery"),
        cnt(col("start_hole").isNull).as("null_start_hole"),
        pctOf(col("start_hole").isNull, 2).as("pct_null_start_hole"),
        cnt(col("goal_time").isNull).as("null_goal_time"),
        pctOf(col("goal_time").isNull, 2).as("pct_null_goal_time"))
      .orderBy(desc("pct_null_timestamp"), col("course_id"))

  /** null_pattern_by_hole.sql:1-31: which holes lose data. */
  def nullPatternByHole(silver: DataFrame): DataFrame =
    silver.filter(col("hole_number").isNotNull)
      .groupBy(col("course_id"), col("hole_number"))
      .agg(
        count(lit(1)).as("total_records"),
        cnt(col("pace").isNull).as("null_pace"),
        cnt(col("pace_gap").isNull).as("null_pace_gap"),
        cnt(col("positional_gap").isNull).as("null_pos_gap"),
        cnt(col("battery_percentage").isNull).as("null_battery"),
        cnt(col("is_timestamp_missing") === true).as("null_timestamp"),
        pctOf(col("pace").isNull).as("pct_null_pace"),
        pctOf(col("pace_gap").isNull).as("pct_null_pace_gap"),
        round(lit(100.0) *
          (cnt(col("pace").isNull) + cnt(col("pace_gap").isNull) +
            cnt(col("positional_gap").isNull)) / (count(lit(1)) * 3), 1)
          .as("avg_null_rate"))
      .orderBy(col("course_id"), col("hole_number"))

  /** data_completeness_summary.sql:1-30: completeness pcts + composite. */
  def dataCompletenessSummary(silver: DataFrame): DataFrame = {
    val tsComplete = col("fix_timestamp").isNotNull &&
      col("is_timestamp_missing") === false
    silver.groupBy(col("course_id"))
      .agg(
        count(lit(1)).as("total_records"),
        countDistinct(col("round_id")).as("unique_rounds"),
        pctOf(tsComplete).as("timestamp_complete_pct"),
        pctOf(col("pace").isNotNull).as("pace_complete_pct"),
        pctOf(col("pace_gap").isNotNull).as("pace_gap_complete_pct"),
        pctOf(col("positional_gap").isNotNull).as("pos_gap_complete_pct"),
        pctOf(col("hole_number").isNotNull).as("hole_complete_pct"),
        pctOf(col("latitude").isNotNull && col("longitude").isNotNull)
          .as("gps_complete_pct"),
        pctOf(col("battery_percentage").isNotNull).as("battery_complete_pct"),
        pctOf(col("start_hole").isNotNull).as("start_hole_complete_pct"),
        round((
          lit(100.0) * cnt(tsComplete) / count(lit(1)) +
            lit(100.0) * cnt(col("pace").isNotNull) / count(lit(1)) +
            lit(100.0) * cnt(col("hole_number").isNotNull) / count(lit(1)) +
            lit(100.0) * cnt(col("latitude").isNotNull) / count(lit(1))) / 4, 1)
          .as("overall_completeness_score"))
      .orderBy(desc("overall_completeness_score"))
  }
}
