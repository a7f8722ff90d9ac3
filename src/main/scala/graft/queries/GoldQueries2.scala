package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.gold.GoldModels

/** Gold-model parity gate, part 2: the course-level analysis models, the
  * silver_normalized family, and the cross-model stitches (dim_course,
  * gold_coverage_audit). Same synthetic-silver mapping as GoldQueries.
  */
object GoldQueries2 {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  private def silverOf(s: SparkSession, d: String): DataFrame =
    GoldQueries.silverView(s, d)

  /** course_configuration_analysis reproduced in DuckDB. */
  val CourseConfigSql: String =
    """course_config AS (
      SELECT course_id, total_rounds, likely_course_type, max_section_seen, max_holes_in_round,
        ROUND(100.0e0 * complete_rounds / NULLIF(total_rounds, 0), 1) AS pct_complete,
        ROUND(100.0e0 * incomplete_rounds / NULLIF(total_rounds, 0), 1) AS pct_incomplete,
        ROUND(100.0e0 * nine_hole_rounds / NULLIF(total_rounds, 0), 1) AS pct_nine_hole,
        ROUND(100.0e0 * full_rounds / NULLIF(total_rounds, 0), 1) AS pct_full_rounds,
        unique_start_holes,
        ROUND(100.0e0 * shotgun_start_rounds / NULLIF(total_rounds, 0), 1) AS pct_shotgun_starts,
        CASE WHEN likely_course_type = '27-hole' THEN ROUND(100.0e0 * single_nine_rounds / NULLIF(total_rounds, 0), 1) END AS pct_single_nine,
        CASE WHEN likely_course_type = '27-hole' THEN ROUND(100.0e0 * two_nine_rounds / NULLIF(total_rounds, 0), 1) END AS pct_two_nines,
        CASE WHEN likely_course_type = '27-hole' THEN ROUND(100.0e0 * three_nine_rounds / NULLIF(total_rounds, 0), 1) END AS pct_all_three_nines,
        avg_locations_per_round, min_locations_per_round, max_locations_per_round,
        CAST(ROUND(
          unique_start_holes * 10 +
          CASE likely_course_type WHEN '27-hole' THEN 30 WHEN '18-hole' THEN 20 ELSE 10 END +
          CASE WHEN 100.0e0 * nine_hole_rounds / NULLIF(total_rounds, 0) > 20 THEN 10 ELSE 0 END +
          CASE WHEN 100.0e0 * incomplete_rounds / NULLIF(total_rounds, 0) > 10 THEN 5 ELSE 0 END
        , 0) AS BIGINT) AS course_complexity_score
      FROM (
        SELECT course_id,
          COUNT(DISTINCT round_id) AS total_rounds,
          MAX(max_section_number) AS max_section_seen,
          MAX(holes_played) AS max_holes_in_round,
          MAX(nines_played) AS max_nines_in_round,
          CASE WHEN MAX(max_section_number) > 54 THEN '27-hole'
               WHEN MAX(max_section_number) > 27 THEN '18-hole'
               ELSE '9-hole' END AS likely_course_type,
          CAST(SUM(CASE WHEN is_nine_hole = TRUE THEN 1 ELSE 0 END) AS BIGINT) AS nine_hole_rounds,
          CAST(SUM(CASE WHEN is_nine_hole = FALSE OR is_nine_hole IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS full_rounds,
          CAST(SUM(CASE WHEN is_complete = TRUE THEN 1 ELSE 0 END) AS BIGINT) AS complete_rounds,
          CAST(SUM(CASE WHEN is_complete = FALSE THEN 1 ELSE 0 END) AS BIGINT) AS incomplete_rounds,
          COUNT(DISTINCT start_hole) AS unique_start_holes,
          CAST(SUM(CASE WHEN start_hole = 1 THEN 1 ELSE 0 END) AS BIGINT) AS rounds_starting_hole_1,
          CAST(SUM(CASE WHEN start_hole <> 1 AND start_hole IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS shotgun_start_rounds,
          CAST(SUM(CASE WHEN nines_played = 1 THEN 1 ELSE 0 END) AS BIGINT) AS single_nine_rounds,
          CAST(SUM(CASE WHEN nines_played = 2 THEN 1 ELSE 0 END) AS BIGINT) AS two_nine_rounds,
          CAST(SUM(CASE WHEN nines_played >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS three_nine_rounds,
          ROUND(AVG(CAST(fix_count AS DOUBLE)), 0) AS avg_locations_per_round,
          MIN(fix_count) AS min_locations_per_round,
          MAX(fix_count) AS max_locations_per_round
        FROM fact_rounds GROUP BY course_id
      )
    )"""

  val defs: Seq[QueryDef] = Seq(

    // §2.8 course_configuration_analysis.
    QueryDef(
      "gm_course_configuration",
      (s, d) =>
        GoldModels.courseConfigurationAnalysis(GoldQueries.cachedFactRounds(s, d))
          .orderBy(col("course_id")),
      Some(s"""WITH ${GoldQueries.SilverSql}, ${GoldQueries.FactRoundsSql}, $CourseConfigSql
               SELECT * FROM course_config ORDER BY course_id""")),

    // §2.8 data_quality_overview — null profiling + tier scores (A15).
    QueryDef(
      "gm_data_quality",
      (s, d) =>
        GoldModels.dataQualityOverview(silverOf(s, d))
          .select(
            col("course_id"), col("total_events"), col("total_rounds"),
            col("pct_missing_pace"), col("pct_missing_pace_gap"),
            col("pct_missing_goal_time"), col("pct_missing_hole_number"),
            col("pct_missing_battery"), col("pct_missing_start_hole"),
            col("pct_timestamp_missing_flag"),
            col("score_tier_1_pace"), col("score_tier_2_location"),
            col("score_tier_3_device"), col("score_tier_4_config"),
            col("data_quality_score"), col("overall_quality_score"))
          .orderBy(col("course_id")),
      Some(s"""WITH ${GoldQueries.SilverSql},
               cs AS (
                 SELECT course_id, COUNT(*) AS total_events,
                 COUNT(DISTINCT round_id) AS total_rounds,
                 CAST(SUM(CASE WHEN pace IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_pace,
                 CAST(SUM(CASE WHEN pace_gap IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_pace_gap,
                 CAST(SUM(CASE WHEN positional_gap IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_positional_gap,
                 CAST(SUM(CASE WHEN goal_time IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_goal_time,
                 CAST(SUM(CASE WHEN latitude IS NULL OR longitude IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_coordinates,
                 CAST(SUM(CASE WHEN fix_timestamp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_fix_timestamp,
                 CAST(SUM(CASE WHEN hole_number IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_hole_number,
                 CAST(SUM(CASE WHEN section_number IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_section_number,
                 CAST(SUM(CASE WHEN battery_percentage IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_battery,
                 CAST(SUM(CASE WHEN is_cache IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_is_cache,
                 CAST(SUM(CASE WHEN is_timestamp_missing = TRUE THEN 1 ELSE 0 END) AS BIGINT) AS timestamp_missing_flag,
                 CAST(SUM(CASE WHEN start_hole IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_start_hole,
                 CAST(SUM(CASE WHEN is_nine_hole IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_is_nine_hole,
                 CAST(SUM(CASE WHEN is_complete IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_is_complete
                 FROM silver WHERE is_location_padding = FALSE
                 GROUP BY course_id
               )
               SELECT course_id, total_events, total_rounds,
               ROUND(100.0e0 * null_pace / NULLIF(total_events, 0), 2) AS pct_missing_pace,
               ROUND(100.0e0 * null_pace_gap / NULLIF(total_events, 0), 2) AS pct_missing_pace_gap,
               ROUND(100.0e0 * null_goal_time / NULLIF(total_events, 0), 2) AS pct_missing_goal_time,
               ROUND(100.0e0 * null_hole_number / NULLIF(total_events, 0), 2) AS pct_missing_hole_number,
               ROUND(100.0e0 * null_battery / NULLIF(total_events, 0), 2) AS pct_missing_battery,
               ROUND(100.0e0 * null_start_hole / NULLIF(total_events, 0), 2) AS pct_missing_start_hole,
               ROUND(100.0e0 * timestamp_missing_flag / NULLIF(total_events, 0), 2) AS pct_timestamp_missing_flag,
               ROUND(100 - ((COALESCE(100.0e0 * null_pace / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_pace_gap / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_positional_gap / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_goal_time / NULLIF(total_events, 0), 0)) / 4), 1) AS score_tier_1_pace,
               ROUND(100 - ((COALESCE(100.0e0 * null_coordinates / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_fix_timestamp / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_hole_number / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_section_number / NULLIF(total_events, 0), 0)) / 4), 1) AS score_tier_2_location,
               ROUND(100 - ((COALESCE(100.0e0 * null_battery / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_is_cache / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * timestamp_missing_flag / NULLIF(total_events, 0), 0)) / 3), 1) AS score_tier_3_device,
               ROUND(100 - ((COALESCE(100.0e0 * null_start_hole / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_is_nine_hole / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_is_complete / NULLIF(total_events, 0), 0)) / 3), 1) AS score_tier_4_config,
               ROUND((
                 (100 - ((COALESCE(100.0e0 * null_pace / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_pace_gap / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_positional_gap / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_goal_time / NULLIF(total_events, 0), 0)) / 4)) +
                 (100 - ((COALESCE(100.0e0 * null_coordinates / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_fix_timestamp / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_hole_number / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_section_number / NULLIF(total_events, 0), 0)) / 4)) +
                 (100 - ((COALESCE(100.0e0 * null_battery / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_is_cache / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * timestamp_missing_flag / NULLIF(total_events, 0), 0)) / 3)) +
                 (100 - ((COALESCE(100.0e0 * null_start_hole / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_is_nine_hole / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_is_complete / NULLIF(total_events, 0), 0)) / 3))
               ) / 4, 1) AS data_quality_score,
               ROUND((
                 (100 - ((COALESCE(100.0e0 * null_pace / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_pace_gap / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_positional_gap / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_goal_time / NULLIF(total_events, 0), 0)) / 4)) +
                 (100 - ((COALESCE(100.0e0 * null_coordinates / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_fix_timestamp / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_hole_number / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_section_number / NULLIF(total_events, 0), 0)) / 4)) +
                 (100 - ((COALESCE(100.0e0 * null_battery / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_is_cache / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * timestamp_missing_flag / NULLIF(total_events, 0), 0)) / 3)) +
                 (100 - ((COALESCE(100.0e0 * null_start_hole / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_is_nine_hole / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_is_complete / NULLIF(total_events, 0), 0)) / 3))
               ) / 4, 1) AS overall_quality_score
               FROM cs ORDER BY course_id""")),

    // §2.8 critical_column_gaps — status strings + usability score (A15/A16).
    QueryDef(
      "gm_critical_gaps",
      (s, d) =>
        GoldModels.criticalColumnGaps(silverOf(s, d))
          .select(
            col("course_id"), col("total_events"), col("total_rounds"),
            col("pct_null_pace"), col("pct_null_pace_gap"),
            col("pace_data_status"), col("pct_null_hole"),
            col("location_data_status"), col("pct_null_battery"),
            col("device_health_status"), col("pct_null_start_hole"),
            col("pct_null_goal_time"), col("round_config_status"),
            col("usability_score"), col("top_recommendation"))
          .orderBy(col("course_id")),
      Some(s"""WITH ${GoldQueries.SilverSql},
               ca AS (
                 SELECT course_id, COUNT(*) AS total_events,
                 COUNT(DISTINCT round_id) AS total_rounds,
                 CAST(SUM(CASE WHEN pace IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t1_null_pace,
                 CAST(SUM(CASE WHEN pace_gap IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t1_null_pace_gap,
                 CAST(SUM(CASE WHEN hole_number IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t2_null_hole,
                 CAST(SUM(CASE WHEN fix_timestamp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t2_null_timestamp,
                 CAST(SUM(CASE WHEN battery_percentage IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t3_null_battery,
                 CAST(SUM(CASE WHEN is_projected IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t3_null_projected,
                 CAST(SUM(CASE WHEN start_hole IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t4_null_start_hole,
                 CAST(SUM(CASE WHEN goal_time IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t4_null_goal_time
                 FROM silver WHERE is_location_padding = FALSE GROUP BY course_id
               ),
               pcts AS (
                 SELECT *,
                 100.0e0 * t1_null_pace / total_events AS pct_pace,
                 100.0e0 * t1_null_pace_gap / total_events AS pct_pace_gap,
                 GREATEST(100.0e0 * t1_null_pace / total_events, 100.0e0 * t1_null_pace_gap / total_events) AS pct_pace_worst,
                 100.0e0 * t2_null_hole / total_events AS pct_hole,
                 100.0e0 * t2_null_timestamp / total_events AS pct_ts,
                 100.0e0 * t3_null_battery / total_events AS pct_battery,
                 100.0e0 * (t3_null_battery + t3_null_projected) / (2 * total_events) AS pct_device_health,
                 100.0e0 * t4_null_start_hole / total_events AS pct_start_hole,
                 100.0e0 * t4_null_goal_time / total_events AS pct_goal_time,
                 100.0e0 * (t4_null_goal_time + t4_null_start_hole) / (2 * total_events) AS pct_round_config
                 FROM ca
               )
               SELECT course_id, total_events, total_rounds,
               ROUND(pct_pace, 2) AS pct_null_pace,
               ROUND(pct_pace_gap, 2) AS pct_null_pace_gap,
               CASE WHEN pct_pace_worst > 50 THEN '🔴 CRITICAL: Pace analysis NOT possible'
                    WHEN pct_pace_worst > 20 THEN '🟠 WARNING: Pace analysis degraded'
                    WHEN pct_pace_worst > 5 THEN '🟡 MINOR: Some pace gaps'
                    ELSE '🟢 GOOD: Pace data complete' END AS pace_data_status,
               ROUND(pct_hole, 2) AS pct_null_hole,
               CASE WHEN pct_hole > 30 THEN '🔴 CRITICAL: Hole tracking broken'
                    WHEN pct_hole > 10 THEN '🟠 WARNING: Location gaps detected'
                    ELSE '🟢 GOOD: Location data complete' END AS location_data_status,
               ROUND(pct_battery, 2) AS pct_null_battery,
               CASE WHEN pct_device_health > 50 THEN '🟠 WARNING: Cannot monitor device health'
                    WHEN pct_device_health > 20 THEN '🟡 MINOR: Some battery data missing'
                    ELSE '🟢 GOOD: Device health trackable' END AS device_health_status,
               ROUND(pct_start_hole, 2) AS pct_null_start_hole,
               ROUND(pct_goal_time, 2) AS pct_null_goal_time,
               CASE WHEN pct_round_config > 80 THEN '🟠 WARNING: Goal times not set'
                    WHEN pct_round_config > 50 THEN '🟡 MINOR: Start hole unknown'
                    ELSE '🟢 GOOD: Round config available' END AS round_config_status,
               ROUND(100 - (0.40e0 * pct_pace_worst + 0.30e0 * (pct_hole + pct_ts) / 2 + 0.20e0 * pct_device_health + 0.10e0 * pct_round_config), 1) AS usability_score,
               CASE WHEN pct_pace_worst > 20 THEN 'Check pace calculation algorithm - many events missing pace values'
                    WHEN pct_hole > 20 THEN 'Review location assignment logic - many events without hole numbers'
                    WHEN pct_device_health > 50 THEN 'Enable battery reporting on devices'
                    WHEN pct_round_config > 80 THEN 'Configure goal times for this course in the system'
                    ELSE 'Data quality acceptable - monitor for changes' END AS top_recommendation
               FROM pcts ORDER BY course_id""")),

    // §2.8 dim_round (silver_normalized).
    QueryDef(
      "gm_dim_round",
      (s, d) =>
        GoldModels.dimRound(silverOf(s, d))
          .orderBy(col("course_id"), col("round_id")),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id, round_id,
               COUNT(*) AS total_rows,
               CAST(SUM(CASE WHEN is_location_padding THEN 1 ELSE 0 END) AS BIGINT) AS padding_rows,
               CAST(SUM(CASE WHEN NOT is_location_padding THEN 1 ELSE 0 END) AS BIGINT) AS non_padding_rows,
               CAST(SUM(CASE WHEN is_timestamp_missing THEN 1 ELSE 0 END) AS BIGINT) AS ts_missing_rows,
               CAST(SUM(CASE WHEN is_timestamp_missing AND NOT is_location_padding THEN 1 ELSE 0 END) AS BIGINT) AS ts_missing_non_padding_rows,
               MIN(fix_timestamp) AS first_fix_ts,
               MAX(fix_timestamp) AS last_fix_ts,
               COUNT(DISTINCT hole_number) AS holes_observed,
               COUNT(DISTINCT nine_number) AS nines_observed,
               MIN(section_number) AS min_section_number,
               MAX(section_number) AS max_section_number,
               MAX(round_start_time) AS round_start_time,
               MAX(round_end_time) AS round_end_time,
               MAX(start_hole) AS start_hole,
               MAX(start_section) AS start_section,
               MAX(end_section) AS end_section,
               BOOL_OR(COALESCE(is_nine_hole, FALSE)) AS is_nine_hole,
               BOOL_OR(COALESCE(is_complete, FALSE)) AS is_complete,
               BOOL_OR(COALESCE(is_incomplete, FALSE)) AS is_incomplete,
               BOOL_OR(COALESCE(is_secondary, FALSE)) AS is_secondary,
               BOOL_OR(COALESCE(is_auto_assigned, FALSE)) AS is_auto_assigned,
               MAX(current_nine) AS current_nine,
               MAX(goal_time) AS goal_time,
               MAX(goal_name) AS goal_name,
               MAX(goal_time_fraction) AS goal_time_fraction,
               MAX(device) AS device_id,
               MAX(first_fix) AS first_fix,
               MAX(last_fix) AS last_fix
               FROM silver
               WHERE course_id IS NOT NULL AND round_id IS NOT NULL
               GROUP BY course_id, round_id
               ORDER BY course_id, round_id""")),

    // §2.8 dim_device (silver_normalized).
    QueryDef(
      "gm_dim_device",
      (s, d) =>
        GoldModels.dimDevice(silverOf(s, d)).orderBy(col("device_id")),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT device AS device_id,
               COUNT(*) AS total_rows,
               COUNT(DISTINCT course_id) AS courses_seen,
               MIN(fix_timestamp) AS first_seen_ts,
               MAX(fix_timestamp) AS last_seen_ts,
               CAST(SUM(CASE WHEN is_timestamp_missing THEN 1 ELSE 0 END) AS BIGINT) AS ts_missing_rows,
               MIN(battery_percentage) AS min_battery_pct,
               MAX(battery_percentage) AS max_battery_pct,
               AVG(battery_percentage) AS avg_battery_pct
               FROM silver WHERE device IS NOT NULL
               GROUP BY device ORDER BY device_id""")),

    // §2.8 global_overview — single-row KPIs with exact median.
    QueryDef(
      "gm_global_overview",
      (s, d) =>
        GoldModels.globalOverview(silverOf(s, d), exactPercentiles = true),
      Some(s"""WITH ${GoldQueries.SilverSql},
               agg AS (
                 SELECT COUNT(*) AS total_rows,
                 CAST(SUM(CASE WHEN is_location_padding THEN 1 ELSE 0 END) AS BIGINT) AS padding_rows,
                 CAST(SUM(CASE WHEN NOT is_location_padding THEN 1 ELSE 0 END) AS BIGINT) AS non_padding_rows,
                 COUNT(DISTINCT course_id) AS courses,
                 COUNT(DISTINCT round_id) AS distinct_rounds_all,
                 COUNT(DISTINCT CASE WHEN NOT is_location_padding THEN round_id END) AS distinct_rounds_non_padding,
                 COUNT(DISTINCT device) AS distinct_devices,
                 CAST(SUM(CASE WHEN is_timestamp_missing THEN 1 ELSE 0 END) AS BIGINT) AS ts_missing_rows,
                 CAST(SUM(CASE WHEN is_timestamp_missing AND NOT is_location_padding THEN 1 ELSE 0 END) AS BIGINT) AS ts_missing_non_padding_rows,
                 CAST(SUM(CASE WHEN NOT is_location_padding AND is_problem THEN 1 ELSE 0 END) AS BIGINT) AS problem_rows,
                 COUNT(DISTINCT CASE WHEN NOT is_location_padding AND COALESCE(is_complete, FALSE) THEN round_id END) AS complete_rounds,
                 COUNT(DISTINCT CASE WHEN NOT is_location_padding AND COALESCE(is_nine_hole, FALSE) THEN round_id END) AS nine_hole_rounds,
                 COUNT(DISTINCT CASE WHEN NOT is_location_padding AND COALESCE(is_secondary, FALSE) THEN round_id END) AS secondary_rounds,
                 COUNT(DISTINCT CASE WHEN NOT is_location_padding AND COALESCE(is_auto_assigned, FALSE) THEN round_id END) AS auto_assigned_rounds,
                 MIN(fix_timestamp) AS first_fix_ts,
                 MAX(fix_timestamp) AS last_fix_ts,
                 AVG(CASE WHEN NOT is_location_padding THEN pace_gap END) AS avg_pace_gap_sec,
                 QUANTILE_CONT(CASE WHEN NOT is_location_padding THEN pace_gap END, 0.5) AS median_pace_gap_sec
                 FROM silver WHERE course_id IS NOT NULL
               )
               SELECT total_rows, padding_rows, non_padding_rows, courses,
               distinct_rounds_all, distinct_rounds_non_padding, distinct_devices,
               ts_missing_rows, ts_missing_non_padding_rows, problem_rows,
               ROUND(100.0e0 * problem_rows / NULLIF(non_padding_rows, 0), 2) AS pct_problem_rows_non_padding,
               complete_rounds,
               ROUND(100.0e0 * complete_rounds / NULLIF(distinct_rounds_non_padding, 0), 2) AS pct_complete_rounds,
               nine_hole_rounds,
               ROUND(100.0e0 * nine_hole_rounds / NULLIF(distinct_rounds_non_padding, 0), 2) AS pct_nine_hole_rounds,
               secondary_rounds,
               ROUND(100.0e0 * secondary_rounds / NULLIF(distinct_rounds_non_padding, 0), 2) AS pct_secondary_rounds,
               auto_assigned_rounds,
               ROUND(100.0e0 * auto_assigned_rounds / NULLIF(distinct_rounds_non_padding, 0), 2) AS pct_auto_assigned_rounds,
               ROUND(100.0e0 * padding_rows / NULLIF(total_rows, 0), 2) AS pct_padding_rows,
               ROUND(100.0e0 * ts_missing_rows / NULLIF(total_rows, 0), 2) AS pct_ts_missing_rows,
               ROUND(100.0e0 * ts_missing_non_padding_rows / NULLIF(non_padding_rows, 0), 2) AS pct_ts_missing_non_padding_rows,
               first_fix_ts, last_fix_ts, avg_pace_gap_sec, median_pace_gap_sec
               FROM agg""")),

    // §2.8 global_time_patterns — time-of-day grid with exact median.
    QueryDef(
      "gm_time_patterns",
      (s, d) =>
        GoldModels.globalTimePatterns(silverOf(s, d), exactPercentiles = true)
          .orderBy(col("course_id"), col("day_type"), col("time_bucket"), col("hour_of_day")),
      Some(s"""WITH ${GoldQueries.SilverSql},
               bucketed AS (
                 SELECT course_id, round_id, is_problem, pace_gap,
                 CASE WHEN fix_timestamp IS NULL THEN 'unknown'
                      WHEN HOUR(fix_timestamp) BETWEEN 5 AND 11 THEN 'morning'
                      WHEN HOUR(fix_timestamp) BETWEEN 12 AND 17 THEN 'afternoon'
                      WHEN HOUR(fix_timestamp) BETWEEN 18 AND 23 THEN 'evening'
                      ELSE 'night' END AS time_bucket,
                 CASE WHEN fix_timestamp IS NULL THEN 'unknown'
                      WHEN ISODOW(fix_timestamp) IN (6, 7) THEN 'weekend'
                      ELSE 'weekday' END AS day_type,
                 CASE WHEN fix_timestamp IS NULL THEN NULL
                      ELSE CAST(HOUR(fix_timestamp) AS INTEGER) END AS hour_of_day
                 FROM silver
                 WHERE course_id IS NOT NULL AND NOT is_location_padding
               )
               SELECT course_id, day_type, time_bucket, hour_of_day,
               COUNT(*) AS rows,
               COUNT(DISTINCT round_id) AS rounds,
               CAST(SUM(CASE WHEN is_problem THEN 1 ELSE 0 END) AS BIGINT) AS problem_rows,
               ROUND(100.0e0 * SUM(CASE WHEN is_problem THEN 1 ELSE 0 END) / NULLIF(COUNT(*), 0), 2) AS pct_problem_rows,
               AVG(pace_gap) AS avg_pace_gap_sec,
               QUANTILE_CONT(pace_gap, 0.5) AS median_pace_gap_sec
               FROM bucketed
               GROUP BY course_id, day_type, time_bucket, hour_of_day
               ORDER BY course_id, day_type, time_bucket, hour_of_day""")),

    // §2.8 fact_telemetry_fix VIEW — proven by rolling the renamed
    // projection up by device_id.
    QueryDef(
      "gm_telemetry_fix_view",
      (s, d) =>
        GoldModels.factTelemetryFix(silverOf(s, d))
          .groupBy(col("device_id"))
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("round_id")).as("n_rounds"),
            sum(col("pace_gap")).as("sum_pace_gap"),
            max(col("current_hole_section")).as("max_chs"))
          .orderBy(col("device_id")),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT device AS device_id, COUNT(*) AS n,
               COUNT(DISTINCT round_id) AS n_rounds,
               SUM(pace_gap) AS sum_pace_gap,
               MAX(current_hole_section) AS max_chs
               FROM silver GROUP BY device ORDER BY device_id"""))
  )
}
