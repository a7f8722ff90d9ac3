package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.immutable.ListMap

/** The gold layer as PURE SQL TEXT over the session catalog — the
  * reference's Trino/dbt role collapsed into Catalyst (SURVEY §3.2):
  * each model is one SELECT over temp views of its upstream models,
  * registered in dbt dependency order. [[GoldRunnerSqlSpec]] pins every
  * model's output multiset-identical to the DataFrame route
  * ([[GoldRunner.buildAll]]) — one semantics, two authoring surfaces.
  *
  * Dialect notes mirror GoldModels': double literals carry the `D`
  * suffix (a bare `100.0` parses as DECIMAL in SQL and would change the
  * arithmetic), weekday()+1 pins the Trino day-of-week convention, and
  * the bitmask distinct / decomposed-aggregate rewrites are expressed
  * in the SQL the same way the DataFrame route plans them.
  */
object GoldRunnerSql {

  /** The four bool_or flag columns of the per-round rollup. */
  private val flagRollup =
    """bool_or(NOT is_location_padding) AS has_non_padding,
       bool_or(NOT is_location_padding AND coalesce(is_complete, false)) AS f_complete,
       bool_or(NOT is_location_padding AND coalesce(is_nine_hole, false)) AS f_nine_hole,
       bool_or(NOT is_location_padding AND coalesce(is_secondary, false)) AS f_secondary,
       bool_or(NOT is_location_padding AND coalesce(is_auto_assigned, false)) AS f_auto_assigned"""

  private val flagCounts =
    """COUNT(1) AS distinct_rounds_all,
       SUM(CASE WHEN has_non_padding THEN 1 ELSE 0 END) AS distinct_rounds_non_padding,
       SUM(CASE WHEN f_complete THEN 1 ELSE 0 END) AS complete_rounds,
       SUM(CASE WHEN f_nine_hole THEN 1 ELSE 0 END) AS nine_hole_rounds,
       SUM(CASE WHEN f_secondary THEN 1 ELSE 0 END) AS secondary_rounds,
       SUM(CASE WHEN f_auto_assigned THEN 1 ELSE 0 END) AS auto_assigned_rounds"""

  private def bitmaskDistinct(c: String): String =
    s"""CAST(COALESCE(bit_count(bit_or(
        CASE WHEN $c IS NOT NULL THEN
          CASE WHEN $c BETWEEN 0 AND 63 THEN shiftleft(1L, CAST($c AS INT))
          ELSE CAST(raise_error(concat(
            'distinctViaBitmask: value outside [0,63] domain: ',
            CAST($c AS STRING))) AS BIGINT) END
        END)), 0) AS BIGINT)"""

  private def pct(num: String, den: String, dp: Int): String =
    s"round(100.0D * $num / nullif($den, 0), $dp)"

  /** All 20 model SQL texts, in dbt dependency order. Upstream models are
    * referenced as `gsql_<name>` temp views. */
  def modelSql(exactPercentiles: Boolean): ListMap[String, String] = {
    def median(e: String) =
      if (exactPercentiles) s"percentile($e, 0.5)"
      else s"percentile_approx($e, 0.5, 10000)"

    ListMap(
      "fact_rounds" ->
        s"""WITH base AS (SELECT * FROM gsql_silver WHERE is_location_padding = false),
            r AS (
              SELECT course_id, round_id,
                MIN(fix_timestamp) AS round_start_ts,
                MAX(fix_timestamp) AS round_end_ts,
                unix_timestamp(MAX(fix_timestamp)) - unix_timestamp(MIN(fix_timestamp)) AS duration_sec,
                COUNT(1) AS fix_count,
                SUM(CASE WHEN is_timestamp_missing THEN 1 ELSE 0 END) AS ts_missing_fix_count,
                ${bitmaskDistinct("hole_number")} AS holes_played,
                ${bitmaskDistinct("nine_number")} AS nines_played,
                MIN(section_number) AS min_section_number,
                MAX(section_number) AS max_section_number,
                MIN(CASE WHEN hole_section = 1 THEN section_number END) AS first_tee_section_number,
                MAX(start_hole) AS start_hole,
                MAX(start_section) AS start_section,
                MAX(end_section) AS end_section,
                bool_or(coalesce(is_nine_hole, false)) AS is_nine_hole,
                bool_or(coalesce(is_complete, false)) AS is_complete,
                AVG(pace) AS avg_pace_sec,
                MAX(pace) AS max_pace_sec,
                AVG(pace_gap) AS avg_pace_gap_sec,
                AVG(positional_gap) AS avg_positional_gap,
                SUM(CASE WHEN is_projected THEN 1 ELSE 0 END) AS projected_fix_count,
                SUM(CASE WHEN is_problem THEN 1 ELSE 0 END) AS problem_fix_count,
                MIN(battery_percentage) AS min_battery_pct,
                AVG(battery_percentage) AS avg_battery_pct,
                SUM(CASE WHEN battery_percentage < 20 THEN 1 ELSE 0 END) AS low_battery_fix_count,
                SUM(CASE WHEN battery_percentage < 10 THEN 1 ELSE 0 END) AS critical_battery_fix_count,
                SUM(CASE WHEN is_cache THEN 1 ELSE 0 END) AS cached_fix_count
              FROM base GROUP BY course_id, round_id)
            SELECT course_id, round_id, round_start_ts, round_end_ts, duration_sec,
              fix_count, ts_missing_fix_count, holes_played, nines_played,
              min_section_number, max_section_number, first_tee_section_number,
              start_hole, start_section, end_section, is_nine_hole, is_complete,
              avg_pace_sec, max_pace_sec, avg_pace_gap_sec, avg_positional_gap,
              projected_fix_count, problem_fix_count, min_battery_pct, avg_battery_pct,
              low_battery_fix_count, critical_battery_fix_count, cached_fix_count,
              round(CAST(duration_sec AS DOUBLE) / 60.0D, 1) AS round_duration_minutes,
              CAST(projected_fix_count AS DOUBLE) / nullif(fix_count, 0) AS projected_rate,
              CAST(problem_fix_count AS DOUBLE) / nullif(fix_count, 0) AS problem_rate,
              CAST(cached_fix_count AS DOUBLE) / nullif(fix_count, 0) AS cached_rate,
              CAST(ts_missing_fix_count AS DOUBLE) / nullif(fix_count, 0) AS ts_missing_rate,
              CASE WHEN nines_played >= 3 OR max_section_number > 54 THEN '27'
                   WHEN nines_played = 2 OR max_section_number > 27 THEN '18'
                   WHEN nines_played = 1 THEN '9'
                   ELSE 'unknown' END AS round_length,
              CAST(round_start_ts AS DATE) AS round_date,
              year(round_start_ts) AS round_year,
              month(round_start_ts) AS round_month,
              day(round_start_ts) AS round_day,
              weekday(round_start_ts) + 1 AS round_weekday
            FROM r""",

      "fact_round_hole_performance" ->
        """WITH h AS (
             SELECT course_id, round_id, hole_number, nine_number,
               MIN(fix_timestamp) AS hole_start_time,
               MAX(fix_timestamp) AS hole_end_time,
               unix_timestamp(MAX(fix_timestamp)) - unix_timestamp(MIN(fix_timestamp)) AS duration_sec,
               AVG(pace) AS avg_pace_sec,
               MAX(pace) AS max_pace_sec,
               AVG(pace_gap) AS avg_pace_gap_sec,
               bool_or(is_complete) AS round_was_completed
             FROM gsql_silver
             WHERE is_location_padding = false AND hole_number IS NOT NULL
             GROUP BY course_id, round_id, hole_number, nine_number),
           t AS (SELECT facility_id, CAST(nine_number AS INT) AS t_nine_number, unit_name
                 FROM gsql_topology)
           SELECT
             h.course_id, h.round_id, h.hole_number, h.nine_number,
             t.unit_name AS course_unit,
             h.hole_start_time, h.hole_end_time, h.duration_sec,
             h.avg_pace_sec, h.max_pace_sec, h.avg_pace_gap_sec, h.round_was_completed
           FROM h LEFT JOIN t
             ON h.course_id = t.facility_id AND h.nine_number = t.t_nine_number""",

      "pace_summary_by_round" ->
        """SELECT course_id, round_id, round_start_ts, round_end_ts, fix_count,
             avg_pace_sec AS avg_pace, avg_pace_gap_sec AS avg_pace_gap,
             avg_positional_gap
           FROM gsql_fact_rounds""",

      "signal_quality_rounds" ->
        """SELECT course_id, round_id, fix_count, projected_fix_count,
             problem_fix_count, projected_rate, problem_rate
           FROM gsql_fact_rounds""",

      "device_health_errors" ->
        """SELECT course_id, round_id, fix_timestamp, battery_percentage,
             CASE WHEN battery_percentage IS NULL THEN CAST(NULL AS STRING)
                  WHEN battery_percentage < 10 THEN 'battery_critical'
                  WHEN battery_percentage < 20 THEN 'battery_low'
                  ELSE CAST(NULL AS STRING) END AS health_flag
           FROM gsql_silver
           WHERE is_location_padding = false
             AND battery_percentage IS NOT NULL AND battery_percentage < 20""",

      "data_quality_overview" -> {
        def p(c: String) = s"coalesce(100.0D * $c / nullif(total_events, 0), 0.0D)"
        val tier1 = s"100 - (${p("null_pace")} + ${p("null_pace_gap")} + " +
          s"${p("null_positional_gap")} + ${p("null_goal_time")}) / 4"
        val tier2 = s"100 - (${p("null_coordinates")} + ${p("null_fix_timestamp")} + " +
          s"${p("null_hole_number")} + ${p("null_section_number")}) / 4"
        val tier3 = s"100 - (${p("null_battery")} + ${p("null_is_cache")} + " +
          s"${p("timestamp_missing_flag")}) / 3"
        val tier4 = s"100 - (${p("null_start_hole")} + ${p("null_is_nine_hole")} + " +
          s"${p("null_is_complete")}) / 3"
        def nulls(c: String, as: String) =
          s"SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS $as"
        s"""WITH stats AS (
             SELECT course_id,
               COUNT(1) AS total_events,
               COUNT(DISTINCT round_id) AS total_rounds,
               ${nulls("pace", "null_pace")},
               ${nulls("pace_gap", "null_pace_gap")},
               ${nulls("positional_gap", "null_positional_gap")},
               ${nulls("goal_time", "null_goal_time")},
               SUM(CASE WHEN latitude IS NULL OR longitude IS NULL THEN 1 ELSE 0 END) AS null_coordinates,
               ${nulls("fix_timestamp", "null_fix_timestamp")},
               ${nulls("hole_number", "null_hole_number")},
               ${nulls("section_number", "null_section_number")},
               ${nulls("hole_section", "null_hole_section")},
               ${nulls("nine_number", "null_nine_number")},
               ${nulls("current_nine", "null_current_nine")},
               ${nulls("battery_percentage", "null_battery")},
               ${nulls("is_cache", "null_is_cache")},
               ${nulls("is_projected", "null_is_projected")},
               ${nulls("is_problem", "null_is_problem")},
               SUM(CASE WHEN is_timestamp_missing = true THEN 1 ELSE 0 END) AS timestamp_missing_flag,
               ${nulls("start_hole", "null_start_hole")},
               ${nulls("start_section", "null_start_section")},
               ${nulls("end_section", "null_end_section")},
               ${nulls("is_nine_hole", "null_is_nine_hole")},
               ${nulls("is_complete", "null_is_complete")},
               SUM(CASE WHEN battery_percentage < 20 THEN 1 ELSE 0 END) AS low_battery_events,
               SUM(CASE WHEN is_problem = true THEN 1 ELSE 0 END) AS problem_events
             FROM gsql_silver WHERE is_location_padding = false
             GROUP BY course_id)
           SELECT course_id, total_events, total_rounds,
             ${pct("null_pace", "total_events", 2)} AS pct_missing_pace,
             ${pct("null_pace_gap", "total_events", 2)} AS pct_missing_pace_gap,
             ${pct("null_positional_gap", "total_events", 2)} AS pct_missing_positional_gap,
             ${pct("null_goal_time", "total_events", 2)} AS pct_missing_goal_time,
             ${pct("null_coordinates", "total_events", 2)} AS pct_missing_coordinates,
             ${pct("null_fix_timestamp", "total_events", 2)} AS pct_missing_fix_timestamp,
             ${pct("null_hole_number", "total_events", 2)} AS pct_missing_hole_number,
             ${pct("null_section_number", "total_events", 2)} AS pct_missing_section_number,
             ${pct("null_hole_section", "total_events", 2)} AS pct_missing_hole_section,
             ${pct("null_nine_number", "total_events", 2)} AS pct_missing_nine_number,
             ${pct("null_current_nine", "total_events", 2)} AS pct_missing_current_nine,
             ${pct("null_battery", "total_events", 2)} AS pct_missing_battery,
             ${pct("null_is_cache", "total_events", 2)} AS pct_missing_is_cache,
             ${pct("null_is_projected", "total_events", 2)} AS pct_missing_is_projected,
             ${pct("null_is_problem", "total_events", 2)} AS pct_missing_is_problem,
             ${pct("timestamp_missing_flag", "total_events", 2)} AS pct_timestamp_missing_flag,
             ${pct("null_start_hole", "total_events", 2)} AS pct_missing_start_hole,
             ${pct("null_start_section", "total_events", 2)} AS pct_missing_start_section,
             ${pct("null_end_section", "total_events", 2)} AS pct_missing_end_section,
             ${pct("null_is_nine_hole", "total_events", 2)} AS pct_missing_is_nine_hole,
             ${pct("null_is_complete", "total_events", 2)} AS pct_missing_is_complete,
             round($tier1, 1) AS score_tier_1_pace,
             round($tier2, 1) AS score_tier_2_location,
             round($tier3, 1) AS score_tier_3_device,
             round($tier4, 1) AS score_tier_4_config,
             round((($tier1) + ($tier2) + ($tier3) + ($tier4)) / 4, 1) AS data_quality_score,
             round((($tier1) + ($tier2) + ($tier3) + ($tier4)) / 4, 1) AS overall_quality_score
           FROM stats"""
      },

      "critical_column_gaps" -> {
        def p(c: String) = s"100.0D * $c / total_events"
        val pctPaceWorst = s"greatest(${p("t1_null_pace")}, ${p("t1_null_pace_gap")})"
        val pctDeviceHealth =
          "100.0D * (t3_null_battery + t3_null_projected) / (2 * total_events)"
        val pctRoundConfig =
          "100.0D * (t4_null_goal_time + t4_null_start_hole) / (2 * total_events)"
        def nulls(c: String, as: String) =
          s"SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS $as"
        s"""WITH counts AS (
             SELECT course_id,
               COUNT(1) AS total_events,
               COUNT(DISTINCT round_id) AS total_rounds,
               ${nulls("pace", "t1_null_pace")},
               ${nulls("pace_gap", "t1_null_pace_gap")},
               ${nulls("positional_gap", "t1_null_positional_gap")},
               ${nulls("hole_number", "t2_null_hole")},
               ${nulls("section_number", "t2_null_section")},
               ${nulls("latitude", "t2_null_lat")},
               ${nulls("fix_timestamp", "t2_null_timestamp")},
               ${nulls("battery_percentage", "t3_null_battery")},
               ${nulls("is_projected", "t3_null_projected")},
               ${nulls("start_hole", "t4_null_start_hole")},
               ${nulls("goal_time", "t4_null_goal_time")}
             FROM gsql_silver WHERE is_location_padding = false
             GROUP BY course_id)
           SELECT course_id, total_events, total_rounds,
             round(${p("t1_null_pace")}, 2) AS pct_null_pace,
             round(${p("t1_null_pace_gap")}, 2) AS pct_null_pace_gap,
             round(${p("t1_null_positional_gap")}, 2) AS pct_null_positional_gap,
             CASE WHEN $pctPaceWorst > 50 THEN '🔴 CRITICAL: Pace analysis NOT possible'
                  WHEN $pctPaceWorst > 20 THEN '🟠 WARNING: Pace analysis degraded'
                  WHEN $pctPaceWorst > 5 THEN '🟡 MINOR: Some pace gaps'
                  ELSE '🟢 GOOD: Pace data complete' END AS pace_data_status,
             round(${p("t2_null_hole")}, 2) AS pct_null_hole,
             round(${p("t2_null_section")}, 2) AS pct_null_section,
             round(${p("t2_null_lat")}, 2) AS pct_null_latitude,
             round(${p("t2_null_timestamp")}, 2) AS pct_null_timestamp,
             CASE WHEN ${p("t2_null_hole")} > 30 THEN '🔴 CRITICAL: Hole tracking broken'
                  WHEN ${p("t2_null_hole")} > 10 THEN '🟠 WARNING: Location gaps detected'
                  ELSE '🟢 GOOD: Location data complete' END AS location_data_status,
             round(${p("t3_null_battery")}, 2) AS pct_null_battery,
             CASE WHEN $pctDeviceHealth > 50 THEN '🟠 WARNING: Cannot monitor device health'
                  WHEN $pctDeviceHealth > 20 THEN '🟡 MINOR: Some battery data missing'
                  ELSE '🟢 GOOD: Device health trackable' END AS device_health_status,
             round(${p("t4_null_start_hole")}, 2) AS pct_null_start_hole,
             round(${p("t4_null_goal_time")}, 2) AS pct_null_goal_time,
             CASE WHEN $pctRoundConfig > 80 THEN '🟠 WARNING: Goal times not set'
                  WHEN $pctRoundConfig > 50 THEN '🟡 MINOR: Start hole unknown'
                  ELSE '🟢 GOOD: Round config available' END AS round_config_status,
             round(100 - (
               0.40D * $pctPaceWorst +
               0.30D * (${p("t2_null_hole")} + ${p("t2_null_timestamp")}) / 2 +
               0.20D * $pctDeviceHealth +
               0.10D * $pctRoundConfig), 1) AS usability_score,
             CASE WHEN $pctPaceWorst > 20
                    THEN 'Check pace calculation algorithm - many events missing pace values'
                  WHEN ${p("t2_null_hole")} > 20
                    THEN 'Review location assignment logic - many events without hole numbers'
                  WHEN $pctDeviceHealth > 50 THEN 'Enable battery reporting on devices'
                  WHEN $pctRoundConfig > 80
                    THEN 'Configure goal times for this course in the system'
                  ELSE 'Data quality acceptable - monitor for changes'
                  END AS top_recommendation
           FROM counts"""
      },

      "course_configuration_analysis" ->
        s"""WITH summary AS (
             SELECT course_id,
               COUNT(DISTINCT round_id) AS total_rounds,
               MAX(max_section_number) AS max_section_seen,
               MAX(holes_played) AS max_holes_in_round,
               MAX(nines_played) AS max_nines_in_round,
               SUM(CASE WHEN is_nine_hole = true THEN 1 ELSE 0 END) AS nine_hole_rounds,
               SUM(CASE WHEN is_nine_hole = false OR is_nine_hole IS NULL THEN 1 ELSE 0 END) AS full_rounds,
               SUM(CASE WHEN is_complete = true THEN 1 ELSE 0 END) AS complete_rounds,
               SUM(CASE WHEN is_complete = false THEN 1 ELSE 0 END) AS incomplete_rounds,
               COUNT(DISTINCT start_hole) AS unique_start_holes,
               SUM(CASE WHEN start_hole = 1 THEN 1 ELSE 0 END) AS rounds_starting_hole_1,
               SUM(CASE WHEN start_hole != 1 AND start_hole IS NOT NULL THEN 1 ELSE 0 END) AS shotgun_start_rounds,
               SUM(CASE WHEN nines_played = 1 THEN 1 ELSE 0 END) AS single_nine_rounds,
               SUM(CASE WHEN nines_played = 2 THEN 1 ELSE 0 END) AS two_nine_rounds,
               SUM(CASE WHEN nines_played >= 3 THEN 1 ELSE 0 END) AS three_nine_rounds,
               round(AVG(fix_count), 0) AS avg_locations_per_round,
               MIN(fix_count) AS min_locations_per_round,
               MAX(fix_count) AS max_locations_per_round
             FROM gsql_fact_rounds GROUP BY course_id),
           typed AS (
             SELECT *,
               CASE WHEN max_section_seen > 54 THEN '27-hole'
                    WHEN max_section_seen > 27 THEN '18-hole'
                    ELSE '9-hole' END AS likely_course_type
             FROM summary)
           SELECT course_id, total_rounds, likely_course_type, max_section_seen,
             max_holes_in_round,
             ${pct("complete_rounds", "total_rounds", 1)} AS pct_complete,
             ${pct("incomplete_rounds", "total_rounds", 1)} AS pct_incomplete,
             ${pct("nine_hole_rounds", "total_rounds", 1)} AS pct_nine_hole,
             ${pct("full_rounds", "total_rounds", 1)} AS pct_full_rounds,
             unique_start_holes,
             ${pct("shotgun_start_rounds", "total_rounds", 1)} AS pct_shotgun_starts,
             CASE WHEN likely_course_type = '27-hole'
               THEN ${pct("single_nine_rounds", "total_rounds", 1)} END AS pct_single_nine,
             CASE WHEN likely_course_type = '27-hole'
               THEN ${pct("two_nine_rounds", "total_rounds", 1)} END AS pct_two_nines,
             CASE WHEN likely_course_type = '27-hole'
               THEN ${pct("three_nine_rounds", "total_rounds", 1)} END AS pct_all_three_nines,
             avg_locations_per_round, min_locations_per_round, max_locations_per_round,
             round(
               unique_start_holes * 10 +
               CASE WHEN likely_course_type = '27-hole' THEN 30
                    WHEN likely_course_type = '18-hole' THEN 20
                    ELSE 10 END +
               CASE WHEN 100.0D * nine_hole_rounds / nullif(total_rounds, 0) > 20
                    THEN 10 ELSE 0 END +
               CASE WHEN 100.0D * incomplete_rounds / nullif(total_rounds, 0) > 10
                    THEN 5 ELSE 0 END,
               0) AS course_complexity_score
           FROM typed""",

      "course_rounds_by_month" ->
        """WITH keyed AS (
             SELECT course_id, round_id,
               CASE WHEN round_start_ts IS NULL
                 THEN CAST(CAST('1900-01-01' AS DATE) AS TIMESTAMP)
                 ELSE date_trunc('month', round_start_ts) END AS month_start,
               CASE WHEN round_start_ts IS NULL THEN 0
                 ELSE month(round_start_ts) END AS month_number,
               CASE WHEN round_start_ts IS NULL THEN 'Unknown (missing timestamp)'
                 ELSE date_format(round_start_ts, 'MMMM') END AS month_name
             FROM gsql_fact_rounds),
           monthly AS (
             SELECT course_id, month_start, month_number, month_name,
               COUNT(DISTINCT round_id) AS rounds
             FROM keyed GROUP BY course_id, month_start, month_number, month_name),
           totals AS (
             SELECT course_id AS t_course_id, SUM(rounds) AS total_rounds
             FROM monthly GROUP BY course_id)
           SELECT m.course_id, m.month_start, m.month_number, m.month_name, m.rounds,
             round(CAST(m.rounds AS DOUBLE) / t.total_rounds * 100, 2) AS pct_total
           FROM monthly m JOIN totals t ON m.course_id = t.t_course_id""",

      "course_rounds_by_weekday" ->
        """SELECT course_id,
             CASE WHEN round_start_ts IS NULL THEN 0
               ELSE weekday(round_start_ts) + 1 END AS weekday_number,
             CASE WHEN round_start_ts IS NULL THEN 'Unknown (missing timestamp)'
               ELSE date_format(round_start_ts, 'EEEE') END AS weekday_name,
             COUNT(1) AS rounds
           FROM gsql_fact_rounds
           GROUP BY course_id,
             CASE WHEN round_start_ts IS NULL THEN 0
               ELSE weekday(round_start_ts) + 1 END,
             CASE WHEN round_start_ts IS NULL THEN 'Unknown (missing timestamp)'
               ELSE date_format(round_start_ts, 'EEEE') END""",

      "course_start_hole_distribution" ->
        s"""WITH startStats AS (
             SELECT course_id, start_hole,
               COUNT(1) AS rounds_with_this_start,
               SUM(CASE WHEN is_complete THEN 1 ELSE 0 END) AS complete_rounds_with_this_start,
               MIN(min_section_number) AS min_min_section_number,
               MAX(min_section_number) AS max_min_section_number,
               MIN(start_section) AS min_start_section,
               MAX(start_section) AS max_start_section,
               MIN(first_tee_section_number) AS min_first_tee_section_number,
               MAX(first_tee_section_number) AS max_first_tee_section_number
             FROM gsql_fact_rounds WHERE start_hole IS NOT NULL
             GROUP BY course_id, start_hole),
           totals AS (
             SELECT course_id AS t_course_id,
               SUM(rounds_with_this_start) AS total_rounds,
               SUM(complete_rounds_with_this_start) AS total_complete_rounds,
               COUNT(DISTINCT start_hole) AS distinct_start_holes
             FROM startStats GROUP BY course_id)
           SELECT s.course_id, s.start_hole,
             s.rounds_with_this_start, s.complete_rounds_with_this_start,
             t.total_rounds, t.total_complete_rounds, t.distinct_start_holes,
             ${pct("s.rounds_with_this_start", "t.total_rounds", 2)}
               AS pct_rounds_with_this_start,
             ${pct("s.complete_rounds_with_this_start", "t.total_complete_rounds", 2)}
               AS pct_complete_rounds_with_this_start,
             s.min_min_section_number, s.max_min_section_number,
             s.min_start_section, s.max_start_section,
             s.min_first_tee_section_number, s.max_first_tee_section_number
           FROM startStats s JOIN totals t ON s.course_id = t.t_course_id""",

      "telemetry_completeness_summary" ->
        s"""WITH agg AS (
             SELECT course_id,
               COUNT(1) AS total_rows,
               SUM(CASE WHEN is_location_padding THEN 1 ELSE 0 END) AS padding_rows,
               SUM(CASE WHEN NOT is_location_padding THEN 1 ELSE 0 END) AS non_padding_rows,
               SUM(CASE WHEN is_timestamp_missing THEN 1 ELSE 0 END) AS ts_missing_rows,
               SUM(CASE WHEN is_timestamp_missing AND NOT is_location_padding THEN 1 ELSE 0 END)
                 AS ts_missing_non_padding_rows
             FROM gsql_silver GROUP BY course_id)
           SELECT course_id, total_rows, padding_rows, non_padding_rows,
             ts_missing_rows, ts_missing_non_padding_rows,
             ${pct("padding_rows", "total_rows", 2)} AS pct_padding_total,
             ${pct("ts_missing_rows", "total_rows", 2)} AS pct_ts_missing_total,
             ${pct("ts_missing_non_padding_rows", "non_padding_rows", 2)}
               AS pct_ts_missing_non_padding
           FROM agg""",

      "dim_course" ->
        """WITH baseCourses AS (
             SELECT DISTINCT course_id FROM gsql_silver WHERE course_id IS NOT NULL),
           roundRange AS (
             SELECT course_id AS r_course_id,
               COUNT(1) AS rounds_observed,
               SUM(CASE WHEN is_complete THEN 1 ELSE 0 END) AS complete_rounds_observed,
               MIN(round_start_ts) AS first_round_start_ts,
               MAX(round_start_ts) AS last_round_start_ts,
               array_sort(collect_set(round_length)) AS playable_round_lengths
             FROM gsql_fact_rounds GROUP BY course_id),
           units AS (
             SELECT facility_id AS u_course_id,
               array_sort(collect_set(unit_name)) AS unit_names
             FROM gsql_topology GROUP BY facility_id)
           SELECT
             b.course_id,
             c.likely_course_type, c.max_section_seen, c.max_holes_in_round,
             c.unique_start_holes, c.pct_shotgun_starts, c.pct_nine_hole,
             c.pct_full_rounds, c.course_complexity_score,
             r.rounds_observed, r.complete_rounds_observed,
             r.first_round_start_ts, r.last_round_start_ts,
             r.playable_round_lengths,
             d.data_quality_score, d.overall_quality_score,
             d.pct_missing_pace, d.pct_missing_pace_gap,
             d.pct_missing_hole_number, d.pct_missing_section_number,
             d.pct_missing_fix_timestamp, d.pct_missing_start_hole,
             t.total_rows, t.padding_rows, t.non_padding_rows,
             t.pct_padding_total, t.pct_ts_missing_total,
             t.pct_ts_missing_non_padding,
             u.unit_names,
             CASE WHEN u.unit_names IS NULL THEN 0 ELSE size(u.unit_names) END AS unit_count
           FROM baseCourses b
           LEFT JOIN gsql_course_configuration_analysis c ON b.course_id = c.course_id
           LEFT JOIN gsql_data_quality_overview d ON b.course_id = d.course_id
           LEFT JOIN gsql_telemetry_completeness_summary t ON b.course_id = t.course_id
           LEFT JOIN roundRange r ON b.course_id = r.r_course_id
           LEFT JOIN units u ON b.course_id = u.u_course_id""",

      "gold_coverage_audit" ->
        """WITH courses AS (
             SELECT DISTINCT course_id FROM gsql_silver WHERE course_id IS NOT NULL),
           rowCounts AS (
             SELECT course_id AS s_course_id,
               COUNT(1) AS silver_total_rows,
               SUM(CASE WHEN is_location_padding THEN 1 ELSE 0 END) AS silver_padding_rows,
               SUM(CASE WHEN NOT is_location_padding THEN 1 ELSE 0 END) AS silver_non_padding_rows,
               SUM(CASE WHEN is_timestamp_missing THEN 1 ELSE 0 END) AS silver_ts_missing_rows,
               SUM(CASE WHEN is_timestamp_missing AND NOT is_location_padding THEN 1 ELSE 0 END)
                 AS silver_ts_missing_non_padding_rows
             FROM gsql_silver WHERE course_id IS NOT NULL GROUP BY course_id),
           roundCounts AS (
             SELECT course_id AS rc_course_id,
               COUNT(1) AS silver_distinct_rounds_all,
               CAST(SUM(has_np) AS BIGINT) AS silver_distinct_rounds_non_padding
             FROM (
               SELECT course_id, round_id,
                 MAX(CASE WHEN NOT is_location_padding THEN 1 ELSE 0 END) AS has_np
               FROM gsql_silver
               WHERE course_id IS NOT NULL AND round_id IS NOT NULL
               GROUP BY course_id, round_id)
             GROUP BY course_id),
           silverCounts AS (
             SELECT s_course_id,
               silver_total_rows, silver_padding_rows, silver_non_padding_rows,
               silver_ts_missing_rows, silver_ts_missing_non_padding_rows,
               coalesce(silver_distinct_rounds_all, 0L) AS silver_distinct_rounds_all,
               coalesce(silver_distinct_rounds_non_padding, 0L)
                 AS silver_distinct_rounds_non_padding
             FROM rowCounts LEFT JOIN roundCounts ON s_course_id = rc_course_id),
           fr AS (
             SELECT course_id AS f_course_id,
               COUNT(1) AS gold_fact_rounds_rows,
               COUNT(DISTINCT round_id) AS gold_fact_rounds_distinct_rounds,
               SUM(fix_count) AS gold_fact_rounds_sum_fix_count
             FROM gsql_fact_rounds GROUP BY course_id),
           hp AS (
             SELECT course_id AS h_course_id,
               COUNT(1) AS gold_hole_perf_rows,
               COUNT(DISTINCT round_id) AS gold_hole_perf_distinct_rounds,
               COUNT(DISTINCT concat_ws(':', round_id, hole_number, nine_number))
                 AS gold_hole_perf_distinct_round_hole_nine
             FROM gsql_fact_round_hole_performance GROUP BY course_id),
           sm AS (
             SELECT course_id AS m_course_id,
               SUM(rounds) AS gold_rounds_by_month_sum_rounds,
               SUM(CASE WHEN month_number = 0 THEN rounds ELSE 0 END)
                 AS gold_rounds_by_month_unknown_ts_rounds
             FROM gsql_course_rounds_by_month GROUP BY course_id),
           sw AS (
             SELECT course_id AS w_course_id,
               SUM(rounds) AS gold_rounds_by_weekday_sum_rounds,
               SUM(CASE WHEN weekday_number = 0 THEN rounds ELSE 0 END)
                 AS gold_rounds_by_weekday_unknown_ts_rounds
             FROM gsql_course_rounds_by_weekday GROUP BY course_id),
           dc AS (
             SELECT course_id AS d_course_id, 1 AS gold_dim_course_present, unit_count
             FROM gsql_dim_course)
           SELECT c.course_id,
             silver_total_rows, silver_padding_rows, silver_non_padding_rows,
             silver_ts_missing_rows, silver_ts_missing_non_padding_rows,
             silver_distinct_rounds_all, silver_distinct_rounds_non_padding,
             gold_fact_rounds_rows, gold_fact_rounds_distinct_rounds,
             gold_fact_rounds_sum_fix_count,
             gold_hole_perf_rows, gold_hole_perf_distinct_rounds,
             gold_hole_perf_distinct_round_hole_nine,
             gold_rounds_by_month_sum_rounds, gold_rounds_by_month_unknown_ts_rounds,
             gold_rounds_by_weekday_sum_rounds, gold_rounds_by_weekday_unknown_ts_rounds,
             gold_dim_course_present, unit_count
           FROM courses c
           LEFT JOIN silverCounts ON c.course_id = s_course_id
           LEFT JOIN fr ON c.course_id = f_course_id
           LEFT JOIN hp ON c.course_id = h_course_id
           LEFT JOIN sm ON c.course_id = m_course_id
           LEFT JOIN sw ON c.course_id = w_course_id
           LEFT JOIN dc ON c.course_id = d_course_id""",

      "fact_telemetry_fix" ->
        """SELECT course_id, round_id, location_index, fix_timestamp,
             is_timestamp_missing, is_location_padding,
             hole_number, section_number, hole_section, nine_number,
             pace, pace_gap, positional_gap,
             latitude, longitude, geometry_wkt,
             battery_percentage, is_cache, is_projected, is_problem,
             ingest_date, event_date, round_start_time, round_end_time,
             start_hole, start_section, end_section,
             is_nine_hole, current_nine, goal_time, is_complete,
             device AS device_id, first_fix, last_fix,
             goal_name, goal_time_fraction,
             is_incomplete, is_secondary, is_auto_assigned,
             last_section_start, current_section, current_hole,
             current_hole_section
           FROM gsql_silver""",

      "dim_round" ->
        s"""WITH base AS (
             SELECT * FROM gsql_silver
             WHERE course_id IS NOT NULL AND round_id IS NOT NULL),
           numeric AS (
             SELECT course_id, round_id,
               COUNT(1) AS total_rows,
               SUM(CASE WHEN is_location_padding THEN 1 ELSE 0 END) AS padding_rows,
               SUM(CASE WHEN NOT is_location_padding THEN 1 ELSE 0 END) AS non_padding_rows,
               SUM(CASE WHEN is_timestamp_missing THEN 1 ELSE 0 END) AS ts_missing_rows,
               SUM(CASE WHEN is_timestamp_missing AND NOT is_location_padding THEN 1 ELSE 0 END)
                 AS ts_missing_non_padding_rows,
               MIN(fix_timestamp) AS first_fix_ts,
               MAX(fix_timestamp) AS last_fix_ts,
               ${bitmaskDistinct("hole_number")} AS holes_observed,
               ${bitmaskDistinct("nine_number")} AS nines_observed,
               MIN(section_number) AS min_section_number,
               MAX(section_number) AS max_section_number,
               MAX(round_start_time) AS round_start_time,
               MAX(round_end_time) AS round_end_time,
               MAX(start_hole) AS start_hole,
               MAX(start_section) AS start_section,
               MAX(end_section) AS end_section,
               bool_or(coalesce(is_nine_hole, false)) AS is_nine_hole,
               bool_or(coalesce(is_complete, false)) AS is_complete,
               bool_or(coalesce(is_incomplete, false)) AS is_incomplete,
               bool_or(coalesce(is_secondary, false)) AS is_secondary,
               bool_or(coalesce(is_auto_assigned, false)) AS is_auto_assigned,
               MAX(current_nine) AS current_nine,
               MAX(goal_time) AS goal_time,
               MAX(goal_time_fraction) AS goal_time_fraction
             FROM base GROUP BY course_id, round_id),
           strings AS (
             SELECT course_id, round_id,
               MAX(goal_name) AS goal_name,
               MAX(device) AS device_id,
               MAX(first_fix) AS first_fix,
               MAX(last_fix) AS last_fix
             FROM base GROUP BY course_id, round_id)
           SELECT course_id, round_id, total_rows, padding_rows,
             non_padding_rows, ts_missing_rows, ts_missing_non_padding_rows,
             first_fix_ts, last_fix_ts, holes_observed, nines_observed,
             min_section_number, max_section_number,
             round_start_time, round_end_time,
             start_hole, start_section, end_section,
             is_nine_hole, is_complete, is_incomplete,
             is_secondary, is_auto_assigned,
             current_nine, goal_time, goal_name,
             goal_time_fraction, device_id, first_fix, last_fix
           FROM numeric JOIN strings USING (course_id, round_id)""",

      "dim_device" ->
        """SELECT device AS device_id,
             COUNT(1) AS total_rows,
             COUNT(DISTINCT course_id) AS courses_seen,
             MIN(fix_timestamp) AS first_seen_ts,
             MAX(fix_timestamp) AS last_seen_ts,
             SUM(CASE WHEN is_timestamp_missing THEN 1 ELSE 0 END) AS ts_missing_rows,
             MIN(battery_percentage) AS min_battery_pct,
             MAX(battery_percentage) AS max_battery_pct,
             AVG(battery_percentage) AS avg_battery_pct
           FROM gsql_silver WHERE device IS NOT NULL
           GROUP BY device""",

      "global_overview" ->
        s"""WITH baseStats AS (
             -- decomposed (see globalOverview in GoldModels): distincts
             -- and the percentile each run in their own aggregate over a
             -- one-column slice; single-row frames cross-join for free
             SELECT
               COUNT(1) AS total_rows,
               SUM(CASE WHEN is_location_padding THEN 1 ELSE 0 END) AS padding_rows,
               SUM(CASE WHEN NOT is_location_padding THEN 1 ELSE 0 END) AS non_padding_rows,
               SUM(CASE WHEN is_timestamp_missing THEN 1 ELSE 0 END) AS ts_missing_rows,
               SUM(CASE WHEN is_timestamp_missing AND NOT is_location_padding THEN 1 ELSE 0 END)
                 AS ts_missing_non_padding_rows,
               SUM(CASE WHEN NOT is_location_padding AND is_problem THEN 1 ELSE 0 END)
                 AS problem_rows,
               MIN(fix_timestamp) AS first_fix_ts,
               MAX(fix_timestamp) AS last_fix_ts,
               AVG(CASE WHEN NOT is_location_padding THEN pace_gap END) AS avg_pace_gap_sec
             FROM gsql_silver WHERE course_id IS NOT NULL),
           courseStats AS (
             SELECT COUNT(DISTINCT course_id) AS courses
             FROM gsql_silver WHERE course_id IS NOT NULL),
           devStats AS (
             SELECT COUNT(DISTINCT device) AS distinct_devices
             FROM gsql_silver WHERE course_id IS NOT NULL),
           medStats AS (
             SELECT ${median("pg")} AS median_pace_gap_sec
             FROM (SELECT CASE WHEN NOT is_location_padding THEN pace_gap END AS pg
                   FROM gsql_silver WHERE course_id IS NOT NULL)),
           rowStats AS (
             SELECT * FROM baseStats
             CROSS JOIN courseStats CROSS JOIN devStats CROSS JOIN medStats),
           flags AS (
             SELECT round_id, $flagRollup
             FROM gsql_silver
             WHERE course_id IS NOT NULL AND round_id IS NOT NULL
             GROUP BY round_id),
           counts AS (SELECT $flagCounts FROM flags)
           SELECT total_rows, padding_rows, non_padding_rows,
             courses, distinct_rounds_all, distinct_rounds_non_padding,
             distinct_devices, ts_missing_rows, ts_missing_non_padding_rows,
             problem_rows,
             ${pct("problem_rows", "non_padding_rows", 2)} AS pct_problem_rows_non_padding,
             complete_rounds,
             ${pct("complete_rounds", "distinct_rounds_non_padding", 2)} AS pct_complete_rounds,
             nine_hole_rounds,
             ${pct("nine_hole_rounds", "distinct_rounds_non_padding", 2)} AS pct_nine_hole_rounds,
             secondary_rounds,
             ${pct("secondary_rounds", "distinct_rounds_non_padding", 2)} AS pct_secondary_rounds,
             auto_assigned_rounds,
             ${pct("auto_assigned_rounds", "distinct_rounds_non_padding", 2)}
               AS pct_auto_assigned_rounds,
             ${pct("padding_rows", "total_rows", 2)} AS pct_padding_rows,
             ${pct("ts_missing_rows", "total_rows", 2)} AS pct_ts_missing_rows,
             ${pct("ts_missing_non_padding_rows", "non_padding_rows", 2)}
               AS pct_ts_missing_non_padding_rows,
             first_fix_ts, last_fix_ts,
             avg_pace_gap_sec, median_pace_gap_sec
           FROM rowStats CROSS JOIN counts""",

      "global_course_summary" ->
        s"""WITH perDevice AS (
             -- two-level rewrite (mirrors GoldModels.globalCourseSummary):
             -- partial counters by (course_id, device) in one codegen
             -- scan; the rollup's non-null group count IS the distinct
             -- device count — no Expand; the percentile runs over its
             -- own two-column slice and joins back on course_id
             SELECT course_id, device,
               COUNT(1) AS rows_,
               SUM(CASE WHEN is_location_padding THEN 1 ELSE 0 END) AS pad_,
               SUM(CASE WHEN NOT is_location_padding THEN 1 ELSE 0 END) AS npad_,
               SUM(CASE WHEN is_timestamp_missing THEN 1 ELSE 0 END) AS tsm_,
               SUM(CASE WHEN is_timestamp_missing AND NOT is_location_padding THEN 1 ELSE 0 END)
                 AS tsmn_,
               SUM(CASE WHEN NOT is_location_padding AND is_problem THEN 1 ELSE 0 END)
                 AS prob_,
               SUM(CASE WHEN NOT is_location_padding THEN pace_gap END) AS pg_sum_,
               COUNT(CASE WHEN NOT is_location_padding THEN pace_gap END) AS pg_n_
             FROM gsql_silver WHERE course_id IS NOT NULL
             GROUP BY course_id, device),
           baseStats AS (
             SELECT course_id,
               SUM(rows_) AS total_rows,
               SUM(pad_) AS padding_rows,
               SUM(npad_) AS non_padding_rows,
               COUNT(CASE WHEN device IS NOT NULL THEN 1 END) AS distinct_devices,
               SUM(tsm_) AS ts_missing_rows,
               SUM(tsmn_) AS ts_missing_non_padding_rows,
               SUM(prob_) AS problem_rows,
               SUM(pg_sum_) / SUM(pg_n_) AS avg_pace_gap_sec
             FROM perDevice GROUP BY course_id),
           medStats AS (
             SELECT course_id, ${median("pg")} AS median_pace_gap_sec
             FROM (SELECT course_id,
                     CASE WHEN NOT is_location_padding THEN pace_gap END AS pg
                   FROM gsql_silver WHERE course_id IS NOT NULL)
             GROUP BY course_id),
           rowStats AS (
             SELECT b.course_id, b.total_rows, b.padding_rows,
               b.non_padding_rows, b.distinct_devices, b.ts_missing_rows,
               b.ts_missing_non_padding_rows, b.problem_rows,
               b.avg_pace_gap_sec, m.median_pace_gap_sec
             FROM baseStats b
             JOIN medStats m USING (course_id)),
           flags AS (
             SELECT course_id, round_id, $flagRollup
             FROM gsql_silver
             WHERE course_id IS NOT NULL AND round_id IS NOT NULL
             GROUP BY course_id, round_id),
           counts AS (
             SELECT course_id AS r_course_id, $flagCounts
             FROM flags GROUP BY course_id)
           SELECT r.course_id, r.total_rows, r.padding_rows, r.non_padding_rows,
             r.distinct_devices, r.ts_missing_rows, r.ts_missing_non_padding_rows,
             r.problem_rows, r.avg_pace_gap_sec, r.median_pace_gap_sec,
             coalesce(distinct_rounds_all, 0L) AS distinct_rounds_all,
             coalesce(distinct_rounds_non_padding, 0L) AS distinct_rounds_non_padding,
             coalesce(complete_rounds, 0L) AS complete_rounds,
             coalesce(nine_hole_rounds, 0L) AS nine_hole_rounds,
             coalesce(secondary_rounds, 0L) AS secondary_rounds,
             coalesce(auto_assigned_rounds, 0L) AS auto_assigned_rounds,
             ${pct("r.problem_rows", "r.non_padding_rows", 2)} AS pct_problem_rows_non_padding,
             ${pct("coalesce(complete_rounds, 0L)", "coalesce(distinct_rounds_non_padding, 0L)", 2)}
               AS pct_complete_rounds,
             ${pct("coalesce(nine_hole_rounds, 0L)", "coalesce(distinct_rounds_non_padding, 0L)", 2)}
               AS pct_nine_hole_rounds,
             ${pct("coalesce(secondary_rounds, 0L)", "coalesce(distinct_rounds_non_padding, 0L)", 2)}
               AS pct_secondary_rounds,
             ${pct("coalesce(auto_assigned_rounds, 0L)", "coalesce(distinct_rounds_non_padding, 0L)", 2)}
               AS pct_auto_assigned_rounds,
             ${pct("r.padding_rows", "r.total_rows", 2)} AS pct_padding_rows,
             ${pct("r.ts_missing_rows", "r.total_rows", 2)} AS pct_ts_missing_rows,
             ${pct("r.ts_missing_non_padding_rows", "r.non_padding_rows", 2)}
               AS pct_ts_missing_non_padding_rows
           FROM rowStats r LEFT JOIN counts ON r.course_id = r_course_id""",

      "global_time_patterns" ->
        s"""WITH enriched AS (
             SELECT *,
               CASE WHEN fix_timestamp IS NULL THEN 'unknown'
                    WHEN hour(fix_timestamp) BETWEEN 5 AND 11 THEN 'morning'
                    WHEN hour(fix_timestamp) BETWEEN 12 AND 17 THEN 'afternoon'
                    WHEN hour(fix_timestamp) BETWEEN 18 AND 23 THEN 'evening'
                    ELSE 'night' END AS time_bucket,
               CASE WHEN fix_timestamp IS NULL THEN 'unknown'
                    WHEN weekday(fix_timestamp) + 1 IN (6, 7) THEN 'weekend'
                    ELSE 'weekday' END AS day_type,
               CASE WHEN fix_timestamp IS NULL THEN -1
                    ELSE hour(fix_timestamp) END AS hk
             FROM gsql_silver
             WHERE course_id IS NOT NULL AND NOT is_location_padding),
           base AS (
             SELECT course_id, day_type, time_bucket, hk,
               COUNT(1) AS `rows`,
               SUM(CASE WHEN is_problem THEN 1 ELSE 0 END) AS problem_rows,
               ${pct("SUM(CASE WHEN is_problem THEN 1 ELSE 0 END)", "COUNT(1)", 2)}
                 AS pct_problem_rows,
               AVG(pace_gap) AS avg_pace_gap_sec
             FROM enriched GROUP BY course_id, day_type, time_bucket, hk),
           rounds AS (
             SELECT course_id, day_type, time_bucket, hk, COUNT(1) AS rounds
             FROM (SELECT DISTINCT course_id, day_type, time_bucket, hk, round_id
                   FROM enriched WHERE round_id IS NOT NULL)
             GROUP BY course_id, day_type, time_bucket, hk),
           med AS (
             SELECT course_id, day_type, time_bucket, hk,
               ${median("pace_gap")} AS median_pace_gap_sec
             FROM enriched GROUP BY course_id, day_type, time_bucket, hk)
           SELECT course_id, day_type, time_bucket,
             CASE WHEN hk = -1 THEN CAST(NULL AS INT) ELSE hk END AS hour_of_day,
             `rows`, coalesce(rounds, 0L) AS rounds,
             problem_rows, pct_problem_rows,
             avg_pace_gap_sec, median_pace_gap_sec
           FROM base
           LEFT JOIN rounds USING (course_id, day_type, time_bucket, hk)
           JOIN med USING (course_id, day_type, time_bucket, hk)""")
  }

  /** Build all 20 models via `spark.sql`: registers `gsql_silver` /
    * `gsql_topology`, then each model as `gsql_<name>` in dbt dependency
    * order so downstream SQL reads upstream views from the catalog. */
  def buildAll(
      spark: SparkSession,
      silver: DataFrame,
      topology: DataFrame,
      exactPercentiles: Boolean = false): ListMap[String, DataFrame] = {
    silver.createOrReplaceTempView("gsql_silver")
    topology.createOrReplaceTempView("gsql_topology")
    modelSql(exactPercentiles).map { case (name, sql) =>
      // SQL-defined views (not DataFrame-registered plans): each
      // reference re-resolves the view text with fresh expression ids,
      // exactly like dbt/Trino views — and it sidesteps analyzer
      // relation-dedup on deeply self-referential view stacks
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gsql_$name AS $sql")
      name -> spark.table(s"gsql_$name")
    }
  }
}
