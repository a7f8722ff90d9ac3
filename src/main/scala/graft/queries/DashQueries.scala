package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.DashboardQueries2

/** Dashboard-surface parity gate (SURVEY §3.3, queries.py part 2): the
  * REAL `DashboardQueries2` library code over the synthetic silver
  * mapping, with DuckDB oracles reproducing the reference SQL. Numeric
  * discipline: every silver double is integer-valued, so averages and
  * window ratios are exact under any accumulation order.
  */
object DashQueries {

  /** Synthetic silver + a deterministic round_duration_minutes (the
    * synthetic mapping has no duration column): 240 + 5×section for
    * rounds with a goal_time, NULL otherwise — spans the valid/invalid
    * buckets of the reference's validation CASE. */
  private def durSilver(s: SparkSession, d: String): DataFrame =
    GoldQueries.silverView(s, d)
      .withColumn("round_duration_minutes",
        col("goal_time") / 60.0 + col("current_section") * 5)

  private val DurSql: String =
    """dur AS (
      SELECT *, goal_time / 60.0 + current_section * 5 AS round_duration_minutes
      FROM silver
    )"""

  val defs: Seq[QueryDef] = Seq(

    // ROUND_VALIDATION_SUMMARY (queries.py:820-880): per-course validity
    // rollup of the duration/events/pace CASE ladders.
    QueryDef(
      "d1_round_validation_summary",
      (s, d) =>
        DashboardQueries2.roundValidationSummary(durSilver(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}, $DurSql,
               rs AS (
                 SELECT course_id, round_id,
                 MAX(round_duration_minutes) AS rdm,
                 MAX(CAST(is_nine_hole AS INTEGER)) = 1 AS nine,
                 CAST(SUM(CASE WHEN is_location_padding = FALSE THEN 1 ELSE 0 END) AS BIGINT) AS real_events,
                 CAST(SUM(CASE WHEN pace IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS events_with_pace
                 FROM dur GROUP BY course_id, round_id
               ),
               v AS (
                 SELECT course_id,
                 CASE WHEN rdm IS NULL THEN 0
                      WHEN nine AND rdm BETWEEN 45 AND 200 THEN 1
                      WHEN NOT nine AND rdm BETWEEN 90 AND 400 THEN 1
                      ELSE 0 END AS duration_valid,
                 CASE WHEN real_events < 10 THEN 0
                      WHEN nine AND real_events >= 9 THEN 1
                      WHEN NOT nine AND real_events >= 18 THEN 1
                      ELSE 0 END AS events_valid,
                 CASE WHEN events_with_pace = 0 THEN 0
                      WHEN CAST(events_with_pace AS DOUBLE) / NULLIF(real_events, 0) >= 0.5 THEN 1
                      ELSE 0 END AS pace_valid
                 FROM rs
               )
               SELECT course_id, COUNT(*) AS total_rounds,
               CAST(SUM(duration_valid) AS BIGINT) AS rounds_duration_valid,
               CAST(SUM(events_valid) AS BIGINT) AS rounds_events_valid,
               CAST(SUM(pace_valid) AS BIGINT) AS rounds_pace_valid,
               ROUND(100.0e0 * SUM(duration_valid) / COUNT(*), 1) AS pct_duration_valid,
               ROUND(100.0e0 * SUM(events_valid) / COUNT(*), 1) AS pct_events_valid,
               ROUND(100.0e0 * SUM(pace_valid) / COUNT(*), 1) AS pct_pace_valid
               FROM v GROUP BY course_id ORDER BY course_id""")),

    // GLOBAL_COMPLETION_RATES (queries.py:1285-1313).
    QueryDef(
      "d2_completion_rates",
      (s, d) =>
        DashboardQueries2.globalCompletionRates(GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql},
               rs AS (
                 SELECT course_id, round_id,
                 MAX(CAST(is_complete AS INTEGER)) AS is_complete,
                 COUNT(DISTINCT hole_number) AS holes_visited,
                 MAX(CAST(is_nine_hole AS INTEGER)) AS is_nine_hole
                 FROM silver WHERE is_location_padding = FALSE
                 GROUP BY course_id, round_id
               )
               SELECT course_id, COUNT(*) AS total_rounds,
               CAST(SUM(is_complete) AS BIGINT) AS complete_rounds,
               ROUND(100.0e0 * SUM(is_complete) / NULLIF(COUNT(*), 0), 1) AS completion_rate,
               ROUND(AVG(CAST(holes_visited AS DOUBLE)), 1) AS avg_holes_visited,
               CAST(SUM(is_nine_hole) AS BIGINT) AS nine_hole_rounds,
               CAST(SUM(CASE WHEN is_nine_hole = 0 THEN 1 ELSE 0 END) AS BIGINT) AS eighteen_hole_rounds
               FROM rs GROUP BY course_id""")),

    // GLOBAL_DEVICE_FLEET (queries.py:1251-1267).
    QueryDef(
      "d3_device_fleet",
      (s, d) =>
        DashboardQueries2.globalDeviceFleet(GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id,
               COUNT(DISTINCT device) AS unique_devices,
               COUNT(DISTINCT round_id) AS rounds_tracked,
               ROUND(CAST(COUNT(DISTINCT round_id) AS DOUBLE) / NULLIF(COUNT(DISTINCT device), 0), 1) AS rounds_per_device,
               ROUND(AVG(battery_percentage), 1) AS avg_battery,
               ROUND(MIN(battery_percentage), 1) AS min_battery,
               CAST(SUM(CASE WHEN battery_percentage < 20 THEN 1 ELSE 0 END) AS BIGINT) AS low_battery_events,
               CAST(SUM(CASE WHEN is_problem = TRUE THEN 1 ELSE 0 END) AS BIGINT) AS problem_events
               FROM silver WHERE is_location_padding = FALSE
               GROUP BY course_id""")),

    // BOTTLENECK_SUMMARY (queries.py:1531-1577): J7's self-comparison as
    // a window ratio. Synthetic pace folds into the query's (0, 60)
    // band via mod so the reference's bounds bite.
    QueryDef(
      "d4_bottleneck_summary",
      (s, d) =>
        DashboardQueries2.bottleneckSummary(
          GoldQueries.silverView(s, d)
            .withColumn("pace", col("pace") % 60)),
      Some(s"""WITH ${GoldQueries.SilverSql},
               hp AS (
                 SELECT course_id, hole_number, pace % 60 AS pace
                 FROM silver
                 WHERE is_location_padding = FALSE AND pace IS NOT NULL
                   AND (pace % 60) > 0 AND (pace % 60) < 60
                   AND hole_number IS NOT NULL
               ),
               ca AS (SELECT course_id, AVG(pace) AS cap FROM hp GROUP BY course_id),
               hs AS (
                 SELECT hp.course_id, hp.hole_number,
                 AVG(hp.pace) AS avg_pace, MAX(ca.cap) AS cap
                 FROM hp JOIN ca ON hp.course_id = ca.course_id
                 GROUP BY hp.course_id, hp.hole_number
               )
               SELECT course_id, COUNT(*) AS total_holes,
               CAST(SUM(CASE WHEN avg_pace > cap * 1.15 THEN 1 ELSE 0 END) AS BIGINT) AS bottleneck_holes,
               CAST(SUM(CASE WHEN avg_pace < cap * 0.85 THEN 1 ELSE 0 END) AS BIGINT) AS fast_holes,
               ROUND(MAX(cap), 1) AS course_avg_pace,
               ROUND(MAX(avg_pace), 1) AS slowest_hole_pace,
               ROUND(MIN(avg_pace), 1) AS fastest_hole_pace
               FROM hs GROUP BY course_id""")),

    // EVENTS_PER_COURSE (queries.py:1593-1607).
    QueryDef(
      "d5_events_per_course",
      (s, d) =>
        DashboardQueries2.eventsPerCourse(GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id,
               COUNT(DISTINCT round_id) AS rounds,
               COUNT(*) AS total_events,
               CAST(SUM(CASE WHEN is_location_padding = FALSE THEN 1 ELSE 0 END) AS BIGINT) AS real_events,
               MIN(event_date) AS first_date,
               MAX(event_date) AS last_date,
               COUNT(DISTINCT event_date) AS playing_days,
               ROUND(COUNT(*) * 1.0e0 / NULLIF(COUNT(DISTINCT round_id), 0), 0) AS avg_events_per_round
               FROM silver GROUP BY course_id""")),

    // exploration/dataset_variance.sql — cross-course volume/shape audit.
    QueryDef(
      "e1_dataset_variance",
      (s, d) =>
        graft.analytics.ExplorationQueries.datasetVariance(
          GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id,
               COUNT(*) AS total_events,
               COUNT(DISTINCT round_id) AS total_rounds,
               ROUND(CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT round_id), 1) AS avg_events_per_round,
               MIN(fix_timestamp) AS earliest_data,
               MAX(fix_timestamp) AS latest_data,
               COUNT(DISTINCT CAST(fix_timestamp AS DATE)) AS unique_days,
               MAX(location_index) AS max_location_index,
               COUNT(DISTINCT hole_number) AS unique_holes_seen,
               COUNT(DISTINCT start_hole) AS unique_start_holes
               FROM silver GROUP BY course_id""")),

    // exploration/null_pattern_by_hole.sql — per-hole data-loss profile.
    QueryDef(
      "e2_null_pattern_by_hole",
      (s, d) =>
        graft.analytics.ExplorationQueries.nullPatternByHole(
          GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id, hole_number,
               COUNT(*) AS total_records,
               CAST(SUM(CASE WHEN pace IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_pace,
               CAST(SUM(CASE WHEN pace_gap IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_pace_gap,
               CAST(SUM(CASE WHEN positional_gap IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_pos_gap,
               CAST(SUM(CASE WHEN battery_percentage IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_battery,
               CAST(SUM(CASE WHEN is_timestamp_missing = TRUE THEN 1 ELSE 0 END) AS BIGINT) AS null_timestamp,
               ROUND(100.0e0 * SUM(CASE WHEN pace IS NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS pct_null_pace,
               ROUND(100.0e0 * SUM(CASE WHEN pace_gap IS NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS pct_null_pace_gap,
               ROUND(100.0e0 * (
                 SUM(CASE WHEN pace IS NULL THEN 1 ELSE 0 END) +
                 SUM(CASE WHEN pace_gap IS NULL THEN 1 ELSE 0 END) +
                 SUM(CASE WHEN positional_gap IS NULL THEN 1 ELSE 0 END)
               ) / (COUNT(*) * 3), 1) AS avg_null_rate
               FROM silver WHERE hole_number IS NOT NULL
               GROUP BY course_id, hole_number
               ORDER BY course_id, hole_number""")),

    // exploration/data_completeness_summary.sql — composite completeness.
    QueryDef(
      "e3_completeness_summary",
      (s, d) =>
        graft.analytics.ExplorationQueries.dataCompletenessSummary(
          GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id,
               COUNT(*) AS total_records,
               COUNT(DISTINCT round_id) AS unique_rounds,
               ROUND(100.0e0 * SUM(CASE WHEN fix_timestamp IS NOT NULL AND is_timestamp_missing = FALSE THEN 1 ELSE 0 END) / COUNT(*), 1) AS timestamp_complete_pct,
               ROUND(100.0e0 * SUM(CASE WHEN pace IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS pace_complete_pct,
               ROUND(100.0e0 * SUM(CASE WHEN pace_gap IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS pace_gap_complete_pct,
               ROUND(100.0e0 * SUM(CASE WHEN positional_gap IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS pos_gap_complete_pct,
               ROUND(100.0e0 * SUM(CASE WHEN hole_number IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS hole_complete_pct,
               ROUND(100.0e0 * SUM(CASE WHEN latitude IS NOT NULL AND longitude IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS gps_complete_pct,
               ROUND(100.0e0 * SUM(CASE WHEN battery_percentage IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS battery_complete_pct,
               ROUND(100.0e0 * SUM(CASE WHEN start_hole IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS start_hole_complete_pct,
               ROUND((
                 100.0e0 * SUM(CASE WHEN fix_timestamp IS NOT NULL AND is_timestamp_missing = FALSE THEN 1 ELSE 0 END) / COUNT(*) +
                 100.0e0 * SUM(CASE WHEN pace IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*) +
                 100.0e0 * SUM(CASE WHEN hole_number IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*) +
                 100.0e0 * SUM(CASE WHEN latitude IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*)
               ) / 4, 1) AS overall_completeness_score
               FROM silver GROUP BY course_id""")),

    // COLUMN_COMPLETENESS (queries.py:156-177).
    QueryDef(
      "d6_column_completeness",
      (s, d) =>
        DashboardQueries2.columnCompleteness(GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id, COUNT(*) AS total_events,
               ROUND(100.0e0 * SUM(CASE WHEN pace IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS pace_pct,
               ROUND(100.0e0 * SUM(CASE WHEN pace_gap IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS pace_gap_pct,
               ROUND(100.0e0 * SUM(CASE WHEN hole_number IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS hole_pct,
               ROUND(100.0e0 * SUM(CASE WHEN section_number IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS section_pct,
               ROUND(100.0e0 * SUM(CASE WHEN latitude IS NOT NULL AND longitude IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS gps_pct,
               ROUND(100.0e0 * SUM(CASE WHEN fix_timestamp IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS fix_timestamp_pct,
               ROUND(100.0e0 * SUM(CASE WHEN start_hole IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS start_hole_pct,
               ROUND(100.0e0 * SUM(CASE WHEN start_section IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS start_section_pct,
               ROUND(100.0e0 * SUM(CASE WHEN is_complete IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS is_complete_pct,
               ROUND(100.0e0 * SUM(CASE WHEN battery_percentage IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS battery_pct,
               ROUND(100.0e0 * SUM(CASE WHEN device IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*), 1) AS device_pct
               FROM silver WHERE is_location_padding = FALSE
               GROUP BY course_id ORDER BY course_id""")),

    // ROUND_DURATION_DETAILS (queries.py:882-909): per-round duration /
    // outlier listing, exercised through the per-course wrapper so the
    // parameterized variant (get_round_duration_for_course) is the code
    // under test.
    QueryDef(
      "d7_round_duration_details",
      (s, d) =>
        DashboardQueries2.roundDurationDetails(durSilver(s, d))
          .unionByName(
            DashboardQueries2.roundDurationForCourse(durSilver(s, d), "A")),
      Some(s"""WITH ${GoldQueries.SilverSql}, $DurSql,
               rs AS (
                 SELECT course_id, round_id,
                 MAX(round_duration_minutes) AS duration_minutes,
                 MAX(CAST(is_nine_hole AS INTEGER)) = 1 AS is_nine_hole,
                 COUNT(DISTINCT hole_number) AS holes_visited,
                 MIN(event_date) AS round_date
                 FROM dur WHERE is_location_padding = FALSE
                 GROUP BY course_id, round_id
               ),
               details AS (
                 SELECT course_id, round_id, round_date, duration_minutes,
                 is_nine_hole, holes_visited,
                 CASE WHEN is_nine_hole THEN '9-hole' ELSE '18-hole' END AS round_type
                 FROM rs
                 WHERE duration_minutes IS NOT NULL
                   AND duration_minutes > 0 AND duration_minutes < 600
               )
               SELECT * FROM details
               UNION ALL
               SELECT * FROM details WHERE course_id = 'A'"""))
  )
}
