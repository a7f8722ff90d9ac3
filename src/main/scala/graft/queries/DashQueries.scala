package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  private[queries] def durSilver(s: SparkSession, d: String): DataFrame =
    GoldQueries.silverView(s, d)
      .withColumn("round_duration_minutes",
        col("goal_time") / 60.0 + col("current_section") * 5)

  /** Exact sample stddev via the sum-of-squares formula, NULL for n < 2:
    * the n=1 denominator is zero — for an INTEGRAL measure that's an
    * ANSI divide-by-zero ERROR, not a NaN (the round-9 neg-zero audit
    * caught d19 crashing on sf0.001's singleton hole groups; the old
    * count()-only spec never evaluated the column because Catalyst
    * pruned it). stddev of one observation is undefined — NULL matches
    * stddev_samp, and the paired *_within_tol pins treat two-sided NULL
    * as vacuously true via [[tolOrBothNull]]. */
  private def sdExact(c: Column): Column =
    when(count(c) > 1,
      sqrt((sum(c * c) - sum(c) * sum(c) / count(c)) / (count(c) - 1)))

  /** `cmp` when decidable, TRUE when both sides are NULL (the n=1
    * stddev case: library stddev_samp and the exact formula are both
    * undefined — agreeing on undefined is agreement). */
  private def tolOrBothNull(a: Column, b: Column, cmp: Column): Column =
    coalesce(cmp, a.isNull && b.isNull)

  /** The d18 course-summary oracle body, shared with d34's CTE so the
    * two gates can never drift to different summary semantics. */
  private[queries] val CourseSummaryBody: String =
    """SELECT course_id,
      COUNT(DISTINCT round_id) AS round_count,
      COUNT(*) AS event_count,
      CAST(SUM(CASE WHEN is_location_padding = FALSE THEN 1 ELSE 0 END) AS BIGINT) AS real_events,
      MIN(event_date) AS first_date,
      MAX(event_date) AS last_date,
      CAST(DATE_DIFF('day', MIN(event_date), MAX(event_date)) + 1 AS INTEGER) AS total_days,
      COUNT(DISTINCT CASE WHEN is_location_padding = FALSE THEN event_date END) AS playing_days,
      MAX(section_number) AS max_section,
      MAX(hole_number) AS max_hole,
      CASE WHEN MAX(hole_number) >= 10 THEN '18-hole'
           WHEN MAX(section_number) > 54 THEN '27-hole'
           WHEN MAX(section_number) > 27 THEN '18-hole (loop)'
           ELSE '9-hole' END AS inferred_type
      FROM silver GROUP BY course_id"""

  private[queries] val DurSql: String =
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
               SELECT * FROM details WHERE course_id = 'A'""")),

    // get_round_progression_summary (queries.py:1060-1120): per-round
    // LAG-transition anomaly rollup + quality classification — W3's
    // primary dashboard consumer, now at full reference parity
    // (pct columns + CASE quality ladder). The synthetic mapping can
    // produce tied location_index values within a round (real telemetry
    // can't), so the gate totalizes the order with a
    // (location_index, section, hole) composite — rows still tied under
    // it are value-identical in every compared column, so the LAG
    // classification is order-invariant and cross-engine deterministic.
    QueryDef(
      "d8_round_progression_summary",
      (s, d) =>
        graft.analytics.DashboardQueries.roundProgressionSummary(
          GoldQueries.silverView(s, d)
            .withColumn("location_index",
              col("location_index") * 1000000 +
                col("section_number") * 1000 +
                coalesce(col("hole_number"), lit(0))),
          "A"),
      Some(s"""WITH ${GoldQueries.SilverSql},
               tr AS (
                 SELECT round_id, hole_number, section_number,
                 LAG(hole_number) OVER (PARTITION BY round_id
                   ORDER BY location_index * 1000000 + section_number * 1000
                     + COALESCE(hole_number, 0)) AS prev_hole,
                 LAG(section_number) OVER (PARTITION BY round_id
                   ORDER BY location_index * 1000000 + section_number * 1000
                     + COALESCE(hole_number, 0)) AS prev_section
                 FROM silver
                 WHERE course_id = 'A' AND is_location_padding = FALSE
                   AND hole_number IS NOT NULL AND section_number IS NOT NULL
               ),
               ta AS (
                 SELECT round_id, COUNT(*) AS total_events,
                 CAST(SUM(CASE WHEN prev_hole IS NULL OR hole_number = prev_hole
                          OR hole_number = prev_hole + 1 THEN 0 ELSE 1 END) AS BIGINT) AS hole_anomalies,
                 CAST(SUM(CASE WHEN prev_section IS NULL OR section_number = prev_section
                          OR section_number = prev_section + 1 THEN 0 ELSE 1 END) AS BIGINT) AS section_anomalies,
                 MIN(hole_number) AS start_hole,
                 MAX(hole_number) AS end_hole,
                 COUNT(DISTINCT hole_number) AS holes_visited
                 FROM tr GROUP BY round_id
               )
               SELECT round_id, total_events, hole_anomalies, section_anomalies,
               start_hole, end_hole, holes_visited,
               ROUND(100.0e0 * hole_anomalies / NULLIF(total_events, 0), 1) AS hole_anomaly_pct,
               ROUND(100.0e0 * section_anomalies / NULLIF(total_events, 0), 1) AS section_anomaly_pct,
               CASE WHEN hole_anomalies = 0 AND section_anomalies = 0 THEN 'clean'
                    WHEN hole_anomalies <= 2 AND section_anomalies <= 5 THEN 'minor_issues'
                    ELSE 'needs_review' END AS progression_quality
               FROM ta ORDER BY hole_anomalies DESC, section_anomalies DESC, round_id""")),

    // get_round_nine_combinations_for_course (queries.py:624-662, A11's
    // real consumer): rounds keyed by '+'-joined sorted distinct nines.
    QueryDef(
      "d9_nine_combinations",
      (s, d) =>
        graft.analytics.DashboardQueries.nineCombinations(
          GoldQueries.silverView(s, d), "A"),
      Some(s"""WITH ${GoldQueries.SilverSql},
               rn AS (
                 SELECT DISTINCT round_id, nine_number FROM silver
                 WHERE course_id = 'A' AND is_location_padding = FALSE
                   AND nine_number IS NOT NULL
               ),
               rc AS (
                 SELECT round_id,
                 STRING_AGG(CAST(nine_number AS VARCHAR), '+' ORDER BY nine_number)
                   AS nines_combination
                 FROM rn GROUP BY round_id
               )
               SELECT nines_combination, COUNT(*) AS rounds
               FROM rc GROUP BY nines_combination
               ORDER BY rounds DESC, nines_combination""")),

    // GLOBAL_WEEKDAY_HEATMAP (queries.py:1195-1207). event_weekday is
    // derived at the gate boundary with the Trino day_of_week convention
    // (Mon=1..Sun=7, the P9 weekday trap) — the real silver carries it.
    QueryDef(
      "d10_weekday_heatmap",
      (s, d) =>
        DashboardQueries2.globalWeekdayHeatmap(
          GoldQueries.silverView(s, d)
            .withColumn("event_weekday",
              (weekday(col("event_date")) + 1).cast("int"))),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id,
               CAST(ISODOW(event_date) AS INTEGER) AS event_weekday,
               COUNT(DISTINCT round_id) AS round_count
               FROM silver
               WHERE is_location_padding = FALSE AND event_date IS NOT NULL
               GROUP BY course_id, CAST(ISODOW(event_date) AS INTEGER)
               ORDER BY course_id, event_weekday""")),

    // GLOBAL_HOURLY_DISTRIBUTION (queries.py:1209-1221). The synthetic
    // round_start_time is day-truncated, so the gate staggers it by a
    // deterministic per-round hour so the hour histogram has real spread.
    QueryDef(
      "d11_hourly_distribution",
      (s, d) =>
        DashboardQueries2.globalHourlyDistribution(
          GoldQueries.silverView(s, d)
            .withColumn("round_start_time",
              expr("""round_start_time + make_interval(0, 0, 0, 0,
                      CAST(substring(round_id, 6, 18) AS INT) % 24, 0, 0)"""))),
      Some(s"""WITH ${GoldQueries.SilverSql},
               st AS (
                 SELECT course_id, round_id, is_location_padding,
                 round_start_time
                   + TO_HOURS(CAST(substr(round_id, 6) AS BIGINT) % 24) AS rst
                 FROM silver
               )
               SELECT course_id,
               CAST(EXTRACT(HOUR FROM rst) AS INTEGER) AS start_hour,
               COUNT(DISTINCT round_id) AS round_count
               FROM st
               WHERE is_location_padding = FALSE AND rst IS NOT NULL
               GROUP BY course_id, CAST(EXTRACT(HOUR FROM rst) AS INTEGER)
               ORDER BY course_id, start_hour""")),

    // GLOBAL_MONTHLY_TREND (queries.py:1269-1283).
    QueryDef(
      "d12_monthly_trend",
      (s, d) =>
        DashboardQueries2.globalMonthlyTrend(
          GoldQueries.silverView(s, d)
            .withColumn("event_year", year(col("event_date")))
            .withColumn("event_month", month(col("event_date")))),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT CAST(EXTRACT(YEAR FROM event_date) AS INTEGER) AS event_year,
               CAST(EXTRACT(MONTH FROM event_date) AS INTEGER) AS event_month,
               course_id,
               COUNT(DISTINCT round_id) AS round_count
               FROM silver
               WHERE is_location_padding = FALSE AND event_date IS NOT NULL
               GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // get_pace_comparison_for_hole (queries.py:1503-1529): the per-hole
    // first-vs-second-pass event stream behind the fatigue drilldown.
    // Pace folds into the query's (0, 60) band via mod so the
    // reference's realistic-pace bounds bite on synthetic data.
    QueryDef(
      "d13_pace_comparison_for_hole",
      (s, d) =>
        DashboardQueries2.paceComparisonForHole(
          GoldQueries.silverView(s, d).withColumn("pace", col("pace") % 60),
          "A", 5),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT round_id, nine_number,
               CASE WHEN nine_number = 1 THEN 'first_nine'
                    WHEN nine_number = 2 THEN 'second_nine'
                    ELSE 'nine_' || CAST(nine_number AS VARCHAR) END AS pass_number,
               pace % 60 AS pace, fix_timestamp
               FROM silver
               WHERE course_id = 'A' AND is_location_padding = FALSE
                 AND is_nine_hole = FALSE
                 AND pace IS NOT NULL AND (pace % 60) > 0 AND (pace % 60) < 60
                 AND hole_number = 5 AND nine_number IS NOT NULL
               ORDER BY round_id, fix_timestamp""")),

    // ROUND_LENGTH_DISTRIBUTION (queries.py:549-587): holes-visited
    // bucket histogram per course.
    QueryDef(
      "d14_round_length_distribution",
      (s, d) =>
        DashboardQueries2.roundLengthDistribution(GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql},
               rh AS (
                 SELECT course_id, round_id,
                 COUNT(DISTINCT hole_number) AS holes_visited
                 FROM silver
                 WHERE is_location_padding = FALSE AND hole_number IS NOT NULL
                 GROUP BY course_id, round_id
               )
               SELECT course_id,
               CASE WHEN holes_visited < 9 THEN '<9'
                    WHEN holes_visited = 9 THEN '9'
                    WHEN holes_visited = 18 THEN '18'
                    WHEN holes_visited = 27 THEN '27'
                    WHEN holes_visited > 27 THEN '>27'
                    ELSE 'other (10–26)' END AS round_length_bucket,
               COUNT(*) AS round_count
               FROM rh GROUP BY course_id, 2 ORDER BY course_id, 2""")),

    // GLOBAL_PACE_COMPARISON (queries.py:1143-1162). The reference uses
    // APPROX_PERCENTILE for the median; sketches are not cross-engine
    // reproducible, so the gate hash-pins the EXACT median (both
    // engines) plus tolerance flags proving the library's approx median
    // and stddev land within sketch error — the a23 discipline. The
    // stddev reference value is the explicit sum-of-squares formula so
    // both engines execute the identical IEEE op sequence on
    // exact-integer sums.
    QueryDef(
      "d15_global_pace_comparison",
      (s, d) => {
        val sv = GoldQueries.silverView(s, d)
          .withColumn("pace", col("pace") % 600)
        val lib = DashboardQueries2.globalPaceComparison(sv)
        val base = sv.filter(!col("is_location_padding") &&
          col("pace").isNotNull && col("pace") > 0 && col("pace") < 600)
        val exact = base.groupBy(col("course_id")).agg(
          round(expr("percentile(pace, 0.5)"), 1).as("median_pace_exact"),
          sdExact(col("pace")).as("__sd_exact"))
        lib.join(exact, Seq("course_id"))
          .withColumn("median_within_tol",
            abs(col("median_pace") - col("median_pace_exact")) <=
              greatest(col("median_pace_exact") * 0.02, lit(2.0)))
          .withColumn("stddev_within_tol", tolOrBothNull(
            col("pace_stddev"), col("__sd_exact"),
            abs(col("pace_stddev") - col("__sd_exact")) <= lit(0.1)))
          .withColumn("pace_stddev_formula", round(col("__sd_exact"), 1))
          .drop("median_pace", "pace_stddev", "__sd_exact")
          .orderBy(col("course_id"))
      },
      Some(s"""WITH ${GoldQueries.SilverSql},
               p AS (
                 SELECT course_id, round_id, pace % 600 AS pace,
                 pace_gap
                 FROM silver
                 WHERE is_location_padding = FALSE AND pace IS NOT NULL
                   AND (pace % 600) > 0 AND (pace % 600) < 600
               )
               SELECT course_id,
               COUNT(DISTINCT round_id) AS round_count,
               ROUND(AVG(pace), 1) AS avg_pace,
               ROUND(MIN(pace), 1) AS min_pace,
               ROUND(MAX(pace), 1) AS max_pace,
               ROUND(AVG(pace_gap), 1) AS avg_pace_gap,
               ROUND(QUANTILE_CONT(pace, 0.5e0), 1) AS median_pace_exact,
               TRUE AS median_within_tol,
               TRUE AS stddev_within_tol,
               CASE WHEN COUNT(pace) > 1 THEN
                 ROUND(SQRT((SUM(pace * pace) - SUM(pace) * SUM(pace) / COUNT(pace))
                 / (COUNT(pace) - 1)), 1) END AS pace_stddev_formula
               FROM p GROUP BY course_id ORDER BY course_id""")),

    // PACE_BY_HOLE via the per-course wrapper (queries.py:1319-1411,
    // J7's dashboard consumer): bottleneck/fast/normal classification of
    // each hole against the course average. Median/stddev pinned with
    // the same exact-value + tolerance-flag discipline as d15.
    QueryDef(
      "d16_pace_by_hole",
      (s, d) => {
        val sv = GoldQueries.silverView(s, d)
          .withColumn("pace", col("pace") % 60)
        val lib = graft.analytics.DashboardQueries.paceByHole(sv, Some("A"))
        val base = sv.filter(!col("is_location_padding") &&
          col("pace").isNotNull && col("pace") > 0 && col("pace") < 60 &&
          col("hole_number").isNotNull && col("course_id") === "A")
        val exact = base.groupBy(col("course_id"), col("hole_number")).agg(
          round(expr("percentile(pace, 0.5)"), 1).as("median_pace_exact"),
          sdExact(col("pace")).as("__sd_exact"))
        lib.join(exact, Seq("course_id", "hole_number"))
          .withColumn("median_within_tol",
            abs(col("median_pace") - col("median_pace_exact")) <=
              greatest(col("median_pace_exact") * 0.02, lit(2.0)))
          .withColumn("stddev_within_tol", tolOrBothNull(
            col("pace_stddev"), col("__sd_exact"),
            abs(col("pace_stddev") - col("__sd_exact")) <= lit(0.1)))
          .withColumn("pace_stddev_formula", round(col("__sd_exact"), 1))
          .drop("median_pace", "pace_stddev", "__sd_exact")
          .orderBy(col("course_id"), col("hole_number"))
      },
      Some(s"""WITH ${GoldQueries.SilverSql},
               hp AS (
                 SELECT course_id, round_id, hole_number, pace % 60 AS pace
                 FROM silver
                 WHERE is_location_padding = FALSE AND pace IS NOT NULL
                   AND (pace % 60) > 0 AND (pace % 60) < 60
                   AND hole_number IS NOT NULL AND course_id = 'A'
               ),
               ca AS (
                 SELECT course_id, AVG(pace) AS course_avg_raw
                 FROM hp GROUP BY course_id
               ),
               hs AS (
                 SELECT hp.course_id, hp.hole_number,
                 COUNT(DISTINCT hp.round_id) AS sample_rounds,
                 COUNT(*) AS sample_events,
                 ROUND(AVG(hp.pace), 1) AS avg_pace,
                 ROUND(MIN(hp.pace), 1) AS min_pace,
                 ROUND(MAX(hp.pace), 1) AS max_pace,
                 AVG(hp.pace) AS raw_avg,
                 MAX(ca.course_avg_raw) AS course_avg_raw,
                 ROUND(QUANTILE_CONT(hp.pace, 0.5e0), 1) AS median_pace_exact,
                 CASE WHEN COUNT(hp.pace) > 1 THEN
                   ROUND(SQRT((SUM(hp.pace * hp.pace)
                   - SUM(hp.pace) * SUM(hp.pace) / COUNT(hp.pace))
                   / (COUNT(hp.pace) - 1)), 1) END AS pace_stddev_formula
                 FROM hp JOIN ca ON hp.course_id = ca.course_id
                 GROUP BY hp.course_id, hp.hole_number
               )
               SELECT course_id, hole_number, sample_rounds, sample_events,
               avg_pace, min_pace, max_pace,
               ROUND(course_avg_raw, 1) AS course_avg_pace,
               ROUND(raw_avg - ROUND(course_avg_raw, 1), 1) + 0e0 AS pace_vs_avg,
               CASE WHEN raw_avg > ROUND(course_avg_raw, 1) * 1.15 THEN 'bottleneck'
                    WHEN raw_avg < ROUND(course_avg_raw, 1) * 0.85 THEN 'fast'
                    ELSE 'normal' END AS hole_category,
               median_pace_exact, TRUE AS median_within_tol,
               TRUE AS stddev_within_tol, pace_stddev_formula
               FROM hs ORDER BY course_id, hole_number""")),

    // OVERVIEW_STATS (queries.py:11-21): the landing-page one-row lake
    // overview.
    QueryDef(
      "d17_overview_stats",
      (s, d) =>
        graft.analytics.DashboardQueries.overviewStats(
          GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT COUNT(DISTINCT course_id) AS total_courses,
               COUNT(DISTINCT round_id) AS total_rounds,
               COUNT(*) AS total_events,
               CAST(SUM(CASE WHEN is_location_padding = FALSE THEN 1 ELSE 0 END) AS BIGINT) AS real_events,
               MIN(event_date) AS earliest_date,
               MAX(event_date) AS latest_date
               FROM silver""")),

    // COURSE_SUMMARY (queries.py:23-46): per-course stats + the
    // inferred-type ladder.
    QueryDef(
      "d18_course_summary",
      (s, d) =>
        graft.analytics.DashboardQueries.courseSummary(
          GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}
               $CourseSummaryBody
               ORDER BY course_id""")),

    // get_hole_duration_for_course (queries.py:950-996): per-hole
    // duration stats. The synthetic fixes of one round land days apart
    // (shipdates), so raw durations all exceed the (0, 60) bound; the
    // gate anchors every fix to one day plus a deterministic per-line
    // minute offset (NULL injection preserved) so (round, hole) groups
    // get realistic in-band durations at every sf. The approx median is
    // pinned with the exact-value + tolerance-flag discipline (d15).
    QueryDef(
      "d19_hole_durations",
      (s, d) => {
        val sv = GoldQueries.silverView(s, d)
          .withColumn("fix_timestamp",
            when(col("fix_timestamp").isNotNull, expr(
              "TIMESTAMP '2024-06-01 00:00:00' + make_dt_interval(0, 0, " +
                "(location_index * 9 + section_number * 13) % 55, 0)")))
        val lib = graft.analytics.DashboardQueries.holeDurations(sv, "A")
        val durs = sv.filter(col("course_id") === "A" &&
            !col("is_location_padding") &&
            col("hole_number").isNotNull && col("fix_timestamp").isNotNull)
          .groupBy(col("course_id"), col("round_id"), col("hole_number"))
          .agg(min(col("fix_timestamp")).as("hs"),
            max(col("fix_timestamp")).as("he"))
          .withColumn("dm",
            floor((unix_timestamp(col("he")) - unix_timestamp(col("hs"))) / 60))
          .filter(col("dm") > 0 && col("dm") < 60)
        val exact = durs.groupBy(col("hole_number")).agg(
          round(expr("percentile(dm, 0.5)"), 1).as("median_duration_exact"),
          sdExact(col("dm")).as("__sd_exact"))
        // These groups are SMALL and sparse-valued (≈ 10-20 quantized
        // durations), where the approx median (an ELEMENT) and the exact
        // continuous median (an interpolation) legitimately diverge by a
        // whole value gap — an abs-tolerance flag is the wrong pin. The
        // convention-free property is pinned instead: the library's
        // median must be a MEDIAN ELEMENT of its group (≤ n/2 values
        // strictly below it, ≥ n/2 values at or below it).
        val medCheck = durs
          .join(lib.select(col("hole_number"),
            col("median_duration_min").as("__m")), Seq("hole_number"))
          .groupBy(col("hole_number"))
          .agg(
            ((sum(when(col("dm") < col("__m"), 1L).otherwise(0L)) <=
              count(lit(1)) / 2) &&
             (sum(when(col("dm") <= col("__m"), 1L).otherwise(0L)) >=
              count(lit(1)) / 2)).as("median_within_tol"))
        lib.join(exact, Seq("hole_number"))
          .join(medCheck, Seq("hole_number"))
          .withColumn("stddev_within_tol", tolOrBothNull(
            col("stddev_duration"), col("__sd_exact"),
            abs(col("stddev_duration") - col("__sd_exact")) <= lit(0.1)))
          .withColumn("stddev_duration_formula", round(col("__sd_exact"), 1))
          .drop("median_duration_min", "stddev_duration", "__sd_exact")
          .orderBy(col("hole_number"))
      },
      Some(s"""WITH ${GoldQueries.SilverSql},
               sv AS (
                 SELECT *,
                 CASE WHEN fix_timestamp IS NOT NULL THEN
                   TIMESTAMP '2024-06-01 00:00:00' +
                   INTERVAL 1 MINUTE * ((location_index * 9 + section_number * 13) % 55)
                 END AS fx
                 FROM silver
               ),
               hd AS (
                 SELECT course_id, round_id, hole_number,
                 CAST(FLOOR(DATE_DIFF('second', MIN(fx), MAX(fx)) / 60.0e0) AS BIGINT) AS dm
                 FROM sv
                 WHERE course_id = 'A' AND is_location_padding = FALSE
                   AND hole_number IS NOT NULL AND fx IS NOT NULL
                 GROUP BY course_id, round_id, hole_number
               ),
               b AS (SELECT * FROM hd WHERE dm > 0 AND dm < 60)
               SELECT hole_number,
               COUNT(*) AS sample_count,
               ROUND(AVG(dm), 1) AS avg_duration_min,
               MIN(dm) AS min_duration_min,
               MAX(dm) AS max_duration_min,
               ROUND(QUANTILE_CONT(dm, 0.5e0), 1) AS median_duration_exact,
               TRUE AS median_within_tol,
               TRUE AS stddev_within_tol,
               CASE WHEN COUNT(dm) > 1 THEN
                 ROUND(SQRT((SUM(dm * dm) - SUM(dm) * SUM(dm) / COUNT(dm))
                 / (COUNT(dm) - 1)), 1) END AS stddev_duration_formula
               FROM b GROUP BY hole_number ORDER BY hole_number""")),

    // get_nine_loop_pace_comparison (queries.py:1460-1502): the fatigue
    // query — same hole, first vs second pass. Approx median pinned via
    // the exact + tolerance discipline; pace folds into the (0, 60)
    // band so the realistic-pace bounds bite.
    QueryDef(
      "d20_nine_loop_pace",
      (s, d) => {
        val sv = GoldQueries.silverView(s, d)
          .withColumn("pace", col("pace") % 60)
        val lib = graft.analytics.DashboardQueries
          .nineLoopPaceComparison(sv, "A")
        val base = sv.filter(col("course_id") === "A" &&
          !col("is_location_padding") && col("is_nine_hole") === false &&
          col("pace").isNotNull && col("pace") > 0 && col("pace") < 60 &&
          col("hole_number").isNotNull && col("nine_number").isNotNull)
        val exact = base.groupBy(col("hole_number"), col("nine_number")).agg(
          round(expr("percentile(pace, 0.5)"), 1).as("median_pace_exact"),
          sdExact(col("pace")).as("__sd_exact"))
        lib.join(exact, Seq("hole_number", "nine_number"))
          .withColumn("median_within_tol",
            abs(col("median_pace") - col("median_pace_exact")) <=
              greatest(col("median_pace_exact") * 0.02, lit(2.0)))
          .withColumn("stddev_within_tol", tolOrBothNull(
            col("pace_stddev"), col("__sd_exact"),
            abs(col("pace_stddev") - col("__sd_exact")) <= lit(0.1)))
          .withColumn("pace_stddev_formula", round(col("__sd_exact"), 1))
          .drop("median_pace", "pace_stddev", "__sd_exact")
          .orderBy(col("hole_number"), col("nine_number"))
      },
      Some(s"""WITH ${GoldQueries.SilverSql},
               p AS (
                 SELECT hole_number, nine_number, round_id,
                 pace % 60 AS pace
                 FROM silver
                 WHERE course_id = 'A' AND is_location_padding = FALSE
                   AND is_nine_hole = FALSE
                   AND pace IS NOT NULL AND (pace % 60) > 0 AND (pace % 60) < 60
                   AND hole_number IS NOT NULL AND nine_number IS NOT NULL
               )
               SELECT hole_number, nine_number,
               COUNT(DISTINCT round_id) AS sample_rounds,
               COUNT(*) AS sample_events,
               ROUND(AVG(pace), 1) AS avg_pace,
               ROUND(MIN(pace), 1) AS min_pace,
               ROUND(MAX(pace), 1) AS max_pace,
               CASE WHEN nine_number = 1 THEN 'first_nine'
                    WHEN nine_number = 2 THEN 'second_nine'
                    ELSE 'nine_' || CAST(nine_number AS VARCHAR) END AS pass_number,
               ROUND(QUANTILE_CONT(pace, 0.5e0), 1) AS median_pace_exact,
               TRUE AS median_within_tol,
               TRUE AS stddev_within_tol,
               CASE WHEN COUNT(pace) > 1 THEN
                 ROUND(SQRT((SUM(pace * pace) - SUM(pace) * SUM(pace) / COUNT(pace))
                 / (COUNT(pace) - 1)), 1) END AS pace_stddev_formula
               FROM p GROUP BY hole_number, nine_number
               ORDER BY hole_number, nine_number""")),

    // PACE_BY_SECTION (queries.py:1434-1459): section-grain pace stats.
    QueryDef(
      "d21_pace_by_section",
      (s, d) => {
        val sv = GoldQueries.silverView(s, d)
          .withColumn("pace", col("pace") % 60)
        val lib = graft.analytics.DashboardQueries
          .paceBySection(sv, Some("A"))
        val base = sv.filter(col("course_id") === "A" &&
          !col("is_location_padding") &&
          col("pace").isNotNull && col("pace") > 0 && col("pace") < 60 &&
          col("hole_number").isNotNull && col("section_number").isNotNull)
        // INHERITED-STATE FIX (r11): the tolerance flag compared the
        // lib's percentile_approx — which returns an actual ELEMENT of
        // the group — against the INTERPOLATED exact median; an
        // even-sized group whose two middle elements sit > 2·tol apart
        // (e.g. sf0.001's (hole 5, section 23): middles 25 and 30,
        // interp 27.5, approx 25) made the flag FALSE against the
        // oracle's TRUE. The flag now compares element-vs-element: the
        // exact DISCRETE median (lower-middle element — exactly what an
        // exact-capacity sketch returns), same tolerance. The OUTPUT
        // column median_pace_exact stays the interpolated statistic
        // (it hash-matches the oracle's QUANTILE_CONT).
        val exact = base
          .groupBy(col("course_id"), col("hole_number"), col("section_number"))
          .agg(
            round(expr("percentile(pace, 0.5)"), 1).as("median_pace_exact"),
            round(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY pace)"), 1)
              .as("__med_disc"))
        lib.join(exact, Seq("course_id", "hole_number", "section_number"))
          .withColumn("median_within_tol",
            abs(col("median_pace") - col("__med_disc")) <=
              greatest(col("__med_disc") * 0.02, lit(2.0)))
          .drop("median_pace", "__med_disc")
          .orderBy(col("course_id"), col("hole_number"), col("section_number"))
      },
      Some(s"""WITH ${GoldQueries.SilverSql},
               p AS (
                 SELECT course_id, hole_number, section_number, round_id,
                 pace % 60 AS pace
                 FROM silver
                 WHERE course_id = 'A' AND is_location_padding = FALSE
                   AND pace IS NOT NULL AND (pace % 60) > 0 AND (pace % 60) < 60
                   AND hole_number IS NOT NULL AND section_number IS NOT NULL
               )
               SELECT course_id, hole_number, section_number,
               COUNT(DISTINCT round_id) AS sample_rounds,
               ROUND(AVG(pace), 1) AS avg_pace,
               ROUND(QUANTILE_CONT(pace, 0.5e0), 1) AS median_pace_exact,
               TRUE AS median_within_tol
               FROM p GROUP BY course_id, hole_number, section_number
               ORDER BY course_id, hole_number, section_number""")),

    // ROUND_DURATION (queries.py:379-397): bounded-duration stats per
    // course.
    QueryDef(
      "d22_round_duration",
      (s, d) =>
        DashboardQueries2.roundDuration(durSilver(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}, $DurSql
               SELECT course_id,
               COUNT(DISTINCT round_id) AS rounds_with_duration,
               ROUND(AVG(round_duration_minutes), 0) AS avg_duration_min,
               ROUND(MIN(round_duration_minutes), 0) AS min_duration_min,
               ROUND(MAX(round_duration_minutes), 0) AS max_duration_min
               FROM dur
               WHERE round_duration_minutes IS NOT NULL
                 AND round_duration_minutes > 0 AND round_duration_minutes < 600
               GROUP BY course_id ORDER BY course_id""")),

    // DEVICE_STATS (queries.py:442-466): device fleet + battery health
    // per course.
    QueryDef(
      "d23_device_stats",
      (s, d) =>
        DashboardQueries2.deviceStats(GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id,
               COUNT(DISTINCT device) AS unique_devices,
               ROUND(AVG(battery_percentage), 1) AS avg_battery,
               ROUND(MIN(battery_percentage), 1) AS min_battery,
               COUNT(*) AS total_events,
               CAST(SUM(CASE WHEN battery_percentage < 20 THEN 1 ELSE 0 END) AS BIGINT) AS low_battery_events,
               ROUND(100.0e0 * SUM(CASE WHEN battery_percentage < 20 THEN 1 ELSE 0 END) / COUNT(*), 1) AS low_battery_pct,
               CAST(SUM(CASE WHEN is_cache THEN 1 ELSE 0 END) AS BIGINT) AS cached_events,
               ROUND(100.0e0 * SUM(CASE WHEN is_cache THEN 1 ELSE 0 END) / COUNT(*), 1) AS cached_pct,
               CAST(SUM(CASE WHEN is_problem THEN 1 ELSE 0 END) AS BIGINT) AS problem_events,
               ROUND(100.0e0 * SUM(CASE WHEN is_problem THEN 1 ELSE 0 END) / COUNT(*), 1) AS problem_pct,
               CAST(SUM(CASE WHEN is_projected THEN 1 ELSE 0 END) AS BIGINT) AS projected_events,
               ROUND(100.0e0 * SUM(CASE WHEN is_projected THEN 1 ELSE 0 END) / COUNT(*), 1) AS projected_pct
               FROM silver
               WHERE is_location_padding = FALSE
               GROUP BY course_id ORDER BY course_id""")),

    // GLOBAL_ROUND_DURATION_COMPARISON (queries.py:1164-1193): per-round
    // durations rolled to course grain; approx median pinned via the
    // exact + tolerance discipline.
    QueryDef(
      "d24_duration_comparison",
      (s, d) => {
        val sv = durSilver(s, d)
        val lib = DashboardQueries2.globalRoundDurationComparison(sv)
        val perRound = sv.filter(!col("is_location_padding") &&
            col("round_duration_minutes").isNotNull &&
            col("round_duration_minutes") > 30 &&
            col("round_duration_minutes") < 480)
          .groupBy(col("course_id"), col("round_id"))
          .agg(max(col("round_duration_minutes")).as("dmin"))
        val exact = perRound.groupBy(col("course_id")).agg(
          round(expr("percentile(dmin, 0.5)"), 0).as("median_duration_exact"),
          sdExact(col("dmin")).as("__sd_exact"))
        lib.join(exact, Seq("course_id"))
          .withColumn("median_within_tol",
            abs(col("median_duration_min") - col("median_duration_exact")) <=
              greatest(col("median_duration_exact") * 0.02, lit(2.0)))
          .withColumn("stddev_within_tol", tolOrBothNull(
            col("duration_stddev"), col("__sd_exact"),
            abs(col("duration_stddev") - round(col("__sd_exact"), 0)) <= lit(1.0)))
          .withColumn("duration_stddev_formula", round(col("__sd_exact"), 0))
          .drop("median_duration_min", "duration_stddev", "__sd_exact")
          .orderBy(col("course_id"))
      },
      Some(s"""WITH ${GoldQueries.SilverSql}, $DurSql,
               pr AS (
                 SELECT course_id, round_id,
                 MAX(round_duration_minutes) AS dmin,
                 CAST(MAX(CAST(is_nine_hole AS INT)) AS INT) AS is_nine
                 FROM dur
                 WHERE is_location_padding = FALSE
                   AND round_duration_minutes IS NOT NULL
                   AND round_duration_minutes > 30 AND round_duration_minutes < 480
                 GROUP BY course_id, round_id
               )
               SELECT course_id,
               COUNT(*) AS round_count,
               ROUND(AVG(dmin), 0) AS avg_duration_min,
               ROUND(MIN(dmin), 0) AS min_duration_min,
               ROUND(MAX(dmin), 0) AS max_duration_min,
               CAST(SUM(CASE WHEN is_nine = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nine_hole_rounds,
               CAST(SUM(CASE WHEN is_nine = 0 THEN 1 ELSE 0 END) AS BIGINT) AS full_rounds,
               ROUND(QUANTILE_CONT(dmin, 0.5e0), 0) AS median_duration_exact,
               TRUE AS median_within_tol,
               TRUE AS stddev_within_tol,
               CASE WHEN COUNT(dmin) > 1 THEN
                 ROUND(SQRT((SUM(dmin * dmin) - SUM(dmin) * SUM(dmin) / COUNT(dmin))
                 / (COUNT(dmin) - 1)), 0) END AS duration_stddev_formula
               FROM pr GROUP BY course_id ORDER BY course_id"""))
  )
}
