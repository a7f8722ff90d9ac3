package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.gold.GoldModels

/** Gold-model parity gate, part 3: global_course_summary and the two
  * cross-model stitches (dim_course J3, gold_coverage_audit J4).
  */
object GoldQueries3 {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  private def silverOf(s: SparkSession, d: String): DataFrame =
    GoldQueries.silverView(s, d)

  /** Reduced data_quality CTE — only the columns dim_course consumes. */
  private val DqSliceSql: String =
    """dq AS (
      SELECT course_id AS d_course_id,
        ROUND(100.0e0 * null_pace / NULLIF(total_events, 0), 2) AS pct_missing_pace,
        ROUND(100.0e0 * null_pace_gap / NULLIF(total_events, 0), 2) AS pct_missing_pace_gap,
        ROUND(100.0e0 * null_hole_number / NULLIF(total_events, 0), 2) AS pct_missing_hole_number,
        ROUND(100.0e0 * null_section_number / NULLIF(total_events, 0), 2) AS pct_missing_section_number,
        ROUND(100.0e0 * null_fix_timestamp / NULLIF(total_events, 0), 2) AS pct_missing_fix_timestamp,
        ROUND(100.0e0 * null_start_hole / NULLIF(total_events, 0), 2) AS pct_missing_start_hole,
        ROUND((
          (100 - ((COALESCE(100.0e0 * null_pace / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_pace_gap / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_positional_gap / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_goal_time / NULLIF(total_events, 0), 0)) / 4)) +
          (100 - ((COALESCE(100.0e0 * null_coordinates / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_fix_timestamp / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_hole_number / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_section_number / NULLIF(total_events, 0), 0)) / 4)) +
          (100 - ((COALESCE(100.0e0 * null_battery / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_is_cache / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * timestamp_missing_flag / NULLIF(total_events, 0), 0)) / 3)) +
          (100 - ((COALESCE(100.0e0 * null_start_hole / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_is_nine_hole / NULLIF(total_events, 0), 0) + COALESCE(100.0e0 * null_is_complete / NULLIF(total_events, 0), 0)) / 3))
        ) / 4, 1) AS data_quality_score
      FROM (
        SELECT course_id, COUNT(*) AS total_events,
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
        FROM silver WHERE is_location_padding = FALSE GROUP BY course_id
      )
    )"""

  private val CompletenessSql: String =
    """tc AS (
      SELECT course_id AS t_course_id,
      COUNT(*) AS total_rows,
      CAST(SUM(CASE WHEN is_location_padding THEN 1 ELSE 0 END) AS BIGINT) AS padding_rows,
      CAST(SUM(CASE WHEN NOT is_location_padding THEN 1 ELSE 0 END) AS BIGINT) AS non_padding_rows,
      ROUND(100.0e0 * SUM(CASE WHEN is_location_padding THEN 1 ELSE 0 END) / NULLIF(COUNT(*), 0), 2) AS pct_padding_total,
      ROUND(100.0e0 * SUM(CASE WHEN is_timestamp_missing THEN 1 ELSE 0 END) / NULLIF(COUNT(*), 0), 2) AS pct_ts_missing_total,
      ROUND(100.0e0 * SUM(CASE WHEN is_timestamp_missing AND NOT is_location_padding THEN 1 ELSE 0 END) / NULLIF(SUM(CASE WHEN NOT is_location_padding THEN 1 ELSE 0 END), 0), 2) AS pct_ts_missing_non_padding
      FROM silver GROUP BY course_id
    )"""

  val defs: Seq[QueryDef] = Seq(

    // §2.8 global_course_summary (silver_normalized).
    QueryDef(
      "gm_global_course_summary",
      (s, d) =>
        GoldModels.globalCourseSummary(silverOf(s, d), exactPercentiles = true)
          .orderBy(col("course_id")),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id,
               COUNT(*) AS total_rows,
               CAST(SUM(CASE WHEN is_location_padding THEN 1 ELSE 0 END) AS BIGINT) AS padding_rows,
               CAST(SUM(CASE WHEN NOT is_location_padding THEN 1 ELSE 0 END) AS BIGINT) AS non_padding_rows,
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
               AVG(CASE WHEN NOT is_location_padding THEN pace_gap END) AS avg_pace_gap_sec,
               QUANTILE_CONT(CASE WHEN NOT is_location_padding THEN pace_gap END, 0.5) AS median_pace_gap_sec,
               ROUND(100.0e0 * SUM(CASE WHEN NOT is_location_padding AND is_problem THEN 1 ELSE 0 END) / NULLIF(SUM(CASE WHEN NOT is_location_padding THEN 1 ELSE 0 END), 0), 2) AS pct_problem_rows_non_padding,
               ROUND(100.0e0 * COUNT(DISTINCT CASE WHEN NOT is_location_padding AND COALESCE(is_complete, FALSE) THEN round_id END) / NULLIF(COUNT(DISTINCT CASE WHEN NOT is_location_padding THEN round_id END), 0), 2) AS pct_complete_rounds,
               ROUND(100.0e0 * COUNT(DISTINCT CASE WHEN NOT is_location_padding AND COALESCE(is_nine_hole, FALSE) THEN round_id END) / NULLIF(COUNT(DISTINCT CASE WHEN NOT is_location_padding THEN round_id END), 0), 2) AS pct_nine_hole_rounds,
               ROUND(100.0e0 * COUNT(DISTINCT CASE WHEN NOT is_location_padding AND COALESCE(is_secondary, FALSE) THEN round_id END) / NULLIF(COUNT(DISTINCT CASE WHEN NOT is_location_padding THEN round_id END), 0), 2) AS pct_secondary_rounds,
               ROUND(100.0e0 * COUNT(DISTINCT CASE WHEN NOT is_location_padding AND COALESCE(is_auto_assigned, FALSE) THEN round_id END) / NULLIF(COUNT(DISTINCT CASE WHEN NOT is_location_padding THEN round_id END), 0), 2) AS pct_auto_assigned_rounds,
               ROUND(100.0e0 * SUM(CASE WHEN is_location_padding THEN 1 ELSE 0 END) / NULLIF(COUNT(*), 0), 2) AS pct_padding_rows,
               ROUND(100.0e0 * SUM(CASE WHEN is_timestamp_missing THEN 1 ELSE 0 END) / NULLIF(COUNT(*), 0), 2) AS pct_ts_missing_rows,
               ROUND(100.0e0 * SUM(CASE WHEN is_timestamp_missing AND NOT is_location_padding THEN 1 ELSE 0 END) / NULLIF(SUM(CASE WHEN NOT is_location_padding THEN 1 ELSE 0 END), 0), 2) AS pct_ts_missing_non_padding_rows
               FROM silver WHERE course_id IS NOT NULL
               GROUP BY course_id ORDER BY course_id""")),

    // §2.8 dim_course — the 5-way LEFT-join stitch (J3).
    QueryDef(
      "gm_dim_course",
      (s, d) => {
        val silver = silverOf(s, d)
        val topo = GoldQueries.syntheticTopology(s)
        val fr = GoldQueries.cachedFactRounds(s, d)
        GoldModels.dimCourse(
            silver,
            GoldModels.courseConfigurationAnalysis(fr),
            GoldModels.dataQualityOverview(silver),
            GoldModels.telemetryCompletenessSummary(silver),
            fr, topo)
          .select(
            col("course_id"), col("likely_course_type"), col("max_section_seen"),
            col("unique_start_holes"), col("pct_shotgun_starts"),
            col("course_complexity_score"),
            col("rounds_observed"), col("complete_rounds_observed"),
            col("first_round_start_ts"), col("last_round_start_ts"),
            array_join(col("playable_round_lengths").cast("array<string>"), "|")
              .as("playable_round_lengths"),
            col("data_quality_score"),
            col("pct_missing_pace"), col("pct_missing_hole_number"),
            col("total_rows"), col("padding_rows"), col("pct_padding_total"),
            array_join(col("unit_names"), "|").as("unit_names"), col("unit_count"))
          .orderBy(col("course_id"))
      },
      Some(s"""WITH ${GoldQueries.SilverSql}, ${GoldQueries.TopoSql},
               ${GoldQueries.FactRoundsSql}, ${GoldQueries2.CourseConfigSql},
               $DqSliceSql, $CompletenessSql,
               round_range AS (
                 SELECT course_id AS r_course_id,
                 COUNT(*) AS rounds_observed,
                 CAST(SUM(CASE WHEN is_complete THEN 1 ELSE 0 END) AS BIGINT) AS complete_rounds_observed,
                 MIN(round_start_ts) AS first_round_start_ts,
                 MAX(round_start_ts) AS last_round_start_ts,
                 ARRAY_TO_STRING(LIST_TRANSFORM(LIST_SORT(LIST_DISTINCT(LIST(round_length))), x -> CAST(x AS VARCHAR)), '|') AS playable_round_lengths
                 FROM fact_rounds GROUP BY course_id
               ),
               units AS (
                 SELECT facility_id AS u_course_id,
                 ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(unit_name))), '|') AS unit_names,
                 CAST(LEN(LIST_DISTINCT(LIST(unit_name))) AS INTEGER) AS unit_cnt
                 FROM topo GROUP BY facility_id
               ),
               base_courses AS (
                 SELECT DISTINCT course_id FROM silver WHERE course_id IS NOT NULL
               )
               SELECT bc.course_id, c.likely_course_type, c.max_section_seen,
               c.unique_start_holes, c.pct_shotgun_starts, c.course_complexity_score,
               r.rounds_observed, r.complete_rounds_observed,
               r.first_round_start_ts, r.last_round_start_ts, r.playable_round_lengths,
               d.data_quality_score, d.pct_missing_pace, d.pct_missing_hole_number,
               t.total_rows, t.padding_rows, t.pct_padding_total,
               u.unit_names,
               CASE WHEN u.unit_cnt IS NULL THEN 0 ELSE u.unit_cnt END AS unit_count
               FROM base_courses bc
               LEFT JOIN course_config c ON bc.course_id = c.course_id
               LEFT JOIN dq d ON bc.course_id = d.d_course_id
               LEFT JOIN tc t ON bc.course_id = t.t_course_id
               LEFT JOIN round_range r ON bc.course_id = r.r_course_id
               LEFT JOIN units u ON bc.course_id = u.u_course_id
               ORDER BY bc.course_id""")),

    // §2.8 gold_coverage_audit — silver vs gold reconciliation (J4).
    QueryDef(
      "gm_coverage_audit",
      (s, d) => {
        // The audit is the widest consumer in the corpus: SEVEN distinct
        // silver subtrees (dimCourse's dq/completeness/base plus the
        // audit's courses/rowCounts/roundCounts/holePerf), and Spark
        // cannot eliminate the LEFT-joined dimCourse builds (no
        // uniqueness info ⇒ no outer-join elimination), so un-shared
        // they are seven full synthetic-silver recomputes per run —
        // also the corpus' biggest single allocation burst (r10's
        // bimodal 8.5 s samples). localCheckpoint (NOT persist: eager,
        // per-invocation, so every bench sample pays the same one
        // materialization instead of inheriting a prior sample's cache
        // state) makes it one scan + seven in-memory reads. The global
        // silverView deliberately stays unpersisted — per-gate consumers
        // elsewhere read 2-3 pruned columns and a wide cache loses;
        // HERE the consumers collectively touch most of the width.
        val silver = silverOf(s, d).localCheckpoint()
        val topo = GoldQueries.syntheticTopology(s)
        val fr = GoldQueries.cachedFactRounds(s, d)
        val dimCourse = GoldModels.dimCourse(
          silver,
          GoldModels.courseConfigurationAnalysis(fr),
          GoldModels.dataQualityOverview(silver),
          GoldModels.telemetryCompletenessSummary(silver),
          fr, topo)
        GoldModels.goldCoverageAudit(
            silver, fr,
            GoldModels.factRoundHolePerformance(silver, topo),
            GoldModels.courseRoundsByMonth(fr),
            GoldModels.courseRoundsByWeekday(fr),
            dimCourse)
          .orderBy(col("course_id"))
      },
      Some(s"""WITH ${GoldQueries.SilverSql}, ${GoldQueries.TopoSql}, ${GoldQueries.FactRoundsSql}
               SELECT c.course_id,
               s.silver_total_rows, s.silver_padding_rows, s.silver_non_padding_rows,
               s.silver_ts_missing_rows, s.silver_ts_missing_non_padding_rows,
               s.silver_distinct_rounds_all, s.silver_distinct_rounds_non_padding,
               fr.gold_fact_rounds_rows, fr.gold_fact_rounds_distinct_rounds,
               fr.gold_fact_rounds_sum_fix_count,
               hp.gold_hole_perf_rows, hp.gold_hole_perf_distinct_rounds,
               hp.gold_hole_perf_distinct_round_hole_nine,
               sm.gold_rounds_by_month_sum_rounds, sm.gold_rounds_by_month_unknown_ts_rounds,
               sw.gold_rounds_by_weekday_sum_rounds, sw.gold_rounds_by_weekday_unknown_ts_rounds,
               1 AS gold_dim_course_present,
               CAST(3 AS INTEGER) AS unit_count
               FROM (SELECT DISTINCT course_id FROM silver WHERE course_id IS NOT NULL) c
               LEFT JOIN (
                 SELECT course_id, COUNT(*) AS silver_total_rows,
                 CAST(SUM(CASE WHEN is_location_padding THEN 1 ELSE 0 END) AS BIGINT) AS silver_padding_rows,
                 CAST(SUM(CASE WHEN NOT is_location_padding THEN 1 ELSE 0 END) AS BIGINT) AS silver_non_padding_rows,
                 CAST(SUM(CASE WHEN is_timestamp_missing THEN 1 ELSE 0 END) AS BIGINT) AS silver_ts_missing_rows,
                 CAST(SUM(CASE WHEN is_timestamp_missing AND NOT is_location_padding THEN 1 ELSE 0 END) AS BIGINT) AS silver_ts_missing_non_padding_rows,
                 COUNT(DISTINCT round_id) AS silver_distinct_rounds_all,
                 COUNT(DISTINCT CASE WHEN NOT is_location_padding THEN round_id END) AS silver_distinct_rounds_non_padding
                 FROM silver WHERE course_id IS NOT NULL GROUP BY course_id
               ) s ON c.course_id = s.course_id
               LEFT JOIN (
                 SELECT course_id, COUNT(*) AS gold_fact_rounds_rows,
                 COUNT(DISTINCT round_id) AS gold_fact_rounds_distinct_rounds,
                 CAST(SUM(fix_count) AS BIGINT) AS gold_fact_rounds_sum_fix_count
                 FROM fact_rounds GROUP BY course_id
               ) fr ON c.course_id = fr.course_id
               LEFT JOIN (
                 SELECT course_id, COUNT(*) AS gold_hole_perf_rows,
                 COUNT(DISTINCT round_id) AS gold_hole_perf_distinct_rounds,
                 COUNT(DISTINCT round_id || ':' || CAST(hole_number AS VARCHAR) || ':' || CAST(nine_number AS VARCHAR)) AS gold_hole_perf_distinct_round_hole_nine
                 FROM (
                   SELECT course_id, round_id, hole_number, nine_number FROM silver
                   WHERE is_location_padding = FALSE AND hole_number IS NOT NULL
                   GROUP BY course_id, round_id, hole_number, nine_number
                 ) GROUP BY course_id
               ) hp ON c.course_id = hp.course_id
               LEFT JOIN (
                 SELECT course_id,
                 CAST(COUNT(DISTINCT round_id) AS BIGINT) AS gold_rounds_by_month_sum_rounds,
                 CAST(COUNT(DISTINCT CASE WHEN round_start_ts IS NULL THEN round_id END) AS BIGINT) AS gold_rounds_by_month_unknown_ts_rounds
                 FROM fact_rounds GROUP BY course_id
               ) sm ON c.course_id = sm.course_id
               LEFT JOIN (
                 SELECT course_id,
                 CAST(COUNT(*) AS BIGINT) AS gold_rounds_by_weekday_sum_rounds,
                 CAST(SUM(CASE WHEN round_start_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS gold_rounds_by_weekday_unknown_ts_rounds
                 FROM fact_rounds GROUP BY course_id
               ) sw ON c.course_id = sw.course_id
               ORDER BY c.course_id"""))
  )
}
