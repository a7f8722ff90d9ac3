package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{DashboardQueries, DashboardQueries2}

/** Dashboard-surface parity gates, part 2 (d25–d45): the TAIL of the
  * reference's `dashboard/utils/queries.py` corpus. Part 1
  * ([[DashQueries]], d1–d24) gated the high-traffic families; these
  * gates close the remainder so EVERY dashboard-library function runs
  * against a DuckDB oracle — data-quality scoring, per-round detail
  * views (sample / map trace / progression), the profile-dim join
  * family, round typing/validation detail, map centroids, and the
  * global infrastructure rollups.
  *
  * Conventions as in part 1: each gate calls the REAL
  * `DashboardQueries{,2}` library function over the synthetic silver
  * mapping; detail gates pin their course/round deterministically (the
  * busiest round under the same filter on both sides, round_id
  * tie-break — the busiest round actually exercises the transition /
  * trace ladders, unlike a string-MIN pick). All silver
  * doubles are integer-valued, so sums and averages are exact under any
  * accumulation order.
  */
object DashQueries2 {

  /** Human-entered course-profile dim for the profile-join family.
    * Deliberate shape: `R` is ABSENT (exercises the LEFT-join
    * fallback-to-inferred branch), `X` is a profile row with no
    * telemetry whose type matches the `%loop%` LIKE, and `Y` has NULL
    * course_type and NULL is_loop_course (exercises the COALESCE and
    * NULL-LIKE branches). Mirrors `course_profiles` seed CSV semantics
    * (reference `pipeline/seeds/course_profiles.csv`). */
  private def syntheticProfile(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("A", Option("18-hole"), Option(false), "high", 4, 10, Option("flagship")),
      ("N", Option("9-hole-loop"), Option(true), "low", 5, 9, None: Option[String]),
      ("X", Option("par-3 loop"), Option(false), "mid", 3, 11, None: Option[String]),
      ("Y", None: Option[String], None: Option[Boolean], "low", 6, 8,
        Option("unclassified")))
      .toDF("course_id", "course_type", "is_loop_course", "volume_profile",
        "peak_season_start_month", "peak_season_end_month", "notes")
  }

  private val ProfileSql: String =
    """profile AS (
      SELECT * FROM (VALUES
        ('A', '18-hole', FALSE, 'high', 4, 10, 'flagship'),
        ('N', '9-hole-loop', TRUE, 'low', 5, 9, NULL),
        ('X', 'par-3 loop', FALSE, 'mid', 3, 11, NULL),
        ('Y', CAST(NULL AS VARCHAR), CAST(NULL AS BOOLEAN), 'low', 6, 8, 'unclassified')
      ) p(course_id, course_type, is_loop_course, volume_profile,
          peak_season_start_month, peak_season_end_month, notes)
    )"""

  /** The d18 course-summary rollup as a reusable CTE — the BODY is
    * shared with the d18 oracle ([[DashQueries.CourseSummaryBody]]) so
    * the two gates can never drift to different summary semantics. */
  private val CourseSummarySql: String =
    s"cs AS (${DashQueries.CourseSummaryBody})"

  private def pctSql(cond: String): String =
    s"ROUND(100.0e0 * SUM(CASE WHEN $cond THEN 1 ELSE 0 END) / NULLIF(COUNT(*), 0), 1)"

  /** Unrounded completeness pct for the d25 composite — parenthesized so
    * the DOUBLE op order matches Spark's `lit(100.0) * sum / count`. */
  private def rawPctSql(c: String): String =
    s"(100.0e0 * SUM(CASE WHEN $c IS NOT NULL THEN 1 ELSE 0 END) / NULLIF(COUNT(*), 0))"

  val defs: Seq[QueryDef] = Seq(

    // DATA_QUALITY_SCORE (queries.py:52-160): 16 completeness metrics +
    // GPS, weighted composite (Core 40 / Position 25 / Context 20 /
    // Device 15). The oracle reproduces the composite with the SAME
    // left-associated DOUBLE additions as the Scala reduce.
    QueryDef(
      "d25_data_quality_score",
      (s, d) =>
        DashboardQueries.dataQualityScore(GoldQueries.silverView(s, d)), {
        val metrics = Seq(
          "pace" -> "0.15", "pace_gap" -> "0.05", "positional_gap" -> "0.05",
          "fix_timestamp" -> "0.05", "hole_number" -> "0.08",
          "section_number" -> "0.08", "location_index" -> "0.05",
          "current_hole" -> "0.02", "current_hole_section" -> "0.02",
          "round_start_time" -> "0.05", "round_end_time" -> "0.05",
          "start_hole" -> "0.04", "start_section" -> "0.03",
          "is_complete" -> "0.03", "device" -> "0.10",
          "battery_percentage" -> "0.05")
        val composite = metrics
          .map { case (c, w) => s"${w}e0 * ${rawPctSql(c)}" }
          .mkString(" + ") +
          " + 0.10e0 * (100.0e0 * SUM(CASE WHEN latitude IS NOT NULL AND longitude IS NOT NULL THEN 1 ELSE 0 END) / NULLIF(COUNT(*), 0))"
        val pcts = metrics
          .map { case (c, _) =>
            s"ROUND(${rawPctSql(c)}, 1) AS ${c}_pct" }
          .mkString(", ")
        Some(s"""WITH ${GoldQueries.SilverSql}
                 SELECT course_id, COUNT(*) AS total_events,
                 ROUND($composite, 1) AS quality_score,
                 $pcts
                 FROM silver WHERE is_location_padding = FALSE
                 GROUP BY course_id ORDER BY course_id""")
      }),

    // get_round_sample (queries.py:400+): bounded fix-level sample.
    // (round_id, location_index) is a strict total order on the 'A'
    // slice, so the LIMIT's row identity is deterministic.
    QueryDef(
      "d26_round_sample",
      (s, d) =>
        DashboardQueries.roundSample(
          GoldQueries.silverView(s, d), "A", None, limit = 500),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT * FROM silver
               WHERE course_id = 'A' AND is_location_padding = FALSE
               ORDER BY round_id, location_index LIMIT 500""")),

    // get_round_map_points (queries.py:1035-1059): GPS trace of ONE
    // round. Pinned on both sides as the BUSIEST round (max mappable
    // events, round_id tie-break) — MIN(round_id) would string-sort to a
    // near-empty round and leave the trace columns untested.
    QueryDef(
      "d27_round_map_points",
      (s, d) => {
        val sv = GoldQueries.silverView(s, d)
        val rid = sv
          .filter(col("course_id") === "A" && !col("is_location_padding") &&
            col("latitude").isNotNull && col("longitude").isNotNull)
          .groupBy(col("round_id")).count()
          .orderBy(col("count").desc, col("round_id"))
          .limit(1).first().getString(0)
        DashboardQueries.roundMapPoints(sv, "A", rid)
      },
      Some(s"""WITH ${GoldQueries.SilverSql},
               pick AS (
                 SELECT round_id AS rid FROM silver
                 WHERE course_id = 'A' AND is_location_padding = FALSE
                   AND latitude IS NOT NULL AND longitude IS NOT NULL
                 GROUP BY round_id ORDER BY COUNT(*) DESC, round_id LIMIT 1
               )
               SELECT location_index, latitude, longitude, nine_number,
               hole_number, section_number, fix_timestamp, pace,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY round_id ORDER BY location_index) AS INTEGER)
                 AS event_sequence
               FROM silver
               WHERE course_id = 'A' AND round_id = (SELECT rid FROM pick)
                 AND is_location_padding = FALSE
                 AND latitude IS NOT NULL AND longitude IS NOT NULL
               ORDER BY location_index""")),

    // get_round_progression (queries.py:997-1034): W3-style LAG
    // transition classification for one round (d8 gates its per-course
    // SUMMARY; this is the event-grain detail the dashboard draws).
    QueryDef(
      "d28_round_progression",
      (s, d) => {
        val sv = GoldQueries.silverView(s, d)
        val rid = sv
          .filter(col("course_id") === "A" && !col("is_location_padding"))
          .groupBy(col("round_id")).count()
          .orderBy(col("count").desc, col("round_id"))
          .limit(1).first().getString(0)
        DashboardQueries.roundProgression(sv, "A", rid)
      },
      Some(s"""WITH ${GoldQueries.SilverSql},
               pick AS (
                 SELECT round_id AS rid FROM silver
                 WHERE course_id = 'A' AND is_location_padding = FALSE
                 GROUP BY round_id ORDER BY COUNT(*) DESC, round_id LIMIT 1
               ),
               base AS (
                 SELECT round_id, location_index, nine_number, hole_number,
                 section_number, fix_timestamp, pace,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY round_id ORDER BY location_index) AS INTEGER)
                   AS event_sequence,
                 LAG(hole_number) OVER (
                   PARTITION BY round_id ORDER BY location_index) AS prev_hole,
                 LAG(section_number) OVER (
                   PARTITION BY round_id ORDER BY location_index) AS prev_section
                 FROM silver
                 WHERE course_id = 'A' AND round_id = (SELECT rid FROM pick)
                   AND is_location_padding = FALSE
               )
               SELECT location_index, nine_number, hole_number,
               section_number, fix_timestamp, pace, event_sequence,
               CASE WHEN prev_hole IS NULL THEN 'start'
                    WHEN hole_number = prev_hole THEN 'same'
                    WHEN hole_number = prev_hole + 1 THEN 'next'
                    WHEN hole_number < prev_hole THEN 'backwards'
                    ELSE 'skip' END AS hole_transition,
               CASE WHEN prev_section IS NULL THEN 'start'
                    WHEN section_number = prev_section THEN 'same'
                    WHEN section_number = prev_section + 1 THEN 'next'
                    WHEN section_number < prev_section THEN 'backwards'
                    ELSE 'skip' END AS section_transition
               FROM base ORDER BY location_index""")),

    // COLUMN_COMPLETENESS_EXTENDED (queries.py:179-216): the 4-tier
    // 23-column completeness profile.
    QueryDef(
      "d29_column_completeness_extended",
      (s, d) =>
        DashboardQueries2.columnCompletenessExtended(
          GoldQueries.silverView(s, d)), {
        val tiers = Seq(
          "pace", "pace_gap", "positional_gap", "latitude", "longitude",
          "fix_timestamp", "hole_number", "section_number", "location_index",
          "current_hole", "current_hole_section", "round_start_time",
          "round_end_time", "start_hole", "start_section", "is_complete",
          "goal_name", "is_projected", "is_problem", "goal_time",
          "end_section", "device", "battery_percentage")
        val pcts = tiers.map { c =>
          val alias = c match {
            case "hole_number" => "hole_pct"
            case "section_number" => "section_pct"
            case "battery_percentage" => "battery_pct"
            case other => s"${other}_pct"
          }
          s"${pctSql(s"$c IS NOT NULL")} AS $alias"
        }.mkString(", ")
        Some(s"""WITH ${GoldQueries.SilverSql}
                 SELECT course_id, COUNT(*) AS total_events, $pcts
                 FROM silver WHERE is_location_padding = FALSE
                 GROUP BY course_id ORDER BY course_id""")
      }),

    // PADDING_ANALYSIS (queries.py:218-233).
    QueryDef(
      "d30_padding_analysis",
      (s, d) =>
        DashboardQueries2.paddingAnalysis(GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id, COUNT(*) AS total_events,
               CAST(SUM(CASE WHEN is_location_padding THEN 1 ELSE 0 END) AS BIGINT) AS padding_events,
               CAST(SUM(CASE WHEN is_location_padding = FALSE THEN 1 ELSE 0 END) AS BIGINT) AS real_events,
               ROUND(100.0e0 * SUM(CASE WHEN is_location_padding THEN 1 ELSE 0 END) / COUNT(*), 1) AS padding_pct
               FROM silver GROUP BY course_id
               ORDER BY padding_pct DESC""")),

    // TOPOLOGY (queries.py:235-250) over the topology dim.
    QueryDef(
      "d31_topology",
      (s, _) =>
        DashboardQueries2.topology(GoldQueries.syntheticTopology(s)),
      Some(s"""WITH ${GoldQueries.TopoSql}
               SELECT facility_id AS course_id, unit_name, nine_number,
               section_start, section_end,
               section_end - section_start + 1 AS sections_in_nine
               FROM topo ORDER BY course_id, nine_number""")),

    // COURSE_PROFILE (queries.py:252-264): the human-entered dim with
    // COALESCE'd loop flag (Y's NULL flag exercises the default).
    QueryDef(
      "d32_course_profile",
      (s, _) => DashboardQueries2.courseProfile(syntheticProfile(s)),
      Some(s"""WITH $ProfileSql
               SELECT course_id, course_type,
               COALESCE(is_loop_course, FALSE) AS is_loop_course,
               volume_profile, peak_season_start_month,
               peak_season_end_month, notes
               FROM profile ORDER BY course_id""")),

    // LOOP_COURSES (queries.py:266-276): flag OR %loop% LIKE; NULL
    // course_type must NOT match.
    QueryDef(
      "d33_loop_courses",
      (s, _) => DashboardQueries2.loopCourses(syntheticProfile(s)),
      Some(s"""WITH $ProfileSql
               SELECT course_id, course_type, notes FROM profile
               WHERE is_loop_course = TRUE OR course_type LIKE '%loop%'
               ORDER BY course_id""")),

    // COURSE_SUMMARY_WITH_PROFILE (queries.py:278-315): inferred stats
    // LEFT-joined with the profile dim; course R has NO profile row, so
    // its type falls back to the inferred one.
    QueryDef(
      "d34_course_summary_with_profile",
      (s, d) =>
        DashboardQueries2.courseSummaryWithProfile(
          GoldQueries.silverView(s, d), syntheticProfile(s)),
      Some(s"""WITH ${GoldQueries.SilverSql}, $ProfileSql, $CourseSummarySql
               SELECT cs.course_id, round_count, event_count, real_events,
               first_date, last_date, total_days, playing_days, inferred_type,
               COALESCE(p.course_type, cs.inferred_type) AS course_type,
               COALESCE(p.is_loop_course, FALSE) AS is_loop_course,
               p.volume_profile, p.notes
               FROM cs LEFT JOIN profile p USING (course_id)
               ORDER BY cs.course_id""")),

    // SECTIONS_PER_HOLE (queries.py:317-338) — computed from telemetry.
    QueryDef(
      "d35_sections_per_hole",
      (s, d) =>
        DashboardQueries2.sectionsPerHole(GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id, hole_number,
               MIN(section_number) AS section_start,
               MAX(section_number) AS section_end,
               COUNT(DISTINCT section_number) AS sections_count,
               CASE WHEN MIN(section_number) IS NOT NULL
                     AND MAX(section_number) IS NOT NULL
                    THEN MAX(section_number) - MIN(section_number) + 1
               END AS section_range
               FROM silver
               WHERE is_location_padding = FALSE
                 AND hole_number IS NOT NULL AND section_number IS NOT NULL
               GROUP BY course_id, hole_number
               ORDER BY course_id, hole_number""")),

    // SECTIONS_PER_HOLE_DIM (queries.py:340-354) — over the precomputed
    // dim (a VALUES fixture, independent of the telemetry-derived d35).
    QueryDef(
      "d36_sections_per_hole_dim",
      (s, _) => {
        import s.implicits._
        val dim = Seq(
          ("A", 1, 1, 3, 3), ("A", 2, 4, 6, 3),
          ("N", 1, 1, 2, 2), ("R", 9, 10, 18, 5))
          .toDF("course_id", "hole_number", "section_start", "section_end",
            "sections_count")
        DashboardQueries2.sectionsPerHoleDim(dim)
      },
      Some("""WITH dim AS (
                SELECT * FROM (VALUES
                  ('A', 1, 1, 3, 3), ('A', 2, 4, 6, 3),
                  ('N', 1, 1, 2, 2), ('R', 9, 10, 18, 5)
                ) t(course_id, hole_number, section_start, section_end, sections_count)
              )
              SELECT course_id, hole_number, section_start, section_end,
              sections_count,
              section_end - section_start + 1 AS section_range
              FROM dim ORDER BY course_id, hole_number""")),

    // ROUND_TYPES (queries.py:356-377): round-grain flags rolled to
    // course; NULL start_hole rounds do NOT count as shotgun starts.
    QueryDef(
      "d37_round_types",
      (s, d) =>
        DashboardQueries2.roundTypes(GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql},
               rt AS (
                 SELECT course_id, round_id,
                 MAX(CAST(is_nine_hole AS INTEGER)) AS is_nine_hole,
                 MAX(CAST(is_complete AS INTEGER)) AS is_complete,
                 MIN(start_hole) AS start_hole
                 FROM silver GROUP BY course_id, round_id
               )
               SELECT course_id, COUNT(*) AS total_rounds,
               CAST(SUM(CASE WHEN is_nine_hole = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nine_hole_rounds,
               CAST(SUM(CASE WHEN is_nine_hole = 0 THEN 1 ELSE 0 END) AS BIGINT) AS full_rounds,
               CAST(SUM(CASE WHEN is_complete = 1 THEN 1 ELSE 0 END) AS BIGINT) AS complete_rounds,
               CAST(SUM(CASE WHEN start_hole != 1 THEN 1 ELSE 0 END) AS BIGINT) AS shotgun_starts
               FROM rt GROUP BY course_id ORDER BY course_id""")),

    // ROUND_LIST (queries.py:424-440). The library LIMIT is a parameter;
    // the gate passes MaxValue so the hash pins the FULL listing rather
    // than a tie-broken prefix (round_date has massive ties at min-date
    // grain, so any finite cut would be nondeterministic).
    QueryDef(
      "d38_round_list",
      (s, d) =>
        DashboardQueries2.roundList(
          GoldQueries.silverView(s, d), limit = Int.MaxValue),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id, round_id,
               MIN(event_date) AS round_date, COUNT(*) AS event_count
               FROM silver WHERE is_location_padding = FALSE
               GROUP BY course_id, round_id
               ORDER BY course_id, round_date DESC""")),

    // COURSE_CENTROIDS (queries.py:468-483): one map point per course.
    QueryDef(
      "d39_course_centroids",
      (s, d) =>
        DashboardQueries2.courseCentroids(GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id,
               ROUND(AVG(latitude), 6) AS latitude,
               ROUND(AVG(longitude), 6) AS longitude,
               COUNT(*) AS event_count,
               CAST(SUM(CASE WHEN is_projected THEN 1 ELSE 0 END) AS BIGINT) AS projected_events
               FROM silver
               WHERE is_location_padding = FALSE
                 AND latitude IS NOT NULL AND longitude IS NOT NULL
               GROUP BY course_id ORDER BY course_id""")),

    // get_course_topology_map_points (queries.py:485-517): (nine, hole,
    // section) centroids for one course's map.
    QueryDef(
      "d40_course_topology_map_points",
      (s, d) =>
        DashboardQueries2.courseTopologyMapPoints(
          GoldQueries.silverView(s, d), "A"),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT course_id, nine_number, hole_number, section_number,
               ROUND(AVG(latitude), 6) AS latitude,
               ROUND(AVG(longitude), 6) AS longitude,
               COUNT(*) AS event_count,
               CAST(SUM(CASE WHEN is_projected THEN 1 ELSE 0 END) AS BIGINT) AS projected_events,
               ROUND(100.0e0 * SUM(CASE WHEN is_projected THEN 1 ELSE 0 END) / COUNT(*), 1) AS projected_pct
               FROM silver
               WHERE course_id = 'A' AND is_location_padding = FALSE
                 AND latitude IS NOT NULL AND longitude IS NOT NULL
                 AND nine_number IS NOT NULL AND hole_number IS NOT NULL
                 AND section_number IS NOT NULL
               GROUP BY course_id, nine_number, hole_number, section_number
               ORDER BY nine_number, hole_number, section_number""")),

    // ROUND_VALIDATION (queries.py:664-742): the per-round detail the
    // d1 summary rolls up — duration / sequence / events / pace CASE
    // ladders at round grain.
    QueryDef(
      "d41_round_validation",
      (s, d) =>
        DashboardQueries2.roundValidation(DashQueries.durSilver(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}, ${DashQueries.DurSql},
               rv AS (
                 SELECT course_id, round_id,
                 MAX(round_duration_minutes) AS duration_minutes,
                 MIN(start_hole) AS start_hole,
                 MIN(hole_number) AS min_hole,
                 MAX(hole_number) AS max_hole,
                 COUNT(DISTINCT hole_number) AS holes_visited,
                 COUNT(DISTINCT section_number) AS sections_visited,
                 COUNT(*) AS event_count,
                 CAST(SUM(CASE WHEN is_location_padding = FALSE THEN 1 ELSE 0 END) AS BIGINT) AS real_events,
                 MAX(CAST(is_complete AS INTEGER)) AS is_complete,
                 MAX(CAST(is_nine_hole AS INTEGER)) AS is_nine_hole,
                 CAST(SUM(CASE WHEN pace IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS events_with_pace
                 FROM dur GROUP BY course_id, round_id
               )
               SELECT *,
               CASE WHEN duration_minutes IS NULL THEN FALSE
                    WHEN is_nine_hole = 1 AND duration_minutes BETWEEN 45 AND 200 THEN TRUE
                    WHEN is_nine_hole = 0 AND duration_minutes BETWEEN 90 AND 400 THEN TRUE
                    ELSE FALSE END AS duration_valid,
               CASE WHEN start_hole IS NULL THEN FALSE
                    WHEN min_hole IS NULL THEN FALSE
                    WHEN start_hole > 1 AND min_hole = start_hole THEN TRUE
                    WHEN start_hole = 1 AND min_hole = 1 THEN TRUE
                    ELSE FALSE END AS sequence_valid,
               CASE WHEN real_events < 10 THEN FALSE
                    WHEN is_nine_hole = 1 AND real_events >= 9 THEN TRUE
                    WHEN is_nine_hole = 0 AND real_events >= 18 THEN TRUE
                    ELSE FALSE END AS events_valid,
               CASE WHEN events_with_pace = 0 THEN FALSE
                    WHEN CAST(events_with_pace AS DOUBLE) / NULLIF(real_events, 0) >= 0.5e0 THEN TRUE
                    ELSE FALSE END AS pace_valid
               FROM rv ORDER BY course_id, round_id""")),

    // GLOBAL_OVERVIEW (queries.py:1125-1141): the one-row landing tile.
    QueryDef(
      "d42_global_overview",
      (s, d) =>
        DashboardQueries2.globalOverview(GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT
               COUNT(DISTINCT course_id) AS total_courses,
               COUNT(DISTINCT round_id) AS total_rounds,
               COUNT(*) AS total_events,
               CAST(SUM(CASE WHEN is_location_padding = FALSE THEN 1 ELSE 0 END) AS BIGINT) AS real_events,
               COUNT(DISTINCT device) AS unique_devices,
               MIN(event_date) AS earliest_date,
               MAX(event_date) AS latest_date,
               COUNT(DISTINCT event_date) AS total_playing_days,
               ROUND(AVG(pace), 1) AS global_avg_pace,
               ROUND(AVG(battery_percentage), 1) AS global_avg_battery
               FROM silver WHERE is_location_padding = FALSE""")),

    // GLOBAL_DATA_QUALITY_RANKING (queries.py:1223-1249): 4-metric
    // average + rank (the library computes rank via a broadcast
    // self-join, no WindowExec; the oracle's RANK() pins equivalence).
    QueryDef(
      "d43_global_data_quality_ranking",
      (s, d) =>
        DashboardQueries2.globalDataQualityRanking(
          GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql},
               m AS (
                 SELECT course_id, COUNT(*) AS total_events,
                 ${pctSql("pace IS NOT NULL")} AS pace_completeness,
                 ${pctSql("latitude IS NOT NULL AND longitude IS NOT NULL")} AS gps_completeness,
                 ${pctSql("hole_number IS NOT NULL")} AS hole_completeness,
                 ${pctSql("fix_timestamp IS NOT NULL")} AS timestamp_completeness
                 FROM silver WHERE is_location_padding = FALSE
                 GROUP BY course_id
               )
               SELECT course_id, total_events, pace_completeness,
               gps_completeness, hole_completeness, timestamp_completeness,
               ROUND((pace_completeness + gps_completeness +
                 hole_completeness + timestamp_completeness) / 4, 1)
                 AS avg_quality_score,
               CAST(RANK() OVER (ORDER BY
                 (pace_completeness + gps_completeness +
                  hole_completeness + timestamp_completeness) / 4 DESC)
                 AS INTEGER) AS quality_rank
               FROM m ORDER BY quality_rank""")),

    // INFRASTRUCTURE_STATS (queries.py:1579-1591): unfiltered totals
    // (padding INCLUDED — this is the ops view, not the analytics one).
    QueryDef(
      "d44_infrastructure_stats",
      (s, d) =>
        DashboardQueries2.infrastructureStats(GoldQueries.silverView(s, d)),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT
               COUNT(DISTINCT course_id) AS total_courses,
               COUNT(DISTINCT round_id) AS total_rounds,
               COUNT(*) AS total_events,
               CAST(SUM(CASE WHEN is_location_padding = FALSE THEN 1 ELSE 0 END) AS BIGINT) AS real_events,
               MIN(event_date) AS earliest_date,
               MAX(event_date) AS latest_date,
               COUNT(DISTINCT event_date) AS total_days,
               COUNT(DISTINCT ingest_date) AS ingest_batches
               FROM silver""")),

    // EVENTS_BY_MONTH (queries.py:1609-1623): ingest-volume trend.
    QueryDef(
      "d45_events_by_month",
      (s, d) =>
        DashboardQueries2.eventsByMonth(
          GoldQueries.silverView(s, d)
            .withColumn("event_year", year(col("event_date")))
            .withColumn("event_month", month(col("event_date")))),
      Some(s"""WITH ${GoldQueries.SilverSql}
               SELECT
               CAST(EXTRACT(YEAR FROM event_date) AS INTEGER) AS event_year,
               CAST(EXTRACT(MONTH FROM event_date) AS INTEGER) AS event_month,
               COUNT(DISTINCT course_id) AS courses_active,
               COUNT(DISTINCT round_id) AS rounds,
               COUNT(*) AS events
               FROM silver WHERE event_date IS NOT NULL
               GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
