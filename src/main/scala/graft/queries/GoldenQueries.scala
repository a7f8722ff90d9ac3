package graft.queries

import java.nio.file.Paths

import org.apache.spark.sql.functions._

import graft.gold.{GoldModels, GoldenFixture}

/** SURVEY §5's golden-number layer as a DRIVER-VISIBLE gate (round 8 —
  * previously only GoldenNumbersSpec covered it): the reference's
  * published analytics constants, reproduced from engineered raw JSON
  * through the REAL ingest→silver→gold path and hash-checked against a
  * literal oracle. The oracle is a VALUES table BY DESIGN — the claim
  * under test is "the pipeline reproduces these published constants
  * exactly", so the expected side IS the constants; any drift in the
  * explode / padding-flag / nine-derivation / gold-rollup stages moves
  * the Spark side and breaks the hash. */
object GoldenQueries {

  private val silverCache = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.sql.SparkSession, org.apache.spark.sql.DataFrame]()

  /** The fixture silver, built ONCE per session through the real
    * raw-JSON ingest path and persisted (192 rows): the gate reads it
    * from seven sub-queries (fatigue, typing, ranking, the pace pin,
    * three DQ anomalies), and without the cache each one re-ran the
    * whole ingest. One entry per session — NOT per gate run — so bench
    * traversals reuse it instead of stacking persisted copies (the
    * campaign heap-pressure hazard). */
  private def cachedSilver(
      s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    silverCache.computeIfAbsent(s, { k =>
      val work =
        Paths.get(QueryDef.oracleScratch, "golden_fixture").toString
      GoldenFixture.silver(k, work).persist()
    })

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "g1_golden_numbers",
      (s, _) => {
        val silver = cachedSilver(s)
        // fatigue factor: the reference's Trino verification query,
        // verbatim semantics (avg of per-(round, hole, nine) avg pace)
        val perf = GoldModels.factRoundHolePerformance(
          silver, GoldenFixture.emptyTopology(s))
        val fatigue = perf
          .filter(col("course_id") === "americanfalls" &&
            col("hole_number") === 5)
          .groupBy(col("nine_number"))
          .agg(avg(col("avg_pace_sec")).as("value_num"))
          .select(lit("fatigue_avg_pace").as("metric"),
            concat(lit("americanfalls_nine_"), col("nine_number"))
              .as("entity"),
            col("value_num"),
            lit(null).cast("string").as("value_str"))
        // course typing by max section seen
        val typing = GoldModels
          .courseConfigurationAnalysis(GoldModels.factRounds(silver))
          .select(lit("course_type").as("metric"),
            col("course_id").as("entity"),
            col("max_section_seen").cast("double").as("value_num"),
            col("likely_course_type").as("value_str"))
        // usability ranking: 5-course dim — one bounded collect into a
        // sorted struct array (no unpartitioned WindowExec, the house
        // rule), rank = 1-based array position
        val gaps = GoldModels.criticalColumnGaps(silver)
        val ranked = gaps
          .agg(sort_array(collect_list(struct(
            (-col("usability_score")).as("neg_score"),
            col("course_id")))).as("arr"))
          .select(posexplode(col("arr")).as(Seq("pos", "c")))
          .select(lit("usability_rank").as("metric"),
            col("c.course_id").as("entity"),
            (col("pos") + 1).cast("double").as("value_num"),
            lit(null).cast("string").as("value_str"))
        // indiancreek's published key issue: 100% missing pace_gap must
        // rate CRITICAL
        val pace = gaps.filter(col("course_id") === "indiancreek")
          .select(lit("pace_critical").as("metric"),
            col("course_id").as("entity"),
            lit(null).cast("double").as("value_num"),
            when(col("pace_data_status").contains("CRITICAL"),
              "CRITICAL").otherwise(col("pace_data_status"))
              .as("value_str"))
        // the three published DQ anomalies (round 9), each read off the
        // REAL engine surface that owns it: americanfalls' 51.6%
        // low-battery events (client_data_insights.md:10 — deviceStats),
        // indiancreek's 100% missing pace_gap (:165-180 —
        // paceGapCoverage), bradshawfarm's 13.6% missing hole numbers
        // (:182-196 — nullAnalysis)
        def anchor(df: org.apache.spark.sql.DataFrame, course: String,
            metric: String, valueCol: String) =
          df.filter(col("course_id") === course)
            .select(lit(metric).as("metric"),
              col("course_id").as("entity"),
              col(valueCol).cast("double").as("value_num"),
              lit(null).cast("string").as("value_str"))
        val anomalies = anchor(
          graft.analytics.DashboardQueries2.deviceStats(silver),
          "americanfalls", "dq_low_battery_pct", "low_battery_pct")
          .unionByName(anchor(
            graft.analytics.ExplorationQueries.paceGapCoverage(silver),
            "indiancreek", "dq_missing_pace_gap_pct", "pct_missing"))
          .unionByName(anchor(
            graft.analytics.ExplorationQueries.nullAnalysis(silver),
            "bradshawfarm", "dq_missing_hole_pct", "pct_null_hole"))
        fatigue.unionByName(typing).unionByName(ranked).unionByName(pace)
          .unionByName(anomalies)
          .orderBy(col("metric"), col("entity"))
      },
      Some("""SELECT * FROM (VALUES
              ('course_type', 'americanfalls', 24e0, '9-hole'),
              ('course_type', 'bradshawfarm', 80e0, '27-hole'),
              ('course_type', 'erinhills', 55e0, '27-hole'),
              ('course_type', 'indiancreek', 53e0, '18-hole'),
              ('course_type', 'pinehurst4', 54e0, '18-hole'),
              ('dq_low_battery_pct', 'americanfalls', 51.6e0, CAST(NULL AS VARCHAR)),
              ('dq_missing_hole_pct', 'bradshawfarm', 13.6e0, NULL),
              ('dq_missing_pace_gap_pct', 'indiancreek', 100e0, NULL),
              ('fatigue_avg_pace', 'americanfalls_nine_1', 207e0, NULL),
              ('fatigue_avg_pace', 'americanfalls_nine_2', 247e0, NULL),
              ('pace_critical', 'indiancreek', CAST(NULL AS DOUBLE), 'CRITICAL'),
              ('usability_rank', 'americanfalls', 3e0, NULL),
              ('usability_rank', 'bradshawfarm', 4e0, NULL),
              ('usability_rank', 'erinhills', 2e0, NULL),
              ('usability_rank', 'indiancreek', 5e0, NULL),
              ('usability_rank', 'pinehurst4', 1e0, NULL)
              ) AS v(metric, entity, value_num, value_str)
              ORDER BY metric, entity"""))
  )
}
