package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's PUBLISHED analytics numbers, reproduced end-to-end
  * through the REAL ingest→silver→gold path from raw JSON engineered to
  * produce them — the "golden numbers in docs" oracle layer (SURVEY §5).
  * The fixture lives in [[GoldenFixture]] (main sources) because the
  * g1_golden_numbers gate hash-checks the same constants against the
  * driver's DuckDB oracle; this spec keeps the assertion-level coverage
  * (exact maps, orderings, status text) that a hash can't articulate. */
class GoldenNumbersSpec extends SparkSpec {

  private lazy val silver: DataFrame = GoldenFixture.silver(
    spark,
    java.nio.file.Files.createTempDirectory("golden").toString).persist()

  test("fatigue factor: americanfalls hole 5 averages 207s / 247s by nine") {
    val perf = GoldModels.factRoundHolePerformance(
      silver, GoldenFixture.emptyTopology(spark))
    // the reference's Trino verification query, verbatim semantics
    val fatigue = perf
      .filter(col("course_id") === "americanfalls" && col("hole_number") === 5)
      .groupBy(col("nine_number"))
      .agg(avg(col("avg_pace_sec")).as("avg_pace"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(fatigue === Map(1 -> 207.0, 2 -> 247.0),
      s"published fatigue numbers not reproduced: $fatigue")
  }

  test("course typing: max sections 80/55/53/54/24 -> 27/27/18/18/9-hole") {
    val config = GoldModels.courseConfigurationAnalysis(
      GoldModels.factRounds(silver))
      .select("course_id", "likely_course_type", "max_section_seen")
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(config("bradshawfarm") === (("27-hole", 80)))
    assert(config("erinhills") === (("27-hole", 55)))
    assert(config("indiancreek") === (("18-hole", 53)))
    assert(config("pinehurst4") === (("18-hole", 54)))
    assert(config("americanfalls") === (("9-hole", 24)))
  }

  test("usability ranking matches the published order; indiancreek pace CRITICAL") {
    val gaps = GoldModels.criticalColumnGaps(silver)
      .select("course_id", "usability_score", "pace_data_status")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    val byScore = gaps.sortBy(-_._2).map(_._1).toSeq
    assert(byScore === Seq(
      "pinehurst4", "erinhills", "americanfalls", "bradshawfarm", "indiancreek"),
      s"published usability ranking not reproduced: ${gaps.toSeq}")
    val ic = gaps.find(_._1 == "indiancreek").get
    assert(ic._3.contains("CRITICAL"),
      s"indiancreek's 100% missing pace_gap must rate CRITICAL: ${ic._3}")
    // scores are percentages
    gaps.foreach { case (_, s, _) => assert(s <= 100.0) }
  }

  test("published DQ anomalies: 51.6% low battery, 100% missing pace_gap, 13.6% missing holes") {
    // americanfalls battery anomaly (client_data_insights.md:10,148-156)
    val battery = graft.analytics.DashboardQueries2.deviceStats(silver)
      .filter(col("course_id") === "americanfalls")
      .select("low_battery_pct").head.getDouble(0)
    assert(battery === 51.6, s"published 51.6% low battery, got $battery")
    // indiancreek pace_gap anomaly (:165-180)
    val paceGap = graft.analytics.ExplorationQueries.paceGapCoverage(silver)
      .filter(col("course_id") === "indiancreek")
      .select("pct_missing").head.getDouble(0)
    assert(paceGap === 100.0, s"published 100% missing pace_gap, got $paceGap")
    // bradshawfarm hole-number anomaly (:182-196); 17/125 is exact at any
    // rounding scale
    val holes = graft.analytics.ExplorationQueries.nullAnalysis(silver)
      .filter(col("course_id") === "bradshawfarm")
      .select("pct_null_hole").head.getDouble(0)
    assert(holes === 13.6, s"published 13.6% missing holes, got $holes")
  }
}
