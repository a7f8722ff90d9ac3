package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.SilverEtl
import graft.ingest.SilverEtl.SilverConfig

/** Dashboard query library over the golf fixtures — the interactive
  * surface a reference user would issue (SURVEY §3.3).
  */
class DashboardQueriesSpec extends SparkSpec {

  private def res(p: String): String =
    getClass.getResource(p).toString.stripPrefix("file:")

  private lazy val topology: DataFrame =
    spark.read.option("header", true).csv(res("/golf/seeds/dim_facility_topology.csv"))

  private lazy val silver: DataFrame = {
    val json = SilverEtl.transform(
      SilverEtl.readJson(spark, res("/golf/json") + "/*.json"),
      SilverConfig("americanfalls", "2024-01-20"))._1
    val csv = SilverEtl.transform(
      SilverEtl.readCsvUnion(spark, res("/golf/csv")),
      SilverConfig("erinhills", "2024-04-05", topology = Some(topology)))._1
    json.unionByName(csv).persist()
  }

  test("overview + course summary shapes and inferred types") {
    val ov = DashboardQueries.overviewStats(silver).collect()(0)
    assert(ov.getLong(ov.fieldIndex("total_courses")) === 2L)
    assert(ov.getLong(ov.fieldIndex("total_rounds")) === 5L)
    val cs = DashboardQueries.courseSummary(silver).collect()
      .map(r => r.getString(0) -> r.getString(r.fieldIndex("inferred_type"))).toMap
    // erinhills fixture: max_hole 12 -> 18-hole; americanfalls: holes<=2,
    // sections<=4 -> 9-hole
    assert(cs("erinhills") === "18-hole")
    assert(cs("americanfalls") === "9-hole")
  }

  test("data quality composite is 0-100 and penalizes missing columns") {
    val dq = DashboardQueries.dataQualityScore(silver).collect()
    assert(dq.nonEmpty)
    dq.foreach { r =>
      val score = r.getDouble(r.fieldIndex("quality_score"))
      assert(score >= 0.0 && score <= 100.0)
    }
  }

  test("round progression classifies transitions; summary counts anomalies") {
    val prog = DashboardQueries.roundProgression(silver, "erinhills", "ca1")
      .select("location_index", "hole_transition", "section_transition").collect()
    assert(prog.length === 3)
    assert(prog(0).getString(1) === "start")
    assert(prog(1).getString(1) === "same")       // hole 1 -> hole 1
    assert(prog(1).getString(2) === "next")       // section 1 -> 2
    val summary = DashboardQueries.roundProgressionSummary(silver, "erinhills")
      .collect().map(r => r.getString(0) -> r.getLong(r.fieldIndex("hole_anomalies"))).toMap
    assert(summary.values.forall(_ === 0L))       // fixtures progress cleanly
  }

  test("nine-loop fatigue comparison separates passes on the same hole") {
    // cb1 plays hole 1 on nine 1 (pace null in fixture) — exercise shape on
    // a synthetic pace-bearing frame instead
    import spark.implicits._
    val fatigue = Seq(
      ("r1", 5, 1, 10.0), ("r1", 5, 2, 14.0),
      ("r2", 5, 1, 12.0), ("r2", 5, 2, 16.0))
      .toDF("round_id", "hole_number", "nine_number", "pace")
      .withColumn("course_id", lit("americanfalls"))
      .withColumn("is_location_padding", lit(false))
      .withColumn("is_nine_hole", lit(false))
    val out = DashboardQueries.nineLoopPaceComparison(fatigue, "americanfalls")
      .select("nine_number", "avg_pace", "pass_number").collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(out(1) === ((11.0, "first_nine")))
    assert(out(2) === ((15.0, "second_nine")))    // slower second pass = fatigue
  }

  test("pace-by-hole classifies bottleneck vs fast vs normal") {
    import spark.implicits._
    val paced = Seq(
      // hole 1 avg 10, hole 2 avg 30, hole 3 avg 20 -> course avg 20
      ("r1", 1, 10.0), ("r2", 1, 10.0),
      ("r1", 2, 30.0), ("r2", 2, 30.0),
      ("r1", 3, 20.0), ("r2", 3, 20.0))
      .toDF("round_id", "hole_number", "pace")
      .withColumn("course_id", lit("c"))
      .withColumn("is_location_padding", lit(false))
    val out = DashboardQueries.paceByHole(paced)
      .select("hole_number", "hole_category").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out === Map(1 -> "fast", 2 -> "bottleneck", 3 -> "normal"))
  }

  test("nine combinations key rounds by sorted distinct nines") {
    val combos = DashboardQueries.nineCombinations(silver, "erinhills")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // cb1 spans nines 1+2; ca1 only nine 1; ca2 only nine 2
    assert(combos === Map("1+2" -> 1L, "1" -> 1L, "2" -> 1L))
  }

  test("map points and samples are bounded and ordered") {
    val pts = DashboardQueries.roundMapPoints(silver, "americanfalls", "r1").collect()
    assert(pts.nonEmpty)
    assert(pts.map(_.getInt(0)).toSeq === pts.map(_.getInt(0)).toSeq.sorted)
    val sample = DashboardQueries.roundSample(silver, "erinhills", None, limit = 4)
    assert(sample.count() === 4)
  }

  test("part-2 surface: every query family runs over the golf fixtures") {
    import DashboardQueries2._
    // each returns a well-formed frame over the fixture silver
    val frames = Seq(
      "columnCompleteness" -> columnCompleteness(silver),
      "columnCompletenessExtended" -> columnCompletenessExtended(silver),
      "paddingAnalysis" -> paddingAnalysis(silver),
      "sectionsPerHole" -> sectionsPerHole(silver),
      "roundTypes" -> roundTypes(silver),
      "roundList" -> roundList(silver, limit = 10),
      "deviceStats" -> deviceStats(silver),
      "roundLengthDistribution" -> roundLengthDistribution(silver),
      "roundValidation" -> roundValidation(silver),
      "roundValidationSummary" -> roundValidationSummary(silver),
      "globalOverview" -> globalOverview(silver),
      "globalWeekdayHeatmap" -> globalWeekdayHeatmap(silver),
      "globalDataQualityRanking" -> globalDataQualityRanking(silver),
      "globalDeviceFleet" -> globalDeviceFleet(silver),
      "globalCompletionRates" -> globalCompletionRates(silver),
      "infrastructureStats" -> infrastructureStats(silver),
      "eventsPerCourse" -> eventsPerCourse(silver),
      "eventsByMonth" -> eventsByMonth(silver))
    frames.foreach { case (name, df) =>
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("exploration corpus runs; completeness scores bounded") {
    import ExplorationQueries._
    val ex = executiveSummary(silver).collect()(0)
    assert(ex.getLong(0) === 2L) // courses
    Seq(
      "batteryAnalysis" -> batteryAnalysis(silver),
      "paceGapCoverage" -> paceGapCoverage(silver),
      "datasetVariance" -> datasetVariance(silver),
      "nullAnalysis" -> nullAnalysis(silver),
      "nullPatternByHole" -> nullPatternByHole(silver),
      "dataCompletenessSummary" -> dataCompletenessSummary(silver)
    ).foreach { case (name, df) => assert(df.count() > 0, s"$name empty") }
    dataCompletenessSummary(silver).collect().foreach { r =>
      val s = r.getDouble(r.fieldIndex("overall_completeness_score"))
      assert(s >= 0.0 && s <= 100.0)
    }
  }

  test("part-2 semantics: padding pct, completeness bounds, quality ranking") {
    import DashboardQueries2._
    paddingAnalysis(silver).collect().foreach { r =>
      val pct = r.getDouble(r.fieldIndex("padding_pct"))
      assert(pct >= 0.0 && pct <= 100.0)
      assert(r.getLong(r.fieldIndex("padding_events")) +
        r.getLong(r.fieldIndex("real_events")) ===
        r.getLong(r.fieldIndex("total_events")))
    }
    columnCompleteness(silver).collect().foreach { r =>
      (2 until r.length).foreach { i =>
        if (!r.isNullAt(i)) {
          val v = r.getDouble(i)
          assert(v >= 0.0 && v <= 100.0, s"col $i out of range: $v")
        }
      }
    }
    val ranks = globalDataQualityRanking(silver).collect()
      .map(r => r.getInt(r.fieldIndex("quality_rank")))
    assert(ranks.head === 1)

    // profile joins: loop-course detection + coalesced type
    import spark.implicits._
    val profile = Seq(
      ("americanfalls", "9-hole-loop", true, "low", 5, 9, "seasonal"),
      ("erinhills", null.asInstanceOf[String], false, "high", 4, 10, null.asInstanceOf[String]))
      .toDF("course_id", "course_type", "is_loop_course", "volume_profile",
        "peak_season_start_month", "peak_season_end_month", "notes")
    assert(loopCourses(profile).collect().map(_.getString(0)).toSeq ===
      Seq("americanfalls"))
    val withProfile = courseSummaryWithProfile(silver, profile)
      .collect().map(r => r.getString(0) ->
        r.getString(r.fieldIndex("course_type"))).toMap
    assert(withProfile("americanfalls") === "9-hole-loop") // profile wins
    assert(withProfile("erinhills") === "18-hole") // falls back to inferred
  }
}
