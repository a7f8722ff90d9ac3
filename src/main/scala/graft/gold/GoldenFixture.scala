package graft.gold

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.ingest.SilverEtl
import graft.ingest.SilverEtl.SilverConfig

/** Raw-JSON fixture engineered so the reference's PUBLISHED analytics
  * numbers are the exact arithmetic consequence of the telemetry,
  * shared by the g1_golden_numbers gate and GoldenNumbersSpec:
  *
  *   - fatigue factor 207 s / 247 s on americanfalls hole 5
  *     (reference PRESENTATION_NOTES.md:77-83, the Trino verification
  *     query over gold.fact_round_hole_performance);
  *   - course typing by max section 80/55/53/54/24 →
  *     27/27/18/18/9-hole (docs/learning/client_data_insights.md:222-229);
  *   - usability-score ranking pinehurst4 > erinhills > americanfalls >
  *     bradshawfarm > indiancreek (client_data_insights.md:108-114),
  *     with indiancreek's published key issue (100% missing pace_gap)
  *     surfacing as the CRITICAL pace status.
  *
  * If any stage of the real ingest→silver→gold path (explode, padding
  * flag, nine derivation, the gold rollups) drifts, the numbers move.
  */
object GoldenFixture {

  private def loc(
      hole: Option[Int], section: Int, off: Double,
      pace: Option[Double] = Some(100.0),
      paceGap: Option[Double] = Some(10.0),
      battery: Option[Double] = Some(90.0)): String = {
    val parts = Seq(
      hole.map(h => s""""hole": $h"""),
      Some(s""""holeSection": 1"""),
      Some(s""""sectionNumber": $section"""),
      Some(s""""startTime": $off"""),
      Some(s""""fixCoordinates": [-112.85, 42.78]"""),
      Some(s""""isProjected": false"""),
      Some(s""""isProblem": false"""),
      Some(s""""isCache": false"""),
      paceGap.map(p => s""""paceGap": $p"""),
      Some(s""""positionalGap": 5.5"""),
      pace.map(p => s""""pace": $p"""),
      battery.map(b => s""""batteryPercentage": $b""")).flatten
    "{" + parts.mkString(", ") + "}"
  }

  private def roundJson(
      id: String, course: String, day: Int, nine: Int, nineHole: Boolean,
      locs: Seq[String]): String =
    s"""{"_id": "$id", "course": "$course",
        "startTime": "2024-03-${f"$day%02d"}T10:00:00Z",
        "endTime": "2024-03-${f"$day%02d"}T14:00:00Z",
        "device": "tag-9", "startHole": 1, "goalTime": 14400,
        "isNineHole": $nineHole, "currentNine": $nine, "complete": true,
        "locations": [${locs.mkString(",")}]}"""

  private def silverFor(
      spark: SparkSession, workDir: String, course: String,
      rounds: Seq[String]): DataFrame = {
    val dir = Paths.get(workDir)
    Files.createDirectories(dir)
    val f = dir.resolve(s"$course.json")
    Files.writeString(f, rounds.mkString("[\n", ",\n", "\n]"))
    SilverEtl.transform(
      SilverEtl.readJson(spark, f.toString),
      SilverConfig(course, "2024-03-20"))._1
  }

  /** Filler telemetry for the americanfalls battery anomaly: events on
    * holes 1-4 / sections 1-6 (below the hole-5 fatigue rows and the
    * max-section-24 typing anchor, so neither published number moves),
    * with caller-chosen battery readings. */
  private def dqFill(batteries: Seq[Option[Double]]): Seq[String] =
    batteries.zipWithIndex.map { case (b, i) =>
      loc(Some(i % 4 + 1), i + 1, 600.0 + i * 60.0, battery = b)
    }

  private val low = Some(15.0)
  private val ok = Some(90.0)

  /** The five-course fixture silver, built through the REAL raw-JSON →
    * silver path under `workDir` (caller-scoped scratch). */
  def silver(spark: SparkSession, workDir: String): DataFrame = {
    // americanfalls (9-hole loop, max section 24): four rounds on hole
    // 5, two per nine. Per-(round, hole, nine) avg pace: 207, 207, 247,
    // 247 → the published avg-of-avgs 207 / 247. DQ anchor
    // (client_data_insights.md:10,148-156): EXACTLY 16 of the course's
    // 31 events read battery < 20 → ROUND(100·16/31, 1) = the published
    // 51.6% low-battery anomaly. Exactly two events carry a NULL battery,
    // placing the usability score (99.4) between erinhills' (99.5) and
    // bradshawfarm's (98.0) so the published ranking stays the exact
    // arithmetic consequence.
    val americanfalls = silverFor(spark, workDir, "americanfalls", Seq(
      roundJson("af1", "americanfalls", 1, 1, nineHole = true, Seq(
        loc(Some(5), 13, 0.0, pace = Some(200.0), battery = None),
        loc(Some(5), 14, 300.0, pace = Some(214.0))) ++
        dqFill(Seq(low, low, low, low, ok, ok))),
      roundJson("af2", "americanfalls", 2, 1, nineHole = true, Seq(
        loc(Some(5), 13, 0.0, pace = Some(207.0)),
        loc(Some(5), 14, 300.0, pace = Some(207.0))) ++
        dqFill(Seq(low, low, low, low, None, ok))),
      roundJson("af3", "americanfalls", 3, 2, nineHole = true, Seq(
        loc(Some(5), 13, 0.0, pace = Some(240.0)),
        loc(Some(5), 14, 300.0, pace = Some(254.0))) ++
        dqFill(Seq(low, low, low, low, ok, ok))),
      roundJson("af4", "americanfalls", 4, 2, nineHole = true, Seq(
        loc(Some(5), 23, 0.0, pace = Some(247.0)),
        loc(Some(5), 24, 300.0, pace = Some(247.0))) ++
        dqFill(Seq(low, low, low, low, ok)))))
    // erinhills (27-hole, max section 55): one battery gap in 20 events.
    val erinhills = silverFor(spark, workDir, "erinhills", Seq(
      roundJson("eh1", "erinhills", 5, 1, nineHole = false,
        (1 to 10).map(i => loc(Some(i), i, i * 60.0,
          battery = if (i == 7) None else Some(88.0)))),
      roundJson("eh2", "erinhills", 6, 3, nineHole = false,
        (46 to 55).map(i => loc(Some(i - 37), i, (i - 45) * 60.0)))))
    // indiancreek (18-hole, max section 53): pace_gap missing on EVERY
    // event — the published key issue that craters its usability score.
    val indiancreek = silverFor(spark, workDir, "indiancreek", Seq(
      roundJson("ic1", "indiancreek", 7, 2, nineHole = false,
        (46 to 53).map(i => loc(Some(i - 36), i, (i - 45) * 60.0,
          paceGap = None)))))
    // pinehurst4 (18-hole, max section 54): fully clean — the top score.
    val pinehurst4 = silverFor(spark, workDir, "pinehurst4", Seq(
      roundJson("ph1", "pinehurst4", 8, 2, nineHole = false,
        (47 to 54).map(i => loc(Some(i - 37), i, (i - 46) * 60.0)))))
    // bradshawfarm (27-hole, max section 80): the published missing-hole
    // anomaly engineered exactly — 17 of 125 events lack hole_number →
    // 13.60% at ANY rounding scale (client_data_insights.md:113,182-196;
    // the "empty location slot" class). 125 = 80 + 45 locations over two
    // rounds; section 80 appears in both, pinning the typing anchor.
    val bradshawfarm = silverFor(spark, workDir, "bradshawfarm", Seq(
      roundJson("bf1", "bradshawfarm", 9, 3, nineHole = false,
        (1 to 80).map(i => loc(
          if (i <= 17) None else Some((i - 1) % 27 + 1), i, i * 60.0))),
      roundJson("bf2", "bradshawfarm", 10, 3, nineHole = false,
        (36 to 80).map(i =>
          loc(Some((i - 1) % 27 + 1), i, (i - 35) * 60.0)))))
    Seq(americanfalls, erinhills, indiancreek, pinehurst4, bradshawfarm)
      .reduce(_ unionByName _)
  }

  /** Empty topology frame with the schema factRoundHolePerformance
    * expects — the fixture has no facility mapping. */
  def emptyTopology(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("facility_id", StringType),
        StructField("nine_number", IntegerType),
        StructField("unit_name", StringType))))
}
