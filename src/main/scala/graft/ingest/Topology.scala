package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Topology inference (SURVEY §2.10 M9 + §2.4 A1–A3): derive each course's
  * nine/unit structure from telemetry instead of configuration.
  * Re-expression of `pipeline/scripts/dimensions.py:45-292` and
  * `pipeline/scripts/generate_sections_per_hole.py:30-61`.
  *
  * The driver-side loop only ever touches per-course AGGREGATES (≤ ~120
  * section rows per course, bounded by physical course size — not data
  * volume), so it scales to any fix count; the heavy lifting (groupBys)
  * stays distributed.
  */
object Topology {

  final case class Nine(nineNumber: Int, sectionStart: Int, sectionEnd: Int)
  final case class CourseTopology(courseId: String, courseType: String, nines: Seq[Nine])

  /** Course typing from observed maxima (dimensions.py:45-54). */
  def inferCourseType(maxHole: Int, maxSection: Int): String =
    if (maxHole >= 10) "18-hole"
    else if (maxSection > 54) "27-hole"
    else if (maxSection > 27) "18-hole-loop"
    else "9-hole"

  /** Valid fixes for inference: non-padding with hole AND section
    * (dimensions.py:249-253). */
  def validFixes(silver: DataFrame): DataFrame =
    silver.filter(
      col("is_location_padding") === false &&
        col("hole_number").isNotNull && col("section_number").isNotNull)
      .select(col("course_id"), col("hole_number"), col("section_number"))

  /** Strategy A — continuous hole numbers: nine = hole band, bounds from
    * min/max section within the band (dimensions.py:57-109). */
  def ninesFromHoles(courseDf: DataFrame, maxHole: Int): Seq[Nine] = {
    val bands = Seq((1, 1, 9), (2, 10, 18), (3, 19, 27))
      .filter { case (n, lo, _) => n == 1 || maxHole >= lo }
    bands.flatMap { case (nine, lo, hi) =>
      val r = courseDf
        .filter(col("hole_number") >= lo && col("hole_number") <= hi)
        .agg(min(col("section_number")).as("s"), max(col("section_number")).as("e"))
        .collect()(0)
      if (r.isNullAt(0)) None
      else Some(Nine(nine, r.getInt(0), r.getInt(1)))
    }
  }

  /** Strategy B — hole numbers reset 1..9 per nine: find the dominant hole
    * per section (deterministic max_by, the survey's mode() rewrite),
    * detect resets (prev ≥ 7 → cur ≤ 3), convert boundaries to ranges
    * (dimensions.py:112-158). The collect is over ≤ ~120 section rows. */
  def ninesFromSections(courseDf: DataFrame, maxSection: Int): Seq[Nine] = {
    val sectionHoles = courseDf
      .groupBy(col("section_number"), col("hole_number"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("section_number"))
      .agg(
        max_by(col("hole_number"), struct(col("c"), -col("hole_number")))
          .as("dominant_hole"),
        sum(col("c")).as("fix_count"))
      .filter(col("fix_count") >= 5)
      .orderBy(col("section_number"))
      .collect()

    if (sectionHoles.isEmpty) return Seq(Nine(1, 1, maxSection))

    val sections = sectionHoles.map(r =>
      (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
    var boundaries = Vector(sections.head._1)
    var prevHole: Option[Int] = None
    sections.foreach { case (section, hole) =>
      (prevHole, hole) match {
        case (Some(p), Some(c)) if p >= 7 && c <= 3 => boundaries :+= section
        case _ =>
      }
      prevHole = hole
    }
    boundaries :+= sections.last._1 + 1
    val sorted = boundaries.distinct.sorted
    sorted.sliding(2).zipWithIndex.flatMap {
      case (Seq(start, next), i) if next - 1 >= start => Some(Nine(i + 1, start, next - 1))
      case _ => None
    }.toSeq.take(4) // max 4 nines (dimensions.py:158)
  }

  /** Full inference for one course (dimensions.py:161-187). */
  def inferForCourse(courseId: String, courseDf: DataFrame): CourseTopology = {
    val stats = courseDf.agg(
      max(col("hole_number")).as("max_hole"),
      max(col("section_number")).as("max_section"),
      min(col("section_number")).as("min_section")).collect()(0)
    val maxHole = if (stats.isNullAt(0)) 0 else stats.getInt(0)
    val maxSection = if (stats.isNullAt(1)) 0 else stats.getInt(1)
    val minSection = if (stats.isNullAt(2)) 1 else stats.getInt(2)

    var courseType = inferCourseType(maxHole, maxSection)
    var nines = courseType match {
      case "18-hole" => ninesFromHoles(courseDf, maxHole)
      case "27-hole" | "18-hole-loop" =>
        val n = ninesFromSections(courseDf, maxSection)
        if (courseType == "18-hole-loop" && n.size == 1) courseType = "9-hole"
        n
      case _ => Seq(Nine(1, minSection, maxSection))
    }
    if (nines.isEmpty) nines = Seq(Nine(1, minSection, maxSection))
    CourseTopology(courseId, courseType, nines)
  }

  /** Unit naming (dimensions.py:190-199). */
  def unitName(nineNumber: Int, totalNines: Int): String = totalNines match {
    case 1 => "Course"
    case 2 => if (nineNumber == 1) "Front Nine" else "Back Nine"
    case 3 => Map(1 -> "Front Nine", 2 -> "Middle Nine", 3 -> "Back Nine")
      .getOrElse(nineNumber, s"Nine $nineNumber")
    case _ => s"Nine $nineNumber"
  }

  /** Infer topology rows for every course with ≥ minFixes valid fixes
    * (dimensions.py:241-292). Returns the dim_facility_topology shape. */
  def buildTopology(spark: SparkSession, silver: DataFrame, minFixes: Long = 100)
      : DataFrame = {
    import spark.implicits._
    val valid = validFixes(silver).persist()
    try {
      val courses = valid.groupBy(col("course_id")).count()
        .filter(col("count") >= minFixes)
        .select(col("course_id")).orderBy(col("course_id"))
        .collect().map(_.getString(0))
      val rows = courses.flatMap { courseId =>
        val topo = inferForCourse(courseId, valid.filter(col("course_id") === courseId))
        topo.nines.map { n =>
          (courseId, n.nineNumber, unitName(n.nineNumber, topo.nines.size),
            n.nineNumber, n.sectionStart, n.sectionEnd)
        }
      }
      rows.toSeq.toDF(
        "facility_id", "unit_id", "unit_name", "nine_number",
        "section_start", "section_end")
    } finally { valid.unpersist(); () }
  }

  /** A1 — dim_sections_per_hole: per (course, hole) section ranges
    * (generate_sections_per_hole.py:30-61). */
  def sectionsPerHole(silver: DataFrame): DataFrame =
    silver.filter(
        col("is_location_padding") === false &&
          col("hole_number").isNotNull && col("section_number").isNotNull)
      .groupBy(col("course_id"), col("hole_number"))
      .agg(
        min(col("section_number")).as("section_start"),
        max(col("section_number")).as("section_end"),
        countDistinct(col("section_number")).as("sections_count"))
}
