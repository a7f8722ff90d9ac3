package graft.tables

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val d0 = Date.valueOf("2020-01-01")
  private val d1 = Date.valueOf("2023-06-01")
  private val d2 = Date.valueOf("2024-02-01")

  private def dim0 = Scd2.init(
    Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
      .toDF("id", "seg", "bal"),
    lit(d0))

  test("init: every row current, open-ended, typed null effective_to") {
    val d = dim0
    assert(d.schema("effective_to").dataType ===
      d.schema("effective_from").dataType)
    assert(d.filter(col("is_current")).count() === 3)
    assert(d.filter(col("effective_to").isNotNull).count() === 0)
  }

  test("apply: change closes + reopens, no-op passes through, new key inserts") {
    val changes = Seq(
      (1L, "A2", 10.0, d1), // seg change
      (2L, "B", 20.0, d1),  // no-op resend — must NOT version
      (9L, "N", 0.0, d1))   // brand-new key
      .toDF("id", "seg", "bal", "ts")
    val out = Scd2.apply(dim0, changes, "id", Seq("seg", "bal"), "ts")
      .orderBy("id", "effective_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(3),
        Option(r.getDate(4)), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1L, "A", d0, Some(d1), false),
      (1L, "A2", d1, None, true),
      (2L, "B", d0, None, true),
      (3L, "C", d0, None, true),
      (9L, "N", d1, None, true)))
  }

  test("apply composes: second batch versions on top of the first") {
    val b1 = Seq((1L, "A2", 10.0, d1)).toDF("id", "seg", "bal", "ts")
    val b2 = Seq((1L, "A3", 11.0, d2)).toDF("id", "seg", "bal", "ts")
    val out = Scd2.apply(
      Scd2.apply(dim0, b1, "id", Seq("seg", "bal"), "ts"),
      b2, "id", Seq("seg", "bal"), "ts")
    val v1 = out.filter(col("id") === 1).orderBy("effective_from").collect()
    assert(v1.length === 3)
    assert(v1.map(_.getBoolean(5)).toSeq === Seq(false, false, true))
    assert(Option(v1(0).getDate(4)) === Some(d1))
    assert(Option(v1(1).getDate(4)) === Some(d2))
    // history is immutable: version 1 unchanged by the second apply
    assert(v1(0).getString(1) === "A" && v1(1).getString(1) === "A2")
  }

  test("asOf: point-in-time lookup picks the valid version") {
    val b1 = Seq((1L, "A2", 10.0, d1)).toDF("id", "seg", "bal", "ts")
    val versioned = Scd2.apply(dim0, b1, "id", Seq("seg", "bal"), "ts")
    val at2021 = Scd2.asOf(versioned, lit(Date.valueOf("2021-01-01")))
      .filter(col("id") === 1).collect()
    assert(at2021.length === 1 && at2021(0).getString(1) === "A")
    val at2024 = Scd2.asOf(versioned, lit(Date.valueOf("2024-01-01")))
      .filter(col("id") === 1).collect()
    assert(at2024.length === 1 && at2024(0).getString(1) === "A2")
    // boundary: the change instant belongs to the NEW version
    val atBoundary = Scd2.asOf(versioned, lit(d1))
      .filter(col("id") === 1).collect()
    assert(atBoundary(0).getString(1) === "A2")
  }

  test("null-safe change detection: null -> value and value -> null version") {
    val dim = Scd2.init(
      Seq((1L, Option.empty[String], 1.0), (2L, Some("x"), 2.0))
        .toDF("id", "seg", "bal"),
      lit(d0))
    val changes = Seq(
      (1L, Some("y"), 1.0, d1),      // null -> y : change
      (2L, Option.empty[String], 2.0, d1)) // x -> null : change
      .toDF("id", "seg", "bal", "ts")
    val out = Scd2.apply(dim, changes, "id", Seq("seg", "bal"), "ts")
    assert(out.count() === 4)
    assert(out.filter(!col("is_current")).count() === 2)
  }
}
