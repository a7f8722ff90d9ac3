package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** As-of join semantics: inclusivity at equal timestamps, greatest-tie
  * wins, payload atomicity under NULL fields, left-outer behavior.
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof picks the latest right row at or before each left row") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 12:00:00")),
      (1L, 102L, ts("2024-01-01 08:00:00")) // before any right row
    ).toDF("k", "lid", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "a"),
      (1L, ts("2024-01-01 10:00:00"), "b"), // equal ts → inclusive
      (1L, ts("2024-01-01 11:00:00"), "c")
    ).toDF("k", "ts", "payload")
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", Seq("payload"))
      .orderBy("lid").collect()
    assert(out.map(r => Option(r.getAs[String]("payload"))).toSeq ===
      Seq(Some("b"), Some("c"), None))
  }

  test("equal-timestamp right ties resolve to the greatest tie value") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L, "five"),
      (1L, ts("2024-01-01 10:00:00"), 9L, "nine"),
      (1L, ts("2024-01-01 10:00:00"), 7L, "seven")
    ).toDF("k", "ts", "rid", "payload")
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", Seq("payload"),
      rightTieCol = Some("rid")).collect()
    assert(out(0).getAs[String]("payload") === "nine")
  }

  test("NULL payload fields stay atomic — never mixed across right rows") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("k", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some("old_a"), Some("old_b")),
      (1L, ts("2024-01-01 10:00:00"), None: Option[String], Some("new_b"))
    ).toDF("k", "ts", "pa", "pb")
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", Seq("pa", "pb")).collect()
    // the matched row is the 10:00 one; its NULL pa must NOT be backfilled
    // from the 09:00 row
    assert(out(0).isNullAt(out(0).fieldIndex("pa")))
    assert(out(0).getAs[String]("pb") === "new_b")
  }

  test("NULL right timestamps and NULL keys never match (join semantics)") {
    val left = Seq(
      (Some(1L), Some(ts("2024-01-01 08:00:00")), 1L),
      (None: Option[Long], Some(ts("2024-01-01 10:00:00")), 2L),
      (Some(1L), None: Option[Timestamp], 3L)
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (Some(1L), None: Option[Timestamp], "null_ts"),   // must never carry
      (None: Option[Long], Some(ts("2024-01-01 09:00:00")), "null_key"),
      (Some(1L), Some(ts("2024-01-01 09:00:00")), "real")
    ).toDF("k", "ts", "payload")
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", Seq("payload"))
      .orderBy("lid").collect()
    // lid=1 at 08:00 precedes the only real right row (09:00) → NULL,
    // NOT the null-ts row's payload
    assert(out(0).isNullAt(out(0).fieldIndex("payload")))
    // NULL-key left never matches the NULL-key right row
    assert(out(1).isNullAt(out(1).fieldIndex("payload")))
    // NULL-ts left row precedes everything → NULL
    assert(out(2).isNullAt(out(2).fieldIndex("payload")))
  }

  test("keys never cross: other keys' right rows are invisible") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "ts")
    val right = Seq((2L, ts("2024-01-01 09:00:00"), "other"))
      .toDF("k", "ts", "payload")
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", Seq("payload")).collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(out(0).fieldIndex("payload")))
  }
}
