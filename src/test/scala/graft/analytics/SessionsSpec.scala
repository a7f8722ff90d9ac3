package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gap-based sessionization semantics: boundary inclusivity, per-entity
  * independence, deterministic ordering ties.
  */
class SessionsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions split on gaps strictly greater than gapSec") {
    val events = Seq(
      // user 1: two events 1800s apart (exactly the gap — same session),
      // then one 1801s later (new session)
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 10:30:00")),
      (1L, 12L, ts("2024-01-01 11:00:01")),
      // user 2: one lone event
      (2L, 20L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val out = Sessions.sessionize(events, "user_id", "ts", "event_id", 1800L)
      .orderBy("user_id", "session_id").collect()
    assert(out.length === 3)
    assert(out(0).getAs[Long]("n_events") === 2) // 10:00 + 10:30 together
    assert(out(0).getAs[Long]("duration_sec") === 1800L)
    assert(out(1).getAs[Long]("n_events") === 1) // 11:00:01 alone
    assert(out(1).getAs[Long]("session_id") === 1L)
    assert(out(2).getAs[Long]("user_id") === 2L)
    assert(out(2).getAs[Long]("session_id") === 0L)
  }

  test("sessionize is NTZ-proof: TIMESTAMP_NTZ input segments identically") {
    // The round-5 testdata regeneration delivered TIMESTAMP_NTZ columns
    // and raw unix_micros is DATATYPE_MISMATCH on NTZ — sessionization
    // must work (and agree) on BOTH timestamp flavors, loader or no
    // loader.
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 10:30:00")),
      (1L, 12L, ts("2024-01-01 11:00:01")),
      (2L, 20L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val ntz = events.withColumn("ts", col("ts").cast("timestamp_ntz"))
    val tz = Sessions.sessionize(events, "user_id", "ts", "event_id", 1800L)
      .select("user_id", "session_id", "n_events", "duration_sec")
      .orderBy("user_id", "session_id").collect().toSeq
    val out = Sessions.sessionize(ntz, "user_id", "ts", "event_id", 1800L)
      .select("user_id", "session_id", "n_events", "duration_sec")
      .orderBy("user_id", "session_id").collect().toSeq
    assert(out === tz)
    assert(out.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 1L, 1L))
  }

  test("session ids are 0-based, dense, and per-entity independent") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 08:00:00")),
      (1L, 2L, ts("2024-01-01 12:00:00")),
      (1L, 3L, ts("2024-01-01 16:00:00")),
      (7L, 4L, ts("2024-01-01 08:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val ids = Sessions.withSessionId(events, "user_id", "ts", "event_id", 60L)
      .select("user_id", "event_id", "session_id")
      .orderBy("user_id", "event_id").collect()
    assert(ids.map(_.getLong(2)).toSeq === Seq(0L, 1L, 2L, 0L))
  }
}
