package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("gapFill: per-key grid spans [first, last], gaps forward-filled") {
    // key 1: obs at minute 0 and 4 (gap of 3 ticks); key 2: single obs
    val df = Seq(
      (1L, ts(0), 10.0), (1L, ts(4), 50.0),
      (2L, ts(2), 7.0))
      .toDF("k", "t", "v")
    val out = Resample.gapFill(df, "k", "t", "v", stepSec = 60L)
      .orderBy("k", "tick_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
    val e0 = ts(0).getTime / 1000
    assert(out.toSeq === Seq(
      (1L, e0, true, 10.0),
      (1L, e0 + 60, false, 10.0),
      (1L, e0 + 120, false, 10.0),
      (1L, e0 + 180, false, 10.0),
      (1L, e0 + 240, true, 50.0),
      (2L, e0 + 120, true, 7.0)))
  }

  test("gapFill: multiple observations in one bucket average; grid never crosses keys") {
    val df = Seq(
      (1L, ts(0), 10.0), (1L, Timestamp.valueOf("2024-01-01 10:00:30"), 30.0),
      (9L, ts(9), 1.0))
      .toDF("k", "t", "v")
    val out = Resample.gapFill(df, "k", "t", "v", stepSec = 60L)
    assert(out.filter(col("k") === 1L).count() === 1)
    val r1 = out.filter(col("k") === 1L).collect()(0)
    assert(r1.getDouble(3) === 20.0) // mean of the bucket
    // key 9 contributes exactly its own single tick, not key 1's span
    assert(out.filter(col("k") === 9L).count() === 1)
  }
}
