package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Verify.negZeroCount — the harness scan added after d16, where a rounded
  * ±1e-14 difference emitted IEEE -0.0 on one engine and +0.0 on the other
  * and the driver's bit-level hash split them. */
class NegZeroSpec extends SparkSpec {

  test("negZeroCount detects -0.0 in double and float columns") {
    import spark.implicits._
    val df = Seq((-0.0d, 0.0f), (0.0d, -0.0f), (1.5d, 2.5f)).toDF("d", "f")
    assert(graft.Verify.negZeroCount(df) === 2L)
  }

  test("negZeroCount is 0 for clean numeric and non-numeric frames") {
    import spark.implicits._
    assert(graft.Verify.negZeroCount(Seq(0.0d, 1.0d, -1.0d).toDF("d")) === 0L)
    assert(graft.Verify.negZeroCount(Seq("x", "y").toDF("s")) === 0L)
    assert(graft.Verify.negZeroCount(Seq(0.0d).toDF("d").limit(0)) === 0L)
  }

  test("+ 0.0 normalizes a -0.0 double to +0.0 (IEEE)") {
    import spark.implicits._
    // Spark's round() routes through BigDecimal and never emits -0.0;
    // DuckDB's ROUND preserves the sign bit, which is why d16 needed the
    // `+ 0e0` on the ORACLE side. The Spark-side `+ lit(0.0)` is the
    // defensive mirror, asserted here: -0.0 + 0.0 = +0.0.
    val row = Seq(-0.0d).toDF("x")
      .select(col("x").cast("string").as("raw"),
        (col("x") + lit(0.0)).cast("string").as("norm"))
      .head()
    assert(row.getString(0) === "-0.0")
    assert(row.getString(1) === "0.0")
  }
}
