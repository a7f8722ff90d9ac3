package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series regularization: resample an irregular event stream onto a
  * fixed per-key tick grid and forward-fill the gaps — the standard
  * telemetry prep before rate comparisons, moving averages, or model
  * features (irregular GPS fixes → one row per round per interval).
  *
  * Shape at scale: the tick grid is generated DISTRIBUTED — one
  * `sequence()` array per key from that key's own [min, max] span,
  * exploded on the executors (never a driver loop, never a global
  * calendar join); observations pre-aggregate to the grid grain
  * (map-side combined), the grid left-joins them by (key, tick) — one
  * shuffle each side — and the forward fill is a per-key running
  * `last(ignoreNulls)` window, partitioned by key. Grid size is
  * span/step rows per key, so the only sizing knob a 100 TB caller
  * tunes is the step.
  */
object Resample {

  /** Epoch seconds of `ts` floored to the `stepSec` grid. */
  def tickOf(ts: Column, stepSec: Long): Column =
    (floor(unix_timestamp(ts) / stepSec) * stepSec).cast(LongType)

  /** Resample `df` to one row per (key, tick): `avg_value` is the
    * decimal-accumulated mean of the observations in that bucket (null
    * for empty ticks), `value_filled` forward-fills the last seen mean,
    * `has_obs` marks real data vs fill. Grid spans each key's own
    * [first, last] observation, inclusive. */
  def gapFill(
      df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      stepSec: Long): DataFrame = {
    val tick = tickOf(col(tsCol), stepSec)
    val obs = df
      .groupBy(col(keyCol), tick.as("tick_s"))
      .agg(
        (sum(col(valCol).cast(DecimalType(18, 6))).cast(DoubleType) /
          count(col(valCol))).as("avg_value"))
    val grid = df
      .groupBy(col(keyCol))
      .agg(min(tick).as("t0"), max(tick).as("t1"))
      .select(col(keyCol),
        explode(sequence(col("t0"), col("t1"), lit(stepSec))).as("tick_s"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("tick_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "tick_s"), "left")
      .select(
        col(keyCol), col("tick_s"),
        col("avg_value").isNotNull.as("has_obs"),
        last(col("avg_value"), ignoreNulls = true).over(w).as("value_filled"))
  }
}
