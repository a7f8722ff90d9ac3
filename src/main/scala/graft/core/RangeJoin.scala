package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Range (interval) join as an EQUI-join — the operator Spark's planner
  * lacks: `point BETWEEN lo AND hi` against a non-broadcastable interval
  * table otherwise plans BroadcastNestedLoop (fact × every interval) or
  * a cartesian.
  *
  * Bin-and-join (the Databricks range-join-hint / GeoSpark grid
  * technique, reimplemented from the public idea): pick a `binWidth`,
  * explode each interval into the bins it overlaps, map each point to
  * its ONE bin, equi-join on the bin id, re-apply the exact predicate as
  * a residual filter. The join shuffles by bin key, so it distributes
  * like any hash join; a point lands in exactly one bin, so no
  * dedup pass is needed.
  *
  * Scale knob: cost ∝ Σ ceil(len/binWidth) interval replicas + one
  * shuffle of the points. `binWidth` ≈ the MEDIAN interval length keeps
  * replication ~2× while bin populations stay balanced; a binWidth far
  * below the longest interval inflates that interval's replicas (skew
  * on the interval side), far above it piles unrelated points into one
  * bin (skew on the probe side).
  *
  * Float note: bin ids are floor(x / binWidth) computed with the SAME
  * expression on both sides, so rounding at a bin edge cannot lose a
  * match — monotone floor guarantees bin(point) always lies within
  * [bin(lo), bin(hi)] whenever lo ≤ point ≤ hi; the residual filter is
  * the exact semantics.
  */
object RangeJoin {

  private def bin(c: Column, w: Double): Column =
    floor(c.cast("double") / lit(w)).cast(LongType)

  /** Inner join of `points` rows to every `intervals` row whose
    * [lo, hi) half-open range contains the point. Output = point
    * columns ++ interval columns. */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val binned = intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol), binWidth), bin(col(hiCol), binWidth))))
    points
      .withColumn("__bin", bin(col(pointCol), binWidth))
      .join(binned, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join (half-open ranges: a overlaps b iff
    * aLo < bHi AND bLo < aHi), same bin technique — both sides explode
    * into their bins and equi-join on the bin id. Two overlapping
    * intervals share every bin their overlap spans, so the pair would
    * emit once per shared bin; the CANONICAL-BIN guard — keep only the
    * bin containing max(aLo, bLo), the overlap's start, which both
    * sides provably cover — emits each pair exactly once WITHOUT a
    * distinct shuffle. Left columns must be named differently from
    * right columns. */
  def intervalOverlap(
      a: DataFrame, aLoCol: String, aHiCol: String,
      b: DataFrame, bLoCol: String, bHiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val aBinned = a.withColumn("__bin",
      explode(sequence(bin(col(aLoCol), binWidth), bin(col(aHiCol), binWidth))))
    val bBinned = b.withColumn("__bin",
      explode(sequence(bin(col(bLoCol), binWidth), bin(col(bHiCol), binWidth))))
    aBinned.join(bBinned, Seq("__bin"))
      .filter(col(aLoCol) < col(bHiCol) && col(bLoCol) < col(aHiCol))
      .filter(col("__bin") === bin(greatest(col(aLoCol), col(bLoCol)), binWidth))
      .drop("__bin")
  }
}
