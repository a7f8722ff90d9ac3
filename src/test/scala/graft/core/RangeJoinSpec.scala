package graft.core

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Bin-and-join range join semantics vs the naive quadratic predicate:
  * the bin decomposition plus residual filter (and, for
  * interval×interval, the canonical-bin dedup) must reproduce the exact
  * BETWEEN/overlap multiset for arbitrary data and bin widths —
  * including intervals far longer or shorter than the bin, and values
  * exactly on bin edges. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  // Spark jobs per trial are slow — 15 trials of each property balance
  // coverage against suite wall-clock
  private def check(prop: Prop, n: Int = 15): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  private val pointsGen =
    Gen.listOfN(40, Gen.choose(-50.0, 150.0)).map(_.zipWithIndex)
  private val intervalsGen =
    Gen.listOfN(12, for {
      lo <- Gen.choose(-60.0, 140.0)
      len <- Gen.oneOf(Gen.choose(0.1, 3.0), Gen.choose(10.0, 80.0))
    } yield (lo, lo + len)).map(_.zipWithIndex)
  private val widthGen = Gen.oneOf(0.5, 1.0, 7.0, 25.0, 200.0)

  test("pointInInterval matches the naive BETWEEN join for arbitrary bins") {
    check(Prop.forAll(pointsGen, intervalsGen, widthGen) { (ps, is, w) =>
      val points = ps.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
      val ivs = is.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iid", "lo", "hi")
      val got = RangeJoin.pointInInterval(points, "x", ivs, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val want = points.crossJoin(ivs)
        .filter(col("x") >= col("lo") && col("x") < col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      got == want
    })
  }

  test("intervalOverlap emits each overlapping pair EXACTLY once (canonical-bin dedup)") {
    check(Prop.forAll(intervalsGen, intervalsGen, widthGen) { (as, bs, w) =>
      val a = as.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("aid", "a_lo", "a_hi")
      val b = bs.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("bid", "b_lo", "b_hi")
      val got = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", w)
        .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
      val want = a.crossJoin(b)
        .filter(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
        .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
      got == want // sorted multisets: equality fails on ANY dup or miss
    })
  }
}
