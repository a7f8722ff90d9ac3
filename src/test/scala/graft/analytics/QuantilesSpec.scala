package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact two-pass quantiles vs the brute-force sorted element. */
class QuantilesSpec extends SparkSpec {

  import spark.implicits._

  private def bruteKth(values: Seq[Double], p: Double): Double = {
    val sorted = values.sorted
    val k = math.max(1L, math.ceil(p * values.size).toLong)
    sorted((k - 1).toInt)
  }

  test("two-pass quantiles equal the sorted element, duplicates included") {
    // heavy duplicate mass + a sparse tail: rank arithmetic must count
    // duplicates with multiplicity
    val values: Seq[Double] =
      Seq.fill(500)(10.0) ++ Seq.fill(300)(20.0) ++
        (1 to 200).map(i => 100.0 + i)
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val out = Quantiles.exactQuantiles2Pass(df, "v", ps, accuracy = 1000)
      .collect().map(r =>
        (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getBoolean(4)))
    assert(out.length === ps.size)
    out.foreach { case (p, n, k, v, bracketed) =>
      assert(n === values.size)
      assert(k === math.max(1L, math.ceil(p * n).toLong))
      assert(bracketed, s"p=$p not bracketed")
      assert(v === bruteKth(values, p), s"p=$p")
    }
  }

  test("two-pass quantiles: tiny inputs and p=1.0 boundary") {
    val df = Seq((1L, 42.0)).toDF("id", "v")
    val out = Quantiles.exactQuantiles2Pass(df, "v", Seq(0.5, 1.0))
      .collect().map(r => (r.getDouble(0), r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq === Seq((0.5, 42.0, true), (1.0, 42.0, true)))
    // invalid levels rejected
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles2Pass(df, "v", Seq(0.0))
    }
  }
}
