package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Value-level checks for the distributed-PCA operator (the corpus gate
  * l_pca_variance pins the scatter matrix and the eigen-residuals
  * against DuckDB; this spec pins the linear-algebra invariants and the
  * brute-force agreement DuckDB can't express). */
class PcaSpec extends SparkSpec {

  private lazy val vecs = Tables.load(spark, sfDir, "embeddings")

  test("jacobiEigen solves a known 2x2 symmetric system exactly") {
    val (values, vectors) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(values(0) - 3.0) < 1e-12)
    assert(math.abs(values(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    // canonical sign: largest-|coordinate| entry positive (ties break to
    // the first coordinate)
    assert(vectors(0).zip(Array(s, s)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(vectors(1).zip(Array(s, -s)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("scatterMatrix equals the brute-force centered scatter on a slice") {
    val slice = vecs.filter(col("vec_id") < 40)
    val dim = 64
    val s = Pca.scatterMatrix(slice, "embedding", dim)
    val data = slice.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = data.length
    val mean = Array.tabulate(dim)(i => data.map(_(i)).sum / n)
    for (i <- 0 until dim; j <- 0 until dim) {
      val brute = data.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum
      assert(math.abs(s(i)(j) - brute) < 1e-8,
        s"S($i)($j)=${s(i)(j)} brute=$brute")
    }
  }

  test("pcaTrain yields a descending non-negative spectrum and tight residuals") {
    val dim = 64
    val sMat = Pca.scatterMatrix(vecs, "embedding", dim)
    val (values, vectors) = Pca.jacobiEigen(sMat)
    assert(values.length == dim)
    assert(values.zip(values.tail).forall { case (a, b) => a >= b - 1e-9 },
      "eigenvalues must be non-increasing")
    assert(values.forall(_ > -1e-6), "scatter is PSD up to float error")
    val trace = (0 until dim).map(i => sMat(i)(i)).sum
    assert(math.abs(values.sum - trace) < 1e-6 * math.abs(trace),
      "eigenvalue sum must equal the trace")
    // residual + orthonormality for the top components
    for (j <- 0 until 8) {
      val b = vectors(j)
      val resid = (0 until dim).map { i =>
        math.abs(sMat(i).zip(b).map { case (x, y) => x * y }.sum - values(j) * b(i))
      }.max
      assert(resid < 1e-8, s"component $j residual $resid")
      for (k <- 0 until 8) {
        val dot = vectors(j).zip(vectors(k)).map { case (x, y) => x * y }.sum
        val want = if (j == k) 1.0 else 0.0
        assert(math.abs(dot - want) < 1e-10, s"ortho ($j,$k) = $dot")
      }
    }
  }

  test("full-rank projection is an isometry; training is deterministic") {
    val (_, basis) = Pca.pcaTrain(vecs, "embedding", dim = 64, k = 64)
    val p = Pca.pcaProject(vecs.filter(col("vec_id") < 10), "vec_id",
        "embedding", basis)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val raw = vecs.filter(col("vec_id") < 10).select("vec_id", "embedding")
      .collect().map(r =>
        r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    for (a <- raw.keys; b <- raw.keys if a < b) {
      val d0 = dist(raw(a), raw(b))
      val d1 = dist(p(a), p(b))
      assert(math.abs(d0 - d1) < 1e-6, s"($a,$b): raw $d0 vs projected $d1")
    }
    val (v1, b1) = Pca.pcaTrain(vecs, "embedding", 64, 8)
    val (v2, b2) = Pca.pcaTrain(vecs, "embedding", 64, 8)
    assert(v1.toSeq == v2.toSeq && b1.map(_.toSeq).toSeq == b2.map(_.toSeq).toSeq,
      "pcaTrain must be bit-deterministic")
  }

  test("scatterMatrix fails loudly on empty input (no silent NaN matrix)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Pca.scatterMatrix(empty, "v", dim = 4)
    }
    assert(e.getMessage.contains("empty input"))
  }

  test("scatterMatrix fails loudly on ragged vectors (no wrong centering)") {
    import spark.implicits._
    val ragged = Seq(
      (1L, Seq(1.0, 2.0, 3.0)),
      (2L, Seq(4.0, 5.0)) // one element short: per-dim counts disagree
    ).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Pca.scatterMatrix(ragged, "v", dim = 3)
    }
    assert(e.getMessage.contains("ragged"))
  }

  test("jacobiEigen large-theta guard: near-diagonal pair gets a near-zero rotation") {
    // a(p)(p) and a(q)(q) differ astronomically vs the off-diagonal:
    // theta ~ 5e155 overflows theta² to Infinity; pre-fix the stable
    // formula underflowed to ±0.0 and the `case 0.0` branch applied a
    // 45° rotation, wrecking a nearly-diagonal matrix. Post-fix the
    // asymptotic t≈1/(2θ) applies and the eigenvalues are the
    // diagonal entries (off-diagonal mass is negligible).
    val a = Array(
      Array(1e160, 1.0e-3),
      Array(1.0e-3, -1e160))
    val (values, vectors) = Pca.jacobiEigen(a)
    assert(math.abs(values(0) - 1e160) / 1e160 < 1e-12)
    assert(math.abs(values(1) + 1e160) / 1e160 < 1e-12)
    // eigenvectors stay ~axis-aligned (no spurious 45° mix-in)
    assert(math.abs(math.abs(vectors(0)(0)) - 1.0) < 1e-9)
    assert(math.abs(math.abs(vectors(1)(1)) - 1.0) < 1e-9)
  }
}
