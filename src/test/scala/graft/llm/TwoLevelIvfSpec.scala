package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Quality pins for the two-level (IVF-in-IVF) quantizer — the >64-cell
  * auto-k path GraphQueries switches to at scale, which verify-scale
  * corpora (kk ≤ 20) never exercise through a hash-checked gate. These
  * specs run a seeded >64-cell corpus through BOTH quantizers and fail
  * if the two-level path's assignment quality degrades beyond stated
  * bounds vs flat — speed was measured at ×100 (slope 1.41 → fixed);
  * this is the quality side of that trade.
  */
class TwoLevelIvfSpec extends SparkSpec {

  private val dim = 8
  private val kCells = 100 // > the 64-cell gate threshold

  /** Seeded corpus: 2,000 vectors in `dim` dims drawn around `kCells`
    * well-separated cluster centers (centers on a coarse integer grid,
    * ±0.05 jitter) — a shape where a sane quantizer's cells track the
    * true clusters and quantization error is a meaningful metric. */
  private lazy val corpus: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(kCells)(
      Array.fill(dim)((rnd.nextInt(10) * 2).toDouble))
    (0L until 2000L).map { i =>
      val c = centers(rnd.nextInt(kCells))
      (i, c.map(x => (x + (rnd.nextDouble() - 0.5) * 0.1).toFloat).toSeq)
    }
  }

  private lazy val df = {
    import spark.implicits._
    corpus.toDF("id", "v")
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private lazy val flat =
    Similarity.trainIvfCentroids(df, "v", kCells, sampleSize = 2000)
  private lazy val twoLevel =
    Similarity.trainTwoLevelIvf(df, "v", kCells, sampleSize = 2000)

  /** (assignment column, effective-centroid lookup) for either path. */
  private def quantError(assigned: Map[Long, Int],
      centroidOf: Int => Array[Double]): Double = {
    val errs = corpus.map { case (id, v) =>
      sqDist(v.map(_.toDouble).toArray, centroidOf(assigned(id)))
    }
    errs.sum / errs.length
  }

  private lazy val flatAssign: Map[Long, Int] =
    Similarity.withIvfList(df, "v", flat)
      .select(col("id"), col("__ivf_list"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private lazy val (coarse, subs) = twoLevel
  private lazy val k2max = subs.map(_.length).max
  private lazy val tlAssign: Map[Long, Int] =
    Similarity.withTwoLevelIvfList(df, "v", coarse, subs)
      .select(col("id"), col("__ivf_list"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("distributed two-level assignment matches driver recomputation") {
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int =
      cs.zipWithIndex.minBy { case (c, i) => (sqDist(v, c), i) }._2
    corpus.foreach { case (id, vf) =>
      val v = vf.map(_.toDouble).toArray
      val c = nearest(v, coarse)
      val s = nearest(v, subs(c))
      assert(tlAssign(id) === c * k2max + s,
        s"codegen NearestCentroidTwoLevel diverged from driver math at id=$id")
    }
  }

  test("two-level quantization error stays within 1.5x of flat") {
    val flatErr = quantError(flatAssign, flat(_))
    val tlErr = quantError(tlAssign,
      lid => subs(lid / k2max)(lid % k2max))
    assert(tlErr <= flatErr * 1.5 + 1e-12,
      s"two-level mean sq error $tlErr vs flat $flatErr — neighborhoods degraded")
  }

  test("two-level cell balance stays comparable to flat") {
    def balance(a: Map[Long, Int]): Double = {
      val sizes = a.values.groupBy(identity).map(_._2.size)
      sizes.max.toDouble * sizes.size / a.size
    }
    val bFlat = balance(flatAssign)
    val bTl = balance(tlAssign)
    // max-cell / mean-cell skew ratio: the two-level split must not
    // concentrate the corpus into few mega-cells (that would undo the
    // partition-pruning the quantizer exists for)
    assert(bTl <= math.max(bFlat * 3.0, 10.0),
      s"two-level skew $bTl vs flat $bFlat")
    // and it must actually use a comparable number of cells
    val nFlat = flatAssign.values.toSet.size
    val nTl = tlAssign.values.toSet.size
    assert(nTl >= nFlat / 2,
      s"two-level used $nTl cells vs flat $nFlat — degenerate split")
  }

  test("trainers accept array<double> embedding columns (not only float32)") {
    val dd = df.select(col("id"),
      col("v").cast("array<double>").as("v"))
    // pre-fix these three threw ClassCastException on the collected
    // sample's getSeq[Float]; the Number-widening path must return the
    // SAME centroids as the float32 route (float→double is exact)
    val flatD = Similarity.trainIvfCentroids(dd, "v", kCells, sampleSize = 2000)
    assert(flatD.length === flat.length)
    flat.zip(flatD).foreach { case (a, b) => assert(a.sameElements(b)) }
    val (coarseD, subsD) = Similarity.trainTwoLevelIvf(dd, "v", kCells, sampleSize = 2000)
    assert(coarseD.length === coarse.length)
    coarse.zip(coarseD).foreach { case (a, b) => assert(a.sameElements(b)) }
    subs.zip(subsD).foreach { case (sa, sb) =>
      assert(sa.length === sb.length)
      sa.zip(sb).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
    val pqF = Similarity.trainPqCodebooks(df, "v", m = 4, k = 8)
    val pqD = Similarity.trainPqCodebooks(dd, "v", m = 4, k = 8)
    pqF.zip(pqD).foreach { case (cbF, cbD) =>
      cbF.zip(cbD).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
  }
}
