package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Principal component analysis over an embedding column — the
  * decorrelating / compressing transform ahead of clustering, ANN and
  * whitening in a curation pipeline.
  *
  * Architecture at 100 TB (the Spark MLlib `RowMatrix` recipe, which is
  * how PCA is actually run on clusters for dim ≲ 10⁴):
  *   - the DATA never leaves the executors: one distributed pass
  *     aggregates the dim×(dim+1)/2 upper-triangle second-moment sums
  *     (two stacked posexplode generators → groupBy(i, j) with map-side
  *     partial aggregation — the shuffle carries ≤ dim² rows per task,
  *     never data rows);
  *   - the eigenproblem is DRIVER-side on the dim×dim matrix (64×64
  *     here): deterministic cyclic Jacobi sweeps, O(dim³) — microseconds
  *     next to the scan, and bit-reproducible because the rotation
  *     order is fixed (no pivoting on float comparisons across runs);
  *   - the projection back over the corpus is the codegen
  *     [[graft.functions.MatVec]] kernel: map-only, zero shuffles.
  *
  * Numeric discipline: every distributed sum decimal-accumulates
  * (DecimalType(38,18) — the corpus' dsum rule) so the gram matrix is
  * bit-identical across engines and partitionings; the covariance is
  * then assembled algebraically (Σxᵢxⱼ − n·mᵢ·mⱼ) from those exact
  * sums, so centering costs no second data pass.
  */
object Pca {

  /** Exact upper-triangle second-moment sums Σ xᵢ·xⱼ (i ≤ j) plus the
    * per-dimension sums and the row count — two corpus passes, each
    * with bounded (≤ dim²-row) output: the pair pass is two stacked
    * generator stages into one dim²-key shuffle; the mean pass is one
    * explode into a dim-key shuffle. Returns (gramSums, dimSums, n)
    * with gramSums(i)(j) filled for i ≤ j. */
  /** The distributed pair-sum plan (i, j, s) the moment pass collects —
    * exposed so PlanSpec can pin its map-side partial aggregation. */
  private[graft] def momentPairsPlan(df: DataFrame, vecCol: String): DataFrame =
    df.select(col(vecCol).as("__v"))
      .select(posexplode(col("__v")).as(Seq("i", "xi")), col("__v"))
      .select(col("i"), col("xi"), posexplode(col("__v")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(sum((col("xi").cast(DoubleType) * col("xj").cast(DoubleType))
        .cast(DecimalType(38, 18))).cast(DoubleType).as("s"))

  private[llm] def momentSums(
      df: DataFrame, vecCol: String, dim: Int): (Array[Array[Double]], Array[Double], Long) = {
    // The pair pass does dim²-grain work per ROW (the stacked generators
    // emit ~dim² rows each) over a byte-compact columnar input: a single
    // small parquet file is ONE scan task by maxPartitionBytes, which
    // serializes the whole generate+aggregate on one core (the
    // GraphQueries.buildAssignment finding; guide §2.2/§6). Repartition
    // to session parallelism first — a node-grain shuffle, trivial next
    // to the dim²-per-row compute it unblocks — and share the spread
    // frame with the (also generator-shaped) mean pass. Decimal partial
    // sums are order-free exact, so the sums are bit-identical under any
    // partitioning.
    val spread = df.select(col(vecCol).as("__v"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val pairs = momentPairsPlan(spread, "__v")
      .collect() // dim·(dim+1)/2 rows — bounded by the declared dim, not n
    val g = Array.ofDim[Double](dim, dim)
    pairs.foreach(r => g(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    val sums = spread.select(posexplode(col("__v")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(sum(col("x").cast(DoubleType).cast(DecimalType(38, 18)))
        .cast(DoubleType).as("s"), count(lit(1)).as("n"))
      .collect() // dim rows
    // Fail loudly on the shapes that would otherwise poison the scatter
    // matrix silently: an empty corpus (n=0 → NaN via 0/0 downstream)
    // and ragged/null-element vectors (per-dimension counts disagree, so
    // "the" row count is undefined and the mean-centering term is wrong).
    require(sums.nonEmpty,
      s"momentSums: no vector elements found in column '$vecCol' (empty input?)")
    val counts = sums.map(_.getLong(2)).distinct
    require(counts.length == 1,
      s"momentSums: per-dimension element counts differ (${counts.sorted.mkString(", ")}) — " +
        s"column '$vecCol' has ragged or null-element vectors; PCA needs rectangular input")
    val m = Array.ofDim[Double](dim)
    sums.foreach { r => m(r.getInt(0)) = r.getDouble(1) }
    val n = counts.head
    (g, m, n)
  }

  /** Centered covariance-scatter matrix S with S(i)(j) =
    * Σ (xᵢ−mᵢ)(xⱼ−mⱼ) = Σxᵢxⱼ − n·mᵢ·mⱼ, symmetric, assembled from the
    * exact moment sums. (Scatter, not /n — the eigenvectors are
    * identical and the ratio λ/trace is scale-free.) */
  def scatterMatrix(df: DataFrame, vecCol: String, dim: Int): Array[Array[Double]] = {
    val (g, s, n) = momentSums(df, vecCol, dim)
    val m = s.map(_ / n)
    Array.tabulate(dim, dim) { (i, j) =>
      val raw = if (i <= j) g(i)(j) else g(j)(i)
      raw - n * m(i) * m(j)
    }
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * matrix: sweeps rotate every (p, q) pair in a FIXED row-major order
    * (no max-pivot search, so the float-comparison order — and hence
    * the bits of the result — cannot vary run to run), until the
    * off-diagonal Frobenius mass drops below `tol` or `maxSweeps` is
    * hit. Returns eigenpairs sorted by eigenvalue descending (ties by
    * first-component sign order, which Jacobi never produces on real
    * spectra). Each eigenvector's sign is canonicalized so its
    * largest-|coordinate| entry is positive — eigenvectors are only
    * defined up to sign, and the canonical choice makes the basis
    * reproducible across engines and library versions. */
  def jacobiEigen(
      a0: Array[Array[Double]], maxSweeps: Int = 50,
      tol: Double = 1e-20): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && off() > tol) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // Three explicit branches (the Numerical-Recipes guard):
            //  theta == 0      → 45° rotation (t = 1), the true tie;
            //  |theta| > 1e150 → theta² would overflow to Infinity and
            //                    the stable formula underflows to ±0.0,
            //                    which the old `case 0.0` then mistook
            //                    for the 45° tie — use the asymptotic
            //                    t ≈ 1/(2θ) (a near-zero rotation, the
            //                    correct limit for a near-diagonal pair);
            //  otherwise       → the stable smaller-root formula, bit-
            //                    identical to the previous path.
            val t =
              if (theta == 0.0) 1.0
              else if (math.abs(theta) > 1e150) 1.0 / (2.0 * theta)
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val col = Array.tabulate(n)(k => v(k)(i))
      // canonical sign: the largest-|x| coordinate is positive
      val pivot = col.indices.maxBy(k => (math.abs(col(k)), -k))
      if (col(pivot) < 0.0) col.map(x => -x) else col
    }.toArray
    (values, vectors)
  }

  /** Top-k principal basis of an embedding column: (eigenvalues,
    * basis rows) — basis(r) is the r-th principal direction. */
  def pcaTrain(
      df: DataFrame, vecCol: String, dim: Int,
      k: Int): (Array[Double], Array[Array[Double]]) = {
    val (values, vectors) = jacobiEigen(scatterMatrix(df, vecCol, dim))
    (values.take(k), vectors.take(k))
  }

  /** Project the corpus onto a trained basis — one codegen mat-vec per
    * row ([[graft.functions.MatVec]]), map-only, zero shuffles. NOTE:
    * projects the RAW vectors (scores differ from centered scores by a
    * constant offset per component — irrelevant to distances, which is
    * what downstream ANN/clustering consumes). */
  def pcaProject(
      df: DataFrame, idCol: String, vecCol: String,
      basis: Array[Array[Double]]): DataFrame =
    df.select(col(idCol),
      graft.functions.F.matVec(col(vecCol), basis).as("proj"))
}
