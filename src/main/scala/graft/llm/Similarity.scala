package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.F

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * `bruteForceTopK` is the exact baseline — a broadcast of the (small)
  * query set against the corpus, cosine inside whole-stage codegen
  * (custom fused expression, graft.functions.CosineSimilarity), per-query
  * top-k via a bounded window. `lshSimilarityJoin` is the scale path:
  * random-projection bucketing (the E2LSH scheme Spark ML's
  * BucketedRandomProjectionLSH also implements) turns the all-pairs scan
  * into a bucket equi-join — shuffle by (table, bucket) key only — with
  * an exact distance verification after. Implemented directly on
  * DataFrame ops + the codegen dot/euclidean expressions rather than
  * Spark ML, so projection and verification both stay in codegen (the ML
  * path re-boxes every vector into `ml.linalg.Vector` via a UDF and
  * evaluates distances interpreted).
  */
object Similarity {

  /** Elementwise-exact cosine: per-element double products folded left to
    * right — deterministic and engine-portable (no BLAS reordering).
    * Fused single-pass codegen kernel. */
  def cosine(a: Column, b: Column): Column = F.cosineSim(a, b)

  /** Embedding-distribution drift between two corpus snapshots — the
    * monitor that catches "the new crawl's embeddings moved" before a
    * model trains on it. Each side reduces to its PER-DIMENSION mean
    * (posexplode → 64-group aggregate with map-side partials; sums
    * decimal-accumulate so the means are order-independent and
    * cross-engine exact), then the two mean vectors — dims-sized, tiny —
    * compare by cosine and L2. One corpus-grain pass per side, nothing
    * else scales with the data. Drift reads: cosine near 1 and L2 near
    * 0 = stable; a falling cosine = directional shift (new domain mix),
    * a growing L2 at stable cosine = magnitude shift (pipeline /
    * normalization change). */
  def embeddingDrift(
      a: DataFrame, b: DataFrame, vecCol: String): DataFrame =
    embeddingDriftAgainstMeans(dimMeans(a, vecCol, "a"), b, vecCol)

  /** Deterministic Achlioptas-sparse Johnson–Lindenstrauss projection
    * matrix (outDim × inDim): entries √(3/outDim)·{+1 w.p. 1/6,
    * −1 w.p. 1/6, 0 w.p. 2/3}, each derived independently from
    * xxhash64(seed, j·P+i) — order-free reproducible, 2/3 of the
    * multiplies vanish, and the JL distance-preservation guarantee
    * holds with the same ε as the dense Gaussian matrix (Achlioptas,
    * "Database-friendly random projections", PODS 2001). */
  def jlMatrix(inDim: Int, outDim: Int, seed: Long): Array[Array[Double]] = {
    val scale = math.sqrt(3.0 / outDim)
    Array.tabulate(outDim, inDim) { (j, i) =>
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(j.toLong * 1000003L + i, seed)
      java.lang.Math.floorMod(h, 6L) match {
        case 0L => scale
        case 1L => -scale
        case _ => 0.0
      }
    }
  }

  /** Johnson–Lindenstrauss random projection of an embedding column to
    * `outDim` dimensions — the pre-ANN / pre-clustering compression step
    * (64→16 cuts every downstream distance pass 4×, preserving pairwise
    * distances within the JL ε). ZERO shuffles: the matrix rides into
    * whole-stage codegen as one shared reference object
    * ([[graft.functions.MatVec]]) and each row is one fused mat-vec —
    * at 100 TB this is a map-only pass that scales with the scan. */
  def randomProject(
      df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int, seed: Long): DataFrame =
    df.select(col(idCol),
      F.matVec(col(vecCol), jlMatrix(inDim, outDim, seed)).as("proj"))

  /** One side's per-dimension decimal-exact means — dims-sized. Compute
    * ONCE for a fixed reference snapshot and reuse across comparisons
    * ([[graft.streaming.StreamingCorpus.startDriftMonitor]] does): the
    * reference never changes, so re-scanning it per micro-batch would
    * make the monitor's cost the reference's size, not the batch's. */
  private[graft] def dimMeans(
      df: DataFrame, vecCol: String, side: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy((col("pos") + 1).as("dim"))
      .agg((sum(col("v").cast(DoubleType).cast(DecimalType(38, 12)))
        .cast(DoubleType) / count(lit(1))).as(s"m_$side"),
        count(lit(1)).as(s"n_$side"))

  /** [[embeddingDrift]] with the reference side pre-reduced to its
    * (dim, m_a, n_a) mean table. */
  private[graft] def embeddingDriftAgainstMeans(
      refMeans: DataFrame, b: DataFrame, vecCol: String): DataFrame = {
    refMeans.join(dimMeans(b, vecCol, "b"), "dim")
      .agg(
        count(lit(1)).as("n_dims"),
        max(col("n_a")).as("n_a"),
        max(col("n_b")).as("n_b"),
        sum((col("m_a") * col("m_b")).cast(DecimalType(38, 18)))
          .cast(DoubleType).as("dot"),
        sum((col("m_a") * col("m_a")).cast(DecimalType(38, 18)))
          .cast(DoubleType).as("na2"),
        sum((col("m_b") * col("m_b")).cast(DecimalType(38, 18)))
          .cast(DoubleType).as("nb2"),
        sum(((col("m_a") - col("m_b")) * (col("m_a") - col("m_b")))
          .cast(DecimalType(38, 18))).cast(DoubleType).as("d2"))
      .select(col("n_dims"), col("n_a"), col("n_b"),
        // rounded to 9 decimals: the double→decimal re-rounding of the
        // squared terms can land on a tie that engines break differently
        // (HALF_UP vs HALF_EVEN) — a sub-ulp wobble a monitor never
        // cares about, and rounding makes the metric engine-exact
        round(col("dot") / (sqrt(col("na2")) * sqrt(col("nb2"))), 9)
          .as("cosine_of_means"),
        round(sqrt(col("d2")), 9).as("l2_of_means"))
  }

  /** Exact top-k cosine neighbors for each query vector. The query side
    * is expected to be small (broadcast); the corpus side streams. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc_nulls_last("cosine"), asc_nulls_last("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Hard-negative mining for contrastive training: for each query, the
    * `k` most-cosine-similar corpus vectors whose LABEL differs — the
    * informative negatives that actually move an embedding model (easy
    * random negatives quickly contribute ~zero gradient). Same shape as
    * [[bruteForceTopK]]: the bounded query set broadcasts, the corpus
    * streams once, and the per-query top-k window partitions on
    * query_id so no executor ever holds more than one query's
    * candidates. At ANN scale, feed LSH/IVF/PQ candidates in as
    * `corpus` instead of the full table — the mining logic is
    * identical. */
  def hardNegatives(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("qlabel"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("clabel"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc_nulls_last("cosine"), asc_nulls_last("neighbor_id"))
    broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id") &&
        !(col("qlabel") <=> col("clabel")))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Deterministic random-unit projection directions (E2LSH), seeded. */
  private def projectionDirs(numTables: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numTables) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / norm)
    }
  }

  /** Projections composed per hash table. One floor(dot/len) value over
    * a typical embedding distribution has only a handful of distinct
    * values — a single-projection table degenerates into one giant
    * bucket. Composing k floors per table keeps identical vectors
    * colliding always while spreading the corpus across ~v^k buckets. */
  private val ProjectionsPerTable = 4

  /** Per-table composite bucket key: murmur3 over the k floor values of
    * that table's projections. Pure codegen column expression. */
  private def bucketKeys(
      v: Column, dirs: Array[Array[Double]], bucketLength: Double,
      numTables: Int): Column =
    array((0 until numTables).map { t =>
      hash((0 until ProjectionsPerTable).map { j =>
        floor(F.dot(v, typedlit(dirs(t * ProjectionsPerTable + j).toSeq)) / bucketLength)
          .cast(LongType)
      }: _*)
    }: _*)

  /** Approximate similarity join via random-projection LSH (E2LSH with
    * k composed projections per table). Returns pairs with euclidean
    * distance ≤ maxDistance (unit-norm vectors → cosine = 1 - dist²/2).
    * The join shuffles CANDIDATE IDS by (table, bucket) key only —
    * vectors are re-attached after pair dedup, so the wide rows never
    * pass through a shuffle twice — and the distance verification makes
    * precision exact. `bucketLength`/`numHashTables` trade recall for
    * bucket size. */
  def lshSimilarityJoin(
      df: DataFrame, idCol: String, vecCol: String,
      maxDistance: Double, numHashTables: Int = 8,
      bucketLength: Double = 0.5, seed: Long = 42L,
      bucketCap: Int = 0): DataFrame =
    verifyEuclidean(
      lshCandidatePairs(df, idCol, vecCol, numHashTables, bucketLength, seed,
        bucketCap),
      df, idCol, vecCol, maxDistance)

  /** Candidate stage of [[lshSimilarityJoin]]: id pairs sharing ≥ 1
    * (table, bucket) key, deduplicated. Exposed separately so the
    * candidate set can be materialized (and the exact-distance verify
    * recomputed independently from it).
    *
    * `bucketCap` (0 = uncapped) is the skew guard the ×100 stress
    * campaign showed every pair-generating join needs: a (table, bucket)
    * cell holding b ids fans out b²/2 candidate pairs, so one
    * pathological bucket — a mass of exact-duplicate vectors, or a
    * bucketLength too coarse for a dense region — dominates the whole
    * join. Buckets larger than the cap are DROPPED (lower-bound
    * semantics, mirroring the posting-list dfCap in [[Dedup]]): pairs
    * in an oversized bucket usually still co-occur in another table
    * whose projections split the region, and exact-duplicate masses are
    * better collapsed by exact dedup (md5 over the raw bytes) before an
    * ANN pass. Recall under the cap is pinned in LlmSpec. */
  def lshCandidatePairs(
      df: DataFrame, idCol: String, vecCol: String,
      numHashTables: Int = 8, bucketLength: Double = 0.5,
      seed: Long = 42L, bucketCap: Int = 0): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val dim = v.select(size(col("v"))).first().getInt(0)
    val dirs = projectionDirs(numHashTables * ProjectionsPerTable, dim, seed)
    val keyed0 = v.select(col("id"),
      posexplode(bucketKeys(col("v"), dirs, bucketLength, numHashTables))
        .as(Seq("tbl", "bkt")))
    val keyed =
      if (bucketCap <= 0) keyed0
      else {
        // one extra count-by-key aggregate (cheap: key-grain, map-side
        // partial) buys a hard ceiling on join fan-out
        val sizes = keyed0.groupBy(col("tbl"), col("bkt"))
          .agg(count(lit(1)).as("__bsz"))
          .filter(col("__bsz") <= bucketCap)
          .drop("__bsz")
        keyed0.join(sizes, Seq("tbl", "bkt"))
      }
    val a = keyed.select(col("tbl"), col("bkt"), col("id").as("id_a"))
    val b = keyed.select(col("tbl").as("tbl2"), col("bkt").as("bkt2"),
      col("id").as("id_b"))
    a.join(b,
        col("tbl") === col("tbl2") && col("bkt") === col("bkt2") &&
          col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // same pair can collide in several tables
  }

  /** Exact euclidean verification of candidate pairs: re-attach vectors,
    * keep pairs within `maxDistance`. Index-order double accumulation
    * (F.euclidean) — deterministic and engine-portable. */
  def verifyEuclidean(
      cands: DataFrame, df: DataFrame, idCol: String, vecCol: String,
      maxDistance: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    cands.select(col("id_a"), col("id_b"))
      .join(v.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(v.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("dist", F.euclidean(col("v_a"), col("v_b")))
      .filter(col("dist") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Exact cosine verification of candidate pairs: keep pairs with
    * cosine ≥ `minCosine`. With LSH candidates in front this is the
    * scale path for embedding-duplicate detection (near-identical
    * vectors always share buckets at small bucketLength). */
  def verifyCosine(
      cands: DataFrame, df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // merge-hint: candidate sets are unbounded by construction and
    // Catalyst size-estimates an unmaterialized bucket-join output near
    // zero — never let it broadcast them (see Dedup.verifyJaccard)
    cands.select(col("id_a"), col("id_b")).hint("merge")
      .join(v.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(v.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  // ------------------------------------------------------------- IVF

  /** Train an IVF coarse quantizer: k-means (Lloyd) over a bounded,
    * deterministic sample collected to the driver — the standard IVF
    * recipe (train on a sample, assign the full corpus distributed).
    * The sample is capped so driver memory is bounded regardless of
    * corpus size; assignment is one codegen pass, no shuffle.
    *
    * AUTO-SWITCH: above `autoDistributeOver` rows the bounded sample is
    * a shrinking, unrepresentative fraction of the corpus (a 10k sample
    * of 10⁹ rows misses tail clusters entirely), so training silently
    * delegates to [[trainIvfCentroidsDistributed]] — full-corpus Lloyd
    * at one O(k×dim×tasks) shuffle per iteration. No caller can train a
    * 100 TB quantizer on 10k driver rows by default; pass
    * `autoDistributeOver = Long.MaxValue` to force the sample path. */
  def trainIvfCentroids(
      df: DataFrame, vecCol: String, k: Int,
      sampleSize: Int = 10000, iters: Int = 8, seed: Long = 42L,
      autoDistributeOver: Long = 1000000L): Array[Array[Double]] = {
    // LIMIT-bounded probe: the switch only needs to know whether the
    // corpus EXCEEDS the threshold, so cap the count there instead of
    // scanning all 100 TB of footers (and when under the cap, the
    // bounded count IS the exact total the sample fraction needs).
    val cap = math.min(autoDistributeOver, Int.MaxValue.toLong - 1)
    val total = df.select(org.apache.spark.sql.functions.lit(1))
      .limit((cap + 1).toInt).count()
    if (total > autoDistributeOver)
      return trainIvfCentroidsDistributed(
        // synthetic deterministic id: the distributed init orders by a
        // hash of (id, vector); hashing the vector itself keeps init
        // deterministic without requiring callers to name an id column
        df.select(col(vecCol)).withColumn("__ivf_tid", xxhash64(col(vecCol))),
        "__ivf_tid", vecCol, k, iters)
    val frac =
      math.min(1.0, sampleSize * 1.2 / math.max(total.toDouble, 1.0))
    val sample = df.select(col(vecCol)).sample(withReplacement = false, frac, seed)
      .limit(sampleSize)
    val sampleVecs = rowsToVecs(sample.collect())
    require(sampleVecs.nonEmpty, "empty training sample")
    lloydOnSample(sampleVecs, k, iters, seed)
  }

  /** Element-type-agnostic conversion of a collected single-column
    * vector sample: accepts array<float> AND array<double> columns
    * alike (gates carry float32 embeddings; pipelines routinely carry
    * doubles after a projection/normalization step). Float inputs widen
    * via Number.doubleValue — bit-identical to the old getSeq[Float]
    * path — so existing seeds/centroids are unchanged. */
  private def rowsToVecs(
      rows: Array[org.apache.spark.sql.Row]): Array[Array[Double]] =
    rows.map(_.getSeq[Number](0).map(_.doubleValue()).toArray)

  /** In-driver Lloyd over an already-bounded sample (shared by the IVF
    * coarse quantizer and the per-subspace PQ codebooks). */
  private def lloydOnSample(
      sample: Array[Array[Double]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    val dim = sample.head.length
    val rnd = new java.util.Random(seed)
    val kEff = math.min(k, sample.length)
    var centroids = samplePrefix(rnd, sample, kEff)
    var iter = 0
    while (iter < iters) {
      val sums = Array.fill(kEff)(new Array[Double](dim))
      val counts = new Array[Long](kEff)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kEff) {
          var acc = 0.0; var i = 0
          while (i < dim) { val d = v(i) - centroids(c)(i); acc += d * d; i += 1 }
          if (acc < bestD) { bestD = acc; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(kEff) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
      iter += 1
    }
    centroids
  }

  /** Deterministic Fisher-Yates prefix sample of k rows. */
  private def samplePrefix(
      rnd: java.util.Random, xs: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val a = xs.clone()
    var i = 0
    while (i < k) {
      val j = i + rnd.nextInt(a.length - i)
      val t = a(i); a(i) = a(j); a(j) = t
      i += 1
    }
    a.take(k)
  }

  /** Assign each row its IVF list id (`__ivf_list`): one codegen pass.
    * Persist/partition the result by `__ivf_list` to make probes
    * partition-pruned at scale. */
  def withIvfList(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]], outCol: String = "__ivf_list"): DataFrame =
    df.withColumn(outCol, F.nearestCentroid(col(vecCol), centroids))

  /** Two-level IVF quantizer (coarse ≈ √k cells, ≈ √k sub-cells each —
    * the FAISS IVF-in-IVF layout): training stays sample-bounded, and
    * the full-corpus ASSIGNMENT pays (k1 + k2)·dim ≈ 2√k·dim per row
    * instead of the flat quantizer's k·dim. With auto-k policies
    * (k ∝ n/cellTarget) a flat assignment is O(n²·dim/cellTarget) —
    * measured as the l_knn_density_prune ×100 slope 1.41 before this
    * path existed; two-level drops the assignment term to
    * O(n^1.5·dim/√cellTarget), below the gate's linear terms through
    * ~10⁸ vectors. Sub-quantizers train on the coarse-partitioned
    * slices of ONE bounded deterministic sample (empty cells fall back
    * to the coarse centroid), so driver cost is bounded regardless of
    * corpus size. Returns (coarse, subs) for [[withTwoLevelIvfList]]. */
  def trainTwoLevelIvf(
      df: DataFrame, vecCol: String, k: Int,
      sampleSize: Int = 20000, iters: Int = 8, seed: Long = 42L)
    : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val k1 = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val k2 = math.max(1, math.ceil(k.toDouble / k1).toInt)
    val coarse = trainIvfCentroids(df, vecCol, k1, sampleSize, iters, seed)
    val total = df.select(org.apache.spark.sql.functions.lit(1))
      .limit(10000000).count()
    val frac = math.min(1.0, sampleSize * 1.2 / math.max(total.toDouble, 1.0))
    val sample = df.select(col(vecCol))
      .sample(withReplacement = false, frac, seed).limit(sampleSize)
    val sampleVecs = rowsToVecs(sample.collect())
    def nearestIdx(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < coarse.length) {
        var acc = 0.0; var i = 0
        while (i < v.length) { val d = v(i) - coarse(c)(i); acc += d * d; i += 1 }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      best
    }
    val byCell = sampleVecs.groupBy(nearestIdx)
    val subs = Array.tabulate(coarse.length) { c =>
      byCell.get(c) match {
        case Some(members) if members.length > 1 =>
          lloydOnSample(members, k2, iters, seed + c)
        case Some(members) => Array(members.head.clone())
        case None => Array(coarse(c).clone())
      }
    }
    (coarse, subs)
  }

  /** Distributed two-level assignment: one codegen pass, list id =
    * coarse·k2max + sub (see [[graft.functions.NearestCentroidTwoLevel]]). */
  def withTwoLevelIvfList(
      df: DataFrame, vecCol: String, coarse: Array[Array[Double]],
      subs: Array[Array[Array[Double]]],
      outCol: String = "__ivf_list"): DataFrame = {
    val k2max = subs.map(_.length).max
    df.withColumn(outCol, F.twoLevelList(col(vecCol), coarse, subs, k2max))
  }

  /** IVF top-k probe: score only rows whose list is among the `nprobe`
    * centroids nearest to the query. Exact distances within the probed
    * lists (cosine ordering = euclidean on unit-norm vectors). */
  def ivfTopK(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], query: Array[Float],
      k: Int, nprobe: Int = 8): DataFrame = {
    val probes = probeLists(centroids, query, nprobe)
    val queryCol = typedlit(query.map(_.toDouble).toSeq)
    withIvfList(df.select(col(idCol).as("id"), col(vecCol).as("v")), "v", centroids)
      .filter(col("__ivf_list").isin(probes: _*))
      .withColumn("dist", F.euclidean(col("v"), queryCol))
      .orderBy(asc("dist"), asc("id"))
      .limit(k)
      .select(col("id"), col("dist"))
  }

  /** Materialize the IVF index: one codegen assignment pass, written as
    * parquet PARTITIONED BY the list id. Probes against the materialized
    * index are partition-pruned — a probe with nprobe lists reads only
    * those nprobe directories, never the full corpus. This is the form
    * to run at scale: assign once, probe many. */
  def materializeIvf(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], path: String): Unit =
    withIvfList(df.select(col(idCol).as("id"), col(vecCol).as("v")), "v", centroids)
      .write.mode("overwrite").partitionBy("__ivf_list").parquet(path)

  /** Nearest-centroid probe list for a query: the `nprobe` centroid ids
    * closest to the query vector (driver-side — centroids are tiny). */
  def probeLists(
      centroids: Array[Array[Double]], query: Array[Float], nprobe: Int): Seq[Int] = {
    val qd = query.map(_.toDouble)
    centroids.zipWithIndex.map { case (cent, i) =>
      var acc = 0.0; var j = 0
      while (j < math.min(cent.length, qd.length)) {
        val d = qd(j) - cent(j); acc += d * d; j += 1
      }
      (i, acc)
    }.sortBy(_._2).take(nprobe).map(_._1).toSeq
  }

  /** IVF top-k probe against a [[materializeIvf]] index: the filter on
    * the partition column prunes to the probed list directories (assert
    * with `.explain` — PartitionFilters carries `__ivf_list IN ...`). */
  def ivfTopKMaterialized(
      spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: Array[Array[Double]], query: Array[Float],
      k: Int, nprobe: Int = 8): DataFrame = {
    val probes = probeLists(centroids, query, nprobe)
    val queryCol = typedlit(query.map(_.toDouble).toSeq)
    spark.read.parquet(path)
      .filter(col("__ivf_list").isin(probes: _*))
      .withColumn("dist", F.euclidean(col("v"), queryCol))
      .orderBy(asc("dist"), asc("id"))
      .limit(k)
      .select(col("id"), col("dist"))
  }

  // ------------------------------------ graph ANN: NSW inside IVF lists

  /** Deterministic beam search over one in-memory NSW graph: best-first
    * expansion from `entry`, visited-set pruned, candidate frontier and
    * bounded result set both ordered by (distance, id) so ties — and
    * therefore the whole walk — are reproducible across engines and
    * runs. Returns up to `ef` (nodeIndex, dist) pairs, nearest first. */
  private def nswBeamSearch(
      vecs: Array[Array[Double]], adj: Int => Array[Int], ids: Array[Long],
      q: Array[Double], ef: Int, entry: Int): Array[(Int, Double)] = {
    def dist(i: Int): Double = {
      val v = vecs(i); var acc = 0.0; var j = 0
      val n = math.min(v.length, q.length)
      while (j < n) { val d = v(j) - q(j); acc += d * d; j += 1 }
      acc
    }
    implicit val byDistId: Ordering[(Double, Int)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering,
        Ordering.by[Int, Long](i => ids(i)))
    val visited = new java.util.BitSet(vecs.length)
    // frontier pops nearest-first; results keeps the ef nearest seen
    val frontier = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
      byDistId.reverse)
    val results = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
      byDistId)
    val d0 = dist(entry)
    visited.set(entry)
    frontier.enqueue((d0, entry)); results.enqueue((d0, entry))
    while (frontier.nonEmpty) {
      val (cd, c) = frontier.dequeue()
      if (results.size >= ef && byDistId.gt((cd, c), results.head)) {
        frontier.clear()
      } else {
        val nbs = adj(c); var i = 0
        while (i < nbs.length) {
          val nb = nbs(i)
          if (!visited.get(nb)) {
            visited.set(nb)
            val d = dist(nb)
            if (results.size < ef || byDistId.lt((d, nb), results.head)) {
              frontier.enqueue((d, nb))
              results.enqueue((d, nb))
              if (results.size > ef) results.dequeue(): Unit
            }
          }
          i += 1
        }
      }
    }
    results.dequeueAll.toArray.reverse.map(t => (t._2, t._1))
  }

  /** Build one list's NSW graph: nodes insert in ascending-id order,
    * each new node links bidirectionally to its `m` beam-search-nearest
    * predecessors, and any adjacency over `2m` truncates to the 2m
    * nearest (the HNSW neighbor-selection cap, which keeps degree — and
    * thus search cost and index size — bounded). Everything about the
    * construction is deterministic (insertion order, tie-breaks), so
    * the index — and every probe against it — is reproducible. */
  private def buildNswList(
      ids: Array[Long], vecs: Array[Array[Double]], m: Int,
      efConstruction: Int): Array[Array[Int]] = {
    val n = ids.length
    val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    def dist(a: Int, b: Int): Double = {
      val va = vecs(a); val vb = vecs(b); var acc = 0.0; var j = 0
      while (j < va.length) { val d = va(j) - vb(j); acc += d * d; j += 1 }
      acc
    }
    var i = 1
    while (i < n) {
      // adjacency accessed lazily: the walk copies only the lists it
      // actually visits (~ef·degree), not the whole partial graph
      val found = nswBeamSearch(vecs, j => adj(j).toArray, ids, vecs(i),
        math.max(efConstruction, m), 0)
        // the partial graph only holds nodes < i
        .filter(_._1 < i)
      val neigh = found.take(m).map(_._1)
      neigh.foreach { nb =>
        adj(i) += nb
        adj(nb) += i
        if (adj(nb).length > 2 * m) {
          val trimmed = adj(nb).toArray
            .map(x => (dist(nb, x), x)).sortBy(t => (t._1, ids(t._2)))
            .take(2 * m).map(_._2)
          adj(nb).clear(); adj(nb) ++= trimmed
        }
      }
      i += 1
    }
    adj.map(_.toArray)
  }

  /** Materialize the graph-ANN index: IVF coarse assignment (one codegen
    * pass), then ONE NSW graph per list built inside its partition —
    * the Spark-native shape of graph ANN. HNSW's hierarchy buys log-n
    * entry descent on a single billion-node graph; here the coarse
    * quantizer IS the upper layer (a probe descends centroids → lists),
    * and each per-list graph is small enough (`listCap` nodes, tune
    * k ∝ n/listCap) that flat NSW search inside it is already O(ef·deg).
    * Layout: parquet partitioned by list id — one directory per graph,
    * so a probe's pruned read loads exactly the nprobe graphs it walks.
    * Build is embarrassingly parallel across lists and never shuffles
    * anything wider than (id, vector, neighbor ids). */
  def materializeNsw(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], path: String,
      m: Int = 8, efConstruction: Int = 48, listCap: Int = 500000): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    val assigned = withIvfList(
      df.select(col(idCol).cast(LongType).as("id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("v")),
      "v", centroids)
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(DoubleType)),
      StructField("neighbors", ArrayType(LongType)),
      StructField("__ivf_list", IntegerType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    assigned
      .repartition(col("__ivf_list"))
      .mapPartitions { rows =>
        // a hash partition may carry several lists — group locally;
        // each list is fully contained here by the repartition key
        val byList = rows.map { r =>
          (r.getInt(2), (r.getLong(0), r.getSeq[Double](1).toArray))
        }.toArray.groupBy(_._1)
        byList.iterator.flatMap { case (list, members) =>
          val sorted = members.map(_._2).sortBy(_._1)
          require(sorted.length <= listCap,
            s"IVF list $list holds ${sorted.length} > listCap=$listCap " +
              "vectors; raise the centroid count (k ~ n/listCap)")
          val ids = sorted.map(_._1)
          val vecs = sorted.map(_._2)
          val adj = buildNswList(ids, vecs, m, efConstruction)
          ids.indices.iterator.map { i =>
            Row(ids(i), vecs(i).toSeq,
              adj(i).map(ids(_)).toSeq.sorted, list)
          }
        }
      }(enc)
      .write.mode("overwrite").partitionBy("__ivf_list").parquet(path)
  }

  /** Graph-ANN candidate probe: descend the coarse quantizer to the
    * `nprobe` nearest lists (driver-side, centroids are tiny), then walk
    * each list's NSW graph with a deterministic beam search (`ef`
    * candidates, entry = the list's min-id node). The scan is
    * partition-pruned to the probed directories; candidates from all
    * probed lists union for the caller's exact re-rank — ANN follows
    * the same candidates-then-verify discipline as every other
    * approximate operator here, so correctness never rests on the
    * graph. */
  def nswTopKCandidates(
      spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: Array[Array[Double]], query: Array[Float],
      ef: Int = 64, nprobe: Int = 8): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    val probes = probeLists(centroids, query, nprobe)
    val q = query.map(_.toDouble)
    val outSchema = StructType(Seq(StructField("id", LongType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    spark.read.parquet(path)
      .filter(col("__ivf_list").isin(probes: _*))
      .select(col("id"), col("v"), col("neighbors"), col("__ivf_list"))
      // REQUIRED, not an optimization: the scan splits a big list's
      // parquet across several FilePartitions (maxPartitionBytes), and a
      // task holding half a list would hit neighbor ids that live in the
      // other half. The walk needs whole lists — re-key the nprobe'd
      // rows (a small shuffle of only the probed lists) exactly like the
      // build side.
      .repartition(col("__ivf_list"))
      .mapPartitions { rows =>
        val byList = rows.map { r =>
          (r.getInt(3),
            (r.getLong(0), r.getSeq[Double](1).toArray, r.getSeq[Long](2)))
        }.toArray.groupBy(_._1)
        byList.iterator.flatMap { case (_, members) =>
          val sorted = members.map(_._2).sortBy(_._1)
          val ids = sorted.map(_._1)
          val idx = ids.zipWithIndex.toMap
          val vecs = sorted.map(_._2)
          val adj = sorted.map(_._3.iterator.map(idx).toArray)
          nswBeamSearch(vecs, adj(_), ids, q, ef, 0)
            .iterator.map { case (i, _) => Row(ids(i)) }
        }
      }(enc)
  }

  // ------------------------------------ product quantization (IVF-PQ's PQ)

  /** Train product-quantization codebooks: the vector splits into `m`
    * contiguous subvectors and each subspace gets its own `k`-entry
    * codebook from bounded-sample Lloyd (seed offset per subspace). A
    * vector then compresses to `m` small codes — 64-dim float32 →
    * 8 bytes at m=8, a 32× memory cut, which is what makes
    * billion-vector ANN fit executor memory at all (Jégou et al., PQ
    * for nearest neighbor search). Returns codebooks[m][k][dim/m]. */
  def trainPqCodebooks(
      df: DataFrame, vecCol: String, m: Int = 8, k: Int = 16,
      sampleSize: Int = 10000, iters: Int = 8,
      seed: Long = 42L): Array[Array[Array[Double]]] = {
    val sample = rowsToVecs(
      df.select(col(vecCol)).limit(sampleSize).collect())
    require(sample.nonEmpty, "empty PQ training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    require(sample.length >= k,
      s"PQ training needs >= k=$k sample vectors, got ${sample.length}")
    val sub = dim / m
    Array.tabulate(m) { s =>
      lloydOnSample(sample.map(_.slice(s * sub, (s + 1) * sub)), k, iters,
        seed + s)
    }
  }

  /** Encode every vector into its `m` PQ codes — one shuffle-free
    * codegen projection (m NearestCentroid kernels over array slices).
    * At scale this pass writes the compressed representation once;
    * every subsequent query scans codes, not raw vectors. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val sub = codebooks(0)(0).length
    val codeCols = codebooks.indices.map { s =>
      F.nearestCentroid(
        slice(col(vecCol), s * sub + 1, sub), codebooks(s))
    }
    df.select(col(idCol).as("id"), array(codeCols: _*).as("codes"))
  }

  /** Asymmetric-distance top-N candidates: the query builds an m×k
    * lookup table of exact subspace distances ON THE DRIVER (m·k
    * doubles — tiny), broadcast as a literal; each row's approximate
    * distance is then m array lookups summed by a codegen'd
    * `aggregate` — no per-row vector arithmetic at all. Top-N is
    * orderBy+limit → TakeOrderedAndProject (k-row heap merge, never a
    * global sort). Feed the result to an exact re-rank over the raw
    * vectors of just N rows — the standard PQ → re-rank pipeline. */
  def pqTopNCandidates(
      df: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]], query: Array[Float],
      topN: Int): DataFrame = {
    val m = codebooks.length
    val k = codebooks(0).length
    require(codebooks.forall(_.length == k),
      "PQ codebooks must be uniform-k for LUT indexing")
    val sub = codebooks(0)(0).length
    val lut: Seq[Double] = for {
      s <- 0 until m
      c <- 0 until k
    } yield {
      var acc = 0.0
      var i = 0
      while (i < sub) {
        val d = query(s * sub + i).toDouble - codebooks(s)(c)(i)
        acc += d * d
        i += 1
      }
      acc
    }
    val lutCol = typedlit(lut)
    pqEncode(df, idCol, vecCol, codebooks)
      .withColumn("adc_dist",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, s) => acc + element_at(
            lutCol, (s * k + element_at(col("codes"), s + 1) + 1)
              .cast(IntegerType))))
      .orderBy(asc("adc_dist"), asc("id"))
      .limit(topN)
      .select(col("id"), col("adc_dist"))
  }

  /** Materialize an IVF-PQ index: every vector gets its coarse IVF list
    * (partition column → probes are partition-pruned) AND its PQ codes
    * (the compressed representation ADC scores against). The raw vector
    * rides along for the final re-rank of top-N candidates only. This
    * is the billion-scale layout: a probe reads nprobe directories,
    * scores CODES (m byte-ish lookups/row), and touches raw vectors for
    * ~100 rows. */
  def materializeIvfPq(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], path: String): Unit = {
    val sub = codebooks(0)(0).length
    val codeCols = codebooks.indices.map { s =>
      F.nearestCentroid(slice(col("v"), s * sub + 1, sub), codebooks(s))
    }
    withIvfList(df.select(col(idCol).as("id"), col(vecCol).as("v")), "v", centroids)
      .withColumn("codes", array(codeCols: _*))
      .write.mode("overwrite").partitionBy("__ivf_list").parquet(path)
  }

  /** IVF-PQ probe: prune to the `nprobe` nearest lists (PartitionFilters
    * on `__ivf_list`), ADC-score the PQ codes with the query's LUT, and
    * exact-re-rank only the `topN` best codes to return `k` ids. The
    * scan never decodes raw vectors outside the re-rank set. */
  def ivfPqTopK(
      spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], query: Array[Float],
      k: Int, nprobe: Int = 8, topN: Int = 100): DataFrame = {
    val queryCol = typedlit(query.map(_.toDouble).toSeq)
    ivfPqCandidates(spark, path, centroids, codebooks, query, nprobe, topN)
      .withColumn("dist", F.euclidean(col("v"), queryCol))
      .orderBy(asc("dist"), asc("id"))
      .limit(k)
      .select(col("id"), col("dist"))
  }

  /** ADC candidate stage of [[ivfPqTopK]] — the partition-pruned scan +
    * LUT scoring + top-N, exposed so the candidate set can be
    * materialized and independently re-ranked/verified. Returns
    * (id, v, adc_dist). */
  def ivfPqCandidates(
      spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], query: Array[Float],
      nprobe: Int, topN: Int): DataFrame = {
    val m = codebooks.length
    val kk = codebooks(0).length
    val sub = codebooks(0)(0).length
    val probes = probeLists(centroids, query, nprobe)
    val lut: Seq[Double] = for {
      s <- 0 until m; c <- 0 until kk
    } yield {
      var acc = 0.0; var i = 0
      while (i < sub) {
        val d = query(s * sub + i).toDouble - codebooks(s)(c)(i)
        acc += d * d; i += 1
      }
      acc
    }
    val lutCol = typedlit(lut)
    spark.read.parquet(path)
      .filter(col("__ivf_list").isin(probes: _*))
      .withColumn("adc_dist",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, s) => acc + element_at(
            lutCol, (s * kk + element_at(col("codes"), s + 1) + 1)
              .cast(IntegerType))))
      .orderBy(asc("adc_dist"), asc("id"))
      .limit(topN)
      .select(col("id"), col("v"), col("adc_dist"))
  }

  // ------------------------------------ distributed k-means (Lloyd)

  /** One distributed Lloyd iteration: nearest-centroid assignment (a
    * single codegen pass over broadcast centroid literals — the same
    * [[withIvfList]] expression probes use) followed by per-list,
    * per-dimension means. The aggregation posexplodes each vector to
    * (list, dim) grain; map-side partial aggregation collapses every
    * task to ≤ k×dim rows before the one shuffle, so shuffle volume is
    * O(k × dim × tasks) regardless of corpus size — the property that
    * lets Lloyd run over a corpus too large to sample meaningfully.
    * Returns one row per non-empty list:
    * (list_id, n_members, centroid: Array[Double]). */
  def kmeansStep(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val assigned = withIvfList(df.select(col(vecCol).as("v")), "v", centroids)
      .filter(col("__ivf_list") >= 0) // dimension-mismatched rows
    assigned
      .select(col("__ivf_list").as("list_id"),
        posexplode(col("v")).as(Seq("pos", "val")))
      .groupBy(col("list_id"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("val").cast(DoubleType)).as("s"))
      // repack (list, pos, mean) rows into the centroid array; grain here
      // is k rows × dim elements — bounded by the quantizer size, so the
      // collect_list never sees corpus-sized groups.
      .groupBy(col("list_id"))
      .agg(
        max(col("n")).as("n_members"),
        transform(
          array_sort(collect_list(struct(col("pos"), (col("s") / col("n")).as("m")))),
          x => x.getField("m")).as("centroid"))
  }

  /** Distributed IVF training: full-corpus Lloyd iterations built from
    * [[kmeansStep]] — the scale path when a 10k driver sample can't
    * represent the corpus (trainIvfCentroids is the bounded-sample
    * default; this variant touches every vector each round at one
    * shuffle of O(k × dim × tasks) per iteration).
    *
    * Init is deterministic and data-order-independent: the k vectors
    * with the smallest xxhash64 over (id, vector) — a TakeOrderedAndProject,
    * never a full sort. Only k×dim doubles ever reach the driver per
    * round. Empty lists keep their previous centroid. Stops early when
    * the max centroid shift drops below `tol`. */
  def trainIvfCentroidsDistributed(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 8, tol: Double = 1e-6): Array[Array[Double]] = {
    require(k >= 1)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)
    var centroids = v
      .orderBy(xxhash64(col("id"), col("v")), col("id"))
      .limit(k)
      .select(col("v")).collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray)
    require(centroids.nonEmpty, "no vectors to train on")
    var iter = 0
    var shifted = true
    while (iter < iters && shifted) {
      val next = centroids.clone()
      kmeansStep(v, "v", centroids).collect().foreach { r =>
        next(r.getAs[Int]("list_id")) =
          r.getSeq[Double](r.fieldIndex("centroid")).toArray
      }
      shifted = centroids.zip(next).exists { case (a, b) =>
        var acc = 0.0; var i = 0
        while (i < math.min(a.length, b.length)) {
          val d = a(i) - b(i); acc += d * d; i += 1
        }
        math.sqrt(acc) > tol
      }
      centroids = next
      iter += 1
    }
    centroids
  }

  // ------------------------------------------------- semantic dedup

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): cluster embeddings with
    * a coarse quantizer, then compare pairs ONLY within a cluster —
    * semantically-identical documents land in the same cluster, so the
    * all-pairs n² collapses to Σ|cluster|². Pair stage: one codegen
    * assignment pass + an equi-join on the cluster id with exact-cosine
    * verification. Size k so clusters stay bounded (n/k ≈ thousands);
    * a skewed giant cluster is the operator's known failure mode — at
    * corpus scale feed it back through a finer quantizer. */
  def semanticDedupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], minCosine: Double): DataFrame = {
    val assigned = withIvfList(
      df.select(col(idCol).as("id"), col(vecCol).as("v")), "v", centroids)
      // unassignable vectors (dim mismatch / null element → list -1)
      // must NOT form a pseudo-cluster and all-pairs join each other
      .filter(col("__ivf_list") >= 0)
    val a = assigned.select(col("__ivf_list").as("la"), col("id").as("id_a"),
      col("v").as("v_a"))
    val b = assigned.select(col("__ivf_list").as("lb"), col("id").as("id_b"),
      col("v").as("v_b"))
    a.join(b, col("la") === col("lb") && col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** [[semanticDedupPairs]] with the quantizer sized to the corpus:
    * k = ⌈n / targetClusterSize⌉ (min 8), so mean cluster size — and
    * with it the Σ|cluster|²/2 pair cost PER cluster — stays constant
    * as the corpus grows, which is what keeps SemDeDup linear-ish at
    * scale (a FIXED k makes clusters grow ∝ n and the within-cluster
    * join quadratic; measured slope 3.0 on the ×10 dual-scale bench).
    * Training rides [[trainIvfCentroids]]'s size auto-switch, so a
    * 100 TB corpus trains distributed without the caller knowing. */
  def semanticDedupPairsAuto(
      df: DataFrame, idCol: String, vecCol: String, minCosine: Double,
      targetClusterSize: Long = 4096L): DataFrame = {
    val n = df.count()
    val k = math.max(8L, (n + targetClusterSize - 1) / targetClusterSize).toInt
    val centroids = trainIvfCentroids(df, vecCol, k)
    semanticDedupPairs(df, idCol, vecCol, centroids, minCosine)
  }

  /** Full SemDeDup keep-one: within-cluster near-identical pairs →
    * connected components → each document labeled with its component's
    * minimum id (`canonical_id`; survivors are rows where id ==
    * canonical_id). */
  def semanticDedupLabels(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], minCosine: Double): DataFrame =
    Dedup.canonicalizeNearDups(
      df.select(col(idCol)),
      semanticDedupPairs(df, idCol, vecCol, centroids, minCosine))

  /** Approximate top-k for one query vector via LSH buckets: only
    * corpus rows sharing a (table, bucket) key with the query are
    * scored. */
  def lshTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int,
      numHashTables: Int = 8, bucketLength: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    val queryCol = typedlit(query.map(_.toDouble).toSeq)
    lshTopKCandidates(df, idCol, vecCol, query, numHashTables, bucketLength, seed)
      .withColumn("dist", F.euclidean(col("v"), queryCol))
      .orderBy(asc("dist"), asc("id"))
      .limit(k)
      .select(col("id"), col("dist"))
  }

  /** Candidate stage of [[lshTopK]]: corpus rows sharing ≥ 1 (table,
    * bucket) key with the query, deduped — exposed separately so the
    * candidate set can be materialized (and the exact top-k recomputed
    * independently from it). Returns (id, v). */
  def lshTopKCandidates(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float],
      numHashTables: Int = 8, bucketLength: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = query.length
    val dirs = projectionDirs(numHashTables * ProjectionsPerTable, dim, seed)
    val qd = query.map(_.toDouble)
    // Query buckets computed driver-side with the same composite key the
    // column expression produces, via a one-row DataFrame (keeps the
    // murmur3 hashing identical).
    val qdf = Seq(Tuple1(qd.toSeq)).toDF("v")
    val qBuckets = qdf.select(
        posexplode(bucketKeys(col("v"), dirs, bucketLength, numHashTables))
          .as(Seq("tbl", "bkt")))
      .collect().map(r => r.getInt(0).toLong * 1000003L + r.getInt(1))
    val qb = typedlit(qBuckets.toSeq)
    df.select(col(idCol).as("id"), col(vecCol).as("v"),
        posexplode(bucketKeys(col(vecCol), dirs, bucketLength, numHashTables))
          .as(Seq("tbl", "bkt")))
      .filter(array_contains(qb, col("tbl").cast(LongType) * 1000003L + col("bkt")))
      .dropDuplicates("id")
      .select(col("id"), col("v"))
  }
}
