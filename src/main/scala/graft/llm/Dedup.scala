package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design: exact dedup is one hash-shuffle on the fingerprint;
  * MinHash/LSH turns all-pairs similarity into an equi-join on band
  * buckets (shuffle by bucket key, pairs only within buckets); SimHash
  * reduces a document to one 64-bit key so near-dup candidates co-locate
  * by key prefix. The all-pairs variants (`jaccardPairs`,
  * `embeddingCosinePairs`) are correctness baselines for small slices —
  * their Scaladoc says so — the LSH paths are the 100 TB route.
  */
object Dedup {

  import TextAnalysis.{fingerprint, normalize, tokens}

  // ------------------------------------------------------------- exact

  /** Exact dedup: keep the smallest `idCol` per normalized-text
    * fingerprint. One shuffle on the md5 key. */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(asc_nulls_last(idCol))
    df.withColumn("__fp", fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Exact-duplicate groups: fingerprint → (canonical id, member count). */
  def exactDuplicateGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fingerprint"))
      .agg(
        min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_members"))

  // ------------------------------------------------------- n-gram Jaccard

  /** Distinct word n-gram shingles (n=1 → distinct tokens). Guarded so a
    * text shorter than n yields an empty set (Spark `sequence(1, 0)`
    * counts DOWN, which would fabricate shingles). */
  def wordShingles(text: Column, n: Int): Column = {
    require(n >= 1)
    val toks = tokens(normalize(text))
    if (n == 1) array_distinct(toks)
    else {
      val cnt = size(toks) - (n - 1)
      when(cnt >= 1,
        array_distinct(transform(sequence(lit(1), cnt), i =>
          array_join(slice(toks, i, lit(n)), " "))))
        .otherwise(array().cast(ArrayType(StringType)))
    }
  }

  /** All-pairs n-gram Jaccard above a threshold. Correctness baseline:
    * O(n²) self-join — use [[minHashCandidates]] to prune at scale. */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val withShingles = df.select(
      col(idCol).as("id"), wordShingles(col(textCol), n).as("sh"))
    val a = withShingles.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = withShingles.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          nullif(size(array_union(col("sh_a"), col("sh_b"))), lit(0)).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ----------------------------------------------------------- MinHash

  private val MersennePrime31 = 2147483647L // 2^31 - 1

  /** Deterministic (a, b) parameters for the k min-hash permutations —
    * kept below 2^31 so a*h + b stays inside a long under ANSI mode
    * (Spark 4 default: silent wraparound is an error, not a feature). */
  private def hashParams(k: Int): Seq[(Long, Long)] = {
    (1 to k).map { i =>
      val a = (i.toLong * 1103515245L + 12345L) % (MersennePrime31 - 1) + 1L
      val b = (i.toLong * 134775813L + 1L) % MersennePrime31
      (a, b)
    }
  }

  /** k-wide MinHash signature over word shingles: sig[i] =
    * min over shingles of ((a_i * h + b_i) mod p), p = 2^31-1, h =
    * xxhash64 of the shingle folded into [0, p). Pure column expressions
    * — computed per-row inside codegen, no shuffle.
    *
    * NOTE: prefer [[withMinHashSignature]] on anything larger than test
    * slices — inlining this single expression makes the shingle-hash
    * array re-evaluate once per permutation (k× redundant string work).
    */
  def minHashSignature(text: Column, n: Int, k: Int): Column =
    signatureOfHashes(
      transform(wordShingles(text, n), t => pmod(xxhash64(t), lit(MersennePrime31))), k)

  private def signatureOfHashes(hashes: Column, k: Int): Column = {
    val params = array(hashParams(k).map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b"))
    }: _*)
    transform(params, p =>
      array_min(transform(hashes, h =>
        pmod(p.getField("a") * h + p.getField("b"), lit(MersennePrime31)))))
  }

  /** Signature computation in two stages with a REAL optimization barrier
    * between them. A plain two-projection version gets undone by
    * CollapseProject (the hash-array alias is referenced once, so Catalyst
    * inlines it into the per-permutation lambda and the whole shingle
    * pipeline re-evaluates k times per row — measured 50×+ slowdown).
    * Stage 1 stays declarative: shingle + xxhash64 once per row. Stage 2
    * computes the k minima in a tight JVM loop behind a typed
    * mapPartitions boundary, which no Project can collapse across. Rows
    * with no shingles get a NULL signature (and are skipped by banding). */
  def withMinHashSignature(
      df: DataFrame, textCol: String, n: Int, k: Int,
      outCol: String = "sig"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    val params = hashParams(k).toArray
    val hashed = df.withColumn("__mh_hashes",
      transform(wordShingles(col(textCol), n),
        t => pmod(xxhash64(t), lit(MersennePrime31))))
    val hIdx = hashed.schema.fieldIndex("__mh_hashes")
    val outSchema = StructType(
      hashed.schema.fields.patch(hIdx, Nil, 1) :+
        StructField(outCol, ArrayType(LongType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    hashed.mapPartitions { rows =>
      rows.map { r =>
        val hs = r.getSeq[Long](hIdx)
        val sig: Seq[Long] =
          if (hs == null || hs.isEmpty) null
          else {
            val out = new Array[Long](params.length)
            var i = 0
            while (i < params.length) {
              val (a, b) = params(i)
              var min = Long.MaxValue
              val it = hs.iterator
              while (it.hasNext) {
                val v = (a * it.next() + b) % MersennePrime31
                if (v < min) min = v
              }
              out(i) = min
              i += 1
            }
            out.toSeq
          }
        Row.fromSeq(r.toSeq.patch(hIdx, Nil, 1) :+ sig)
      }
    }(enc)
  }

  /** LSH banding: explode the signature into `bands` band keys; documents
    * sharing any band key are near-dup candidates. Returns
    * (band_idx, band_hash, id). Equi-join/groupBy on (band_idx,
    * band_hash) replaces the O(n²) pair scan — THE scale path. */
  def minHashBands(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val signed = withMinHashSignature(
      df.select(col(idCol).as("id"), col(textCol)), textCol, n, bands * rowsPerBand)
    signed.select(col("id"), col("sig"))
      .filter(col("sig").isNotNull) // shingle-less rows can't be near-dups
      .select(col("id"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> hash(slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))"))
        .as(Seq("band_idx", "band_hash")))
  }

  /** Candidate pairs from LSH buckets (distinct across bands). */
  def minHashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val banded = minHashBands(df, idCol, textCol, n, bands, rowsPerBand)
    val a = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_a"))
    val b = banded.select(col("band_idx").as("bi2"), col("band_hash").as("bh2"),
      col("id").as("id_b"))
    a.join(b,
        col("band_idx") === col("bi2") && col("band_hash") === col("bh2") &&
          col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Full near-dup pipeline: LSH candidates verified with exact n-gram
    * Jaccard ≥ threshold. */
  def minHashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val shingled = df.select(
      col(idCol).as("sid"), wordShingles(col(textCol), n).as("sh"))
    val cands = minHashCandidates(df, idCol, textCol, n, bands, rowsPerBand)
    cands
      .join(shingled.withColumnRenamed("sid", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(shingled.withColumnRenamed("sid", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          nullif(size(array_union(col("sh_a"), col("sh_b"))), lit(0)).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ----------------------------------------------------------- SimHash

  /** 64-bit SimHash over word shingles: per-bit vote of each shingle's
    * xxhash64, packed into one LONG. Near-dups have small Hamming
    * distance — at scale, group by key prefix to localize comparisons.
    * DataFrame-level because the bit arithmetic needs SQL `shiftright`
    * with a column-valued shift (the Scala DSL only takes Int). */
  def withSimHash64(df: DataFrame, textCol: String, n: Int = 1,
      outCol: String = "simhash"): DataFrame =
    df.withColumn("__sh_hashes",
        transform(wordShingles(col(textCol), n), t => xxhash64(t)))
      .withColumn(outCol, expr(
        """aggregate(
             zip_with(
               aggregate(__sh_hashes, array_repeat(0, 64),
                 (acc, h) -> zip_with(acc, sequence(0, 63),
                   (c, i) -> c + IF((shiftright(h, i) & 1) = 1, 1, -1))),
               sequence(0, 63),
               (c, i) -> IF(c > 0, shiftleft(1L, i), 0L)),
             0L, (a, x) -> a | x)"""))
      .drop("__sh_hashes")

  /** Hamming distance between two SimHash keys. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: candidates share at least one of the eight
    * 8-bit key blocks (block-permutation trick → equi-join, no O(n²));
    * by pigeonhole, every pair within Hamming distance ≤ 7 shares an
    * untouched block, so results are EXACT for maxDistance ≤ 7 —
    * verified by full Hamming distance afterwards. */
  def simHashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 1, maxDistance: Int = 7): DataFrame = {
    require(maxDistance <= 7, "8-block scheme guarantees exactness only for distance <= 7")
    val keyed = withSimHash64(df.select(col(idCol).as("id"), col(textCol)), textCol)
      .select(col("id"), col("simhash").as("key"))
    val blocked = keyed.select(col("id"), col("key"),
      posexplode(array((0 to 7).map(q =>
        shiftright(col("key"), q * 8).bitwiseAND(0xFFL)): _*))
        .as(Seq("block_idx", "block_val")))
    val a = blocked.select(col("block_idx"), col("block_val"),
      col("id").as("id_a"), col("key").as("key_a"))
    val b = blocked.select(col("block_idx").as("qi2"), col("block_val").as("qv2"),
      col("id").as("id_b"), col("key").as("key_b"))
    a.join(b,
        col("block_idx") === col("qi2") && col("block_val") === col("qv2") &&
          col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDistance(col("key_a"), col("key_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  // -------------------------------------------------- embedding cosine

  /** All-pairs embedding-cosine near-dups above a threshold. Correctness
    * baseline (O(n²)); use [[Similarity.lshSimilarityJoin]] at scale. */
  def embeddingCosinePairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val a = v.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = v.select(col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
