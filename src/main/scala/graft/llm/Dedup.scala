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

  /** Distinct word n-gram shingles (n=1 → distinct tokens), one codegen
    * pass (graft.functions.WordNgrams). A text shorter than n yields an
    * empty set. The equivalent `transform(sequence(1, cnt), i ->
    * array_join(slice(toks, i, n), ' '))` evaluates interpreted per gram
    * with two array allocations each — measured ~8s over 10k docs. */
  def wordShingles(text: Column, n: Int): Column = {
    require(n >= 1)
    graft.functions.F.wordNgrams(tokens(normalize(text)), n)
  }

  /** Exact n-gram Jaccard pairs above a (strictly positive) threshold.
    *
    * Shuffle-join formulation, not a cartesian: explode distinct shingles
    * (hashed to 64-bit — set sizes are counted BEFORE hashing, so only a
    * cross-doc xxhash64 collision could perturb a value, at ~n²/2⁶⁴
    * odds), equi-join on the shingle hash, count matches per pair, and
    * recover |union| = |A| + |B| - |A∩B|. Only pairs sharing ≥ 1 shingle
    * materialize — which is every pair that can clear threshold > 0 — so
    * cost tracks true overlap instead of n². Ubiquitous shingles still
    * fan out quadratically within their posting list; at corpus scale
    * prune those with a document-frequency cap or use
    * [[minHashCandidates]]. */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, dfCap: Option[Long] = None): DataFrame = {
    require(threshold > 0,
      "jaccardPairs emits only pairs sharing >= 1 shingle (threshold must be > 0)")
    val exploded = df.select(col(idCol).as("id"), wordShingles(col(textCol), n).as("sh"))
      .select(col("id"), size(col("sh")).as("nsh"), explode(col("sh")).as("shingle"))
      .select(col("id"), col("nsh"), xxhash64(col("shingle")).as("h"))
    // Optional skew guard for corpus scale: a shingle present in f docs
    // fans out f² candidate rows, so one ubiquitous shingle ("the of")
    // can dominate the join. Capping document frequency drops those
    // posting lists — the open-corpus dedup convention — at the cost of
    // slightly undercounting |A∩B| (and |A∪B| stays exact, so capped
    // jaccard is a LOWER bound: no false positives appear).
    val sh = dfCap match {
      case None => exploded
      case Some(cap) =>
        val rare = exploded.groupBy(col("h")).count()
          .filter(col("count") <= cap).select(col("h"))
        exploded.join(rare, "h")
    }
    val a = sh.select(col("id").as("id_a"), col("nsh").as("na"), col("h"))
    val b = sh.select(col("id").as("id_b"), col("nsh").as("nb"), col("h").as("h2"))
    a.join(b,
        col("h") === col("h2") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) /
          (col("na") + col("nb") - col("inter")).cast(DoubleType))
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
    // Raw xxhash64 per shingle in codegen; the fold into [0, p) happens
    // in the same JVM loop as the permutations (floorMod == pmod).
    val hashed = df.withColumn("__mh_hashes",
      graft.functions.F.xxhash64Array(wordShingles(col(textCol), n)))
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
            val folded = hs.iterator.map(h => java.lang.Math.floorMod(h, MersennePrime31)).toArray
            val out = new Array[Long](params.length)
            var i = 0
            while (i < params.length) {
              val (a, b) = params(i)
              var min = Long.MaxValue
              var j = 0
              while (j < folded.length) {
                val v = (a * folded(j) + b) % MersennePrime31
                if (v < min) min = v
                j += 1
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
    // merge-hint: the banded side sits behind the mapPartitions
    // signature barrier, so Catalyst's size estimate is fiction — at
    // ×100 it broadcast 16M banded rows AND kept the probe side at the
    // input's (few) partitions, pinning two tasks for 40+ min. The
    // shuffle join both avoids the broadcast and re-spreads the pair
    // fan-out across spark.sql.shuffle.partitions.
    a.hint("merge").join(b,
        col("band_idx") === col("bi2") && col("band_hash") === col("bh2") &&
          col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact-Jaccard verification of candidate pairs — the second stage of
    * the MinHash pipeline, exposed separately so the candidate set can be
    * materialized (and independently checked) between the stages.
    *
    * Verifies on 64-bit shingle hashes, not strings: intersect/union on
    * longs, same jaccard modulo ~n²/2⁶⁴ collision odds (and consistent
    * with jaccardPairs, which hashes the same way). */
  def verifyJaccard(
      cands: DataFrame, df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val shingled = df.select(
      col(idCol).as("sid"),
      graft.functions.F.xxhash64Array(wordShingles(col(textCol), n)).as("sh"))
    // merge-hint: when cands flows straight out of the banding join
    // (no materialization between), Catalyst size-estimates the
    // band-join output near zero and BROADCASTS the candidate set —
    // at ×100 that is tens of millions of pairs hashed into every
    // task (measured: single tasks pinned for 40+ minutes). Candidate
    // sets are unbounded by construction; never broadcast them.
    cands.select(col("id_a"), col("id_b")).hint("merge")
      .join(shingled.withColumnRenamed("sid", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(shingled.withColumnRenamed("sid", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          nullif(size(array_union(col("sh_a"), col("sh_b"))), lit(0)).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full near-dup pipeline: LSH candidates verified with exact n-gram
    * Jaccard ≥ threshold. */
  def minHashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame =
    verifyJaccard(
      minHashCandidates(df, idCol, textCol, n, bands, rowsPerBand),
      df, idCol, textCol, n, threshold)

  // ------------------------------------- incremental near-dup index

  /** Materialize a corpus's near-dup index: the LSH band postings
    * `(band_idx, band_hash, id)` and the per-doc shingle hashes
    * `(id, sh)`. A later batch probes BOTH without ever re-reading or
    * re-hashing corpus text — the continuous-ingest shape of
    * MinHash-LSH, where the 100 TB corpus is hashed exactly once and
    * each day's increment pays only its own size. */
  def materializeNearDupIndex(
      df: DataFrame, idCol: String, textCol: String, path: String,
      n: Int = 2, bands: Int = 16, rowsPerBand: Int = 4,
      append: Boolean = false): Unit = {
    val mode = if (append) "append" else "overwrite"
    minHashBands(df, idCol, textCol, n, bands, rowsPerBand)
      .write.mode(mode).parquet(s"$path/bands")
    df.select(col(idCol).as("id"),
        graft.functions.F.xxhash64Array(
          wordShingles(col(textCol), n)).as("sh"))
      .write.mode(mode).parquet(s"$path/shingles")
  }

  /** Near-dups of a NEW batch against a [[materializeNearDupIndex]]
    * index: the batch's band signatures equi-join the persisted
    * postings (hash join on (band_idx, band_hash) — never batch ×
    * corpus), and exact Jaccard verification joins shingles for
    * CANDIDATE ids only. Cost scales with the batch and its candidate
    * fan-out, not the corpus; after filtering, append the surviving
    * novel docs back into the index with `append = true` and the loop
    * closes. Returns (batch_id, corpus_id, jaccard ≥ threshold). */
  def incrementalNearDups(
      spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, idCol: String, textCol: String,
      n: Int = 2, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame =
    verifyIncrementalCandidates(
      spark, path,
      incrementalNearDupCandidates(
        spark, path, batch, idCol, textCol, n, bands, rowsPerBand),
      batch, idCol, textCol, n, threshold)

  /** Candidate stage of [[incrementalNearDups]]: batch band signatures
    * equi-joined against the persisted postings. Exposed separately so
    * the (seed-specific) candidate set can be materialized and
    * independently verified. */
  def incrementalNearDupCandidates(
      spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, idCol: String, textCol: String,
      n: Int = 2, bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val idxBands = spark.read.parquet(s"$path/bands")
    // merge-hint for the same reason as minHashCandidates: the batch
    // side sits behind the signature barrier, so size estimates are
    // fiction — never let a corpus-sized posting list broadcast.
    minHashBands(batch, idCol, textCol, n, bands, rowsPerBand)
      .select(col("band_idx"), col("band_hash"), col("id").as("batch_id"))
      .hint("merge")
      .join(idxBands.select(
          col("band_idx"), col("band_hash"), col("id").as("corpus_id")),
        Seq("band_idx", "band_hash"))
      .select(col("batch_id"), col("corpus_id")).distinct()
  }

  /** Verification stage of [[incrementalNearDups]]: exact Jaccard over
    * candidate ids only — batch shingles come from the batch frame,
    * corpus shingles from the index (corpus text is never re-read). */
  def verifyIncrementalCandidates(
      spark: org.apache.spark.sql.SparkSession, path: String,
      cands: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val batchSh = batch.select(
      col(idCol).as("bsid"),
      graft.functions.F.xxhash64Array(
        wordShingles(col(textCol), n)).as("sh_a"))
    val corpusSh = spark.read.parquet(s"$path/shingles")
      .select(col("id").as("csid"), col("sh").as("sh_b"))
    cands
      .hint("merge")
      .join(batchSh, col("batch_id") === col("bsid"))
      .join(corpusSh, col("corpus_id") === col("csid"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          nullif(size(array_union(col("sh_a"), col("sh_b"))), lit(0))
            .cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
  }

  // ----------------------------------------------------------- SimHash

  /** 64-bit SimHash over word shingles: per-bit vote of each shingle's
    * xxhash64 (seed 42, same as the builtin), packed into one LONG.
    * Near-dups have small Hamming distance — at scale, group by key
    * prefix to localize comparisons. One custom codegen expression
    * (graft.functions.SimHash64Expr): the equivalent
    * aggregate/zip_with formulation allocates a 64-long vote array per
    * shingle and evaluates every lambda interpreted. */
  def withSimHash64(df: DataFrame, textCol: String, n: Int = 1,
      outCol: String = "simhash"): DataFrame =
    df.withColumn(outCol,
      graft.functions.F.simhash64(wordShingles(col(textCol), n)))

  /** Hamming distance between two SimHash keys. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: candidates share at least one of the eight
    * 8-bit key blocks (block-permutation trick → equi-join, no O(n²));
    * by pigeonhole, every pair within Hamming distance ≤ 7 shares an
    * untouched block, so results are EXACT for maxDistance ≤ 7 —
    * verified by full Hamming distance afterwards. */
  def simHashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 1, maxDistance: Int = 7,
      blockCap: Option[Long] = None): DataFrame =
    simHashNearDupsFromKeys(
      withSimHash64(df.select(col(idCol).as("id"), col(textCol)), textCol, n)
        .select(col("id"), col("simhash").as("skey")),
      maxDistance, blockCap)

  /** Pair stage of [[simHashNearDups]] over a precomputed `(id, skey)`
    * frame — exposed separately so the keys can be materialized (and the
    * exact ≤7-bit pair set recomputed independently from them).
    *
    * SCALE CEILING (measured by tools.ScaleStress): the 8×8-bit
    * pigeonhole scheme puts ~n/256 docs in the average (block, value)
    * bucket, so candidate pairs grow O(n²/256) REGARDLESS of content —
    * at 10⁶ docs that is ~10¹⁰ candidates. `blockCap` drops buckets
    * larger than the cap (the posting-list guard the other sketch ops
    * use): the ≤7-bit guarantee then becomes a lower bound. Beyond
    * ~10⁵ docs prefer MinHash-LSH (whose bucket sizes track true
    * similarity, not signature-space density) or widen the signature;
    * the exact ≤7-of-64-bit contract fundamentally requires quadratic
    * candidates at this block width. */
  def simHashNearDupsFromKeys(
      keyed: DataFrame, maxDistance: Int = 7,
      blockCap: Option[Long] = None): DataFrame = {
    require(maxDistance <= 7, "8-block scheme guarantees exactness only for distance <= 7")
    val k = keyed.select(col("id"), col("skey").as("key"))
    val blocked0 = k.select(col("id"), col("key"),
      posexplode(array((0 to 7).map(q =>
        shiftright(col("key"), q * 8).bitwiseAND(0xFFL)): _*))
        .as(Seq("block_idx", "block_val")))
    val blocked = blockCap match {
      case None => blocked0
      case Some(cap) =>
        val rare = blocked0.groupBy(col("block_idx"), col("block_val"))
          .count().filter(col("count") <= cap)
          .select(col("block_idx").as("ri"), col("block_val").as("rv"))
        blocked0.join(rare,
          col("block_idx") === col("ri") && col("block_val") === col("rv"))
          .drop("ri", "rv")
    }
    val a = blocked.select(col("block_idx"), col("block_val"),
      col("id").as("id_a"), col("key").as("key_a"))
    val b = blocked.select(col("block_idx").as("qi2"), col("block_val").as("qv2"),
      col("id").as("id_b"), col("key").as("key_b"))
    // Emit each pair only from its LOWEST matching block: with key_a and
    // key_b in hand the "no earlier block also matched" predicate is a
    // pure codegen filter, replacing a distinct() that would shuffle
    // every surviving pair (the near-dup result set can be huge by
    // design — this corpus yields millions of pairs).
    val noEarlierMatch = (0 to 6).map { j =>
      when(lit(j) < col("block_idx"),
        shiftright(col("key_a"), j * 8).bitwiseAND(0xFFL) =!=
          shiftright(col("key_b"), j * 8).bitwiseAND(0xFFL))
        .otherwise(lit(true))
    }.reduce(_ && _)
    a.join(b,
        col("block_idx") === col("qi2") && col("block_val") === col("qv2") &&
          col("id_a") < col("id_b"))
      .filter(noEarlierMatch)
      .select(col("id_a"), col("id_b"),
        hammingDistance(col("key_a"), col("key_b")).as("hamming"))
      .filter(col("hamming") <= maxDistance)
  }

  /** 128-bit SimHash — THE SCALE PATH the 64-bit scheme lacks: two
    * independently-seeded 64-bit simhashes (the second over
    * sentinel-salted shingles, which re-randomizes every per-shingle
    * hash) concatenate to a 128-bit signature split into eight 16-BIT
    * pigeonhole blocks. Same ≤7-bit exactness guarantee, but the
    * average (block, value) bucket holds n/65536 docs instead of n/256
    * — candidate pairs stay near-linear to ~10⁷ docs where the 64-bit
    * scheme (O(n²/256)) dies at ~10⁵. */
  def withSimHash128(df: DataFrame, textCol: String, n: Int = 1,
      out1: String = "skey1", out2: String = "skey2"): DataFrame = {
    val sh = wordShingles(col(textCol), n)
    // visible U+0001 escape (NOT a raw control byte): the sentinel must
    // survive formatters/copy-paste, else skey2 collapses to skey1 and
    // the scheme silently degrades to a duplicated 64-bit signature
    val salted = transform(sh, s => concat(s, lit("\u0001")))
    df.withColumn(out1, graft.functions.F.simhash64(sh))
      .withColumn(out2, graft.functions.F.simhash64(salted))
  }

  def simHash128NearDups(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 1, maxDistance: Int = 7,
      blockCap: Option[Long] = None): DataFrame =
    simHash128NearDupsFromKeys(
      withSimHash128(df.select(col(idCol).as("id"), col(textCol)), textCol, n)
        .select(col("id"), col("skey1"), col("skey2")),
      maxDistance, blockCap)

  /** Pair stage of [[simHash128NearDups]] over precomputed
    * `(id, skey1, skey2)` keys. Same lowest-matching-block dedup and
    * optional bucket cap as the 64-bit form. */
  def simHash128NearDupsFromKeys(
      keyed: DataFrame, maxDistance: Int = 7,
      blockCap: Option[Long] = None): DataFrame = {
    require(maxDistance <= 7, "8-block scheme guarantees exactness only for distance <= 7")
    def slice(k1: Column, k2: Column, j: Int): Column =
      if (j < 4) shiftright(k1, j * 16).bitwiseAND(0xFFFFL)
      else shiftright(k2, (j - 4) * 16).bitwiseAND(0xFFFFL)
    val k = keyed.select(col("id"), col("skey1"), col("skey2"))
    val blocked0 = k.select(col("id"), col("skey1"), col("skey2"),
      posexplode(array((0 to 7).map(q =>
        slice(col("skey1"), col("skey2"), q)): _*))
        .as(Seq("block_idx", "block_val")))
    val blocked = blockCap match {
      case None => blocked0
      case Some(cap) =>
        val rare = blocked0.groupBy(col("block_idx"), col("block_val"))
          .count().filter(col("count") <= cap)
          .select(col("block_idx").as("ri"), col("block_val").as("rv"))
        blocked0.join(rare,
          col("block_idx") === col("ri") && col("block_val") === col("rv"))
          .drop("ri", "rv")
    }
    val a = blocked.select(col("block_idx"), col("block_val"),
      col("id").as("id_a"), col("skey1").as("a1"), col("skey2").as("a2"))
      // merge-hint: behind unmaterialized key computation Catalyst's
      // size estimate is fiction — never broadcast a blocked side (see
      // minHashCandidates); the shuffle join also re-spreads the block
      // fan-out across shuffle partitions instead of the input's few
      .hint("merge")
    val b = blocked.select(col("block_idx").as("qi2"), col("block_val").as("qv2"),
      col("id").as("id_b"), col("skey1").as("b1"), col("skey2").as("b2"))
    val noEarlierMatch = (0 to 6).map { j =>
      when(lit(j) < col("block_idx"),
        slice(col("a1"), col("a2"), j) =!= slice(col("b1"), col("b2"), j))
        .otherwise(lit(true))
    }.reduce(_ && _)
    a.join(b,
        col("block_idx") === col("qi2") && col("block_val") === col("qv2") &&
          col("id_a") < col("id_b"))
      .filter(noEarlierMatch)
      .select(col("id_a"), col("id_b"),
        (hammingDistance(col("a1"), col("b1")) +
          hammingDistance(col("a2"), col("b2"))).as("hamming"))
      .filter(col("hamming") <= maxDistance)
  }

  /** Policy front door for near-dup detection — the third verse of the
    * corpus-sized auto-switch pattern (IVF `trainIvfCentroids` >1M →
    * distributed Lloyd; `semanticDedupPairsAuto` k ∝ n): pick the
    * algorithm from the corpus size so no caller ships the structurally
    * super-linear path at the wrong scale.
    *
    *  - '''small corpus''' (≤ `simhashMaxRows`, default 100k): SimHash-128
    *    — EXACT for Hamming ≤ 7 by pigeonhole, no seed sensitivity, but
    *    candidate pairs grow ∝ n²/65536 across uniformly small buckets
    *    (measured ×100 slope 2.0 in SCALE.md): at 100k docs that is
    *    ~150M block comparisons — the knee; at 10⁶ it is already 100×
    *    worse, which the ×100 stress measured as two 40-minute tasks.
    *  - '''large corpus''': MinHash-LSH banding + exact-Jaccard verify —
    *    probabilistic recall (≥0.95 pinned in LlmSpec) with bucket-join
    *    candidates that stay near-linear (measured slope 1.21).
    *
    * The corpus size probe is a LIMIT-bounded count: it reads at most
    * `simhashMaxRows + 1` rows, never the whole 100 TB table, and is
    * skipped entirely when the caller already knows the count.
    * Returns (method, pairs(id_a, id_b)) — the unified contract both
    * branches share. */
  def nearDupsAuto(
      df: DataFrame, idCol: String, textCol: String,
      simhashMaxRows: Long = 100000L,
      simhashN: Int = 1, maxDistance: Int = 7,
      minhashN: Int = 2, bands: Int = 8, rowsPerBand: Int = 8,
      jaccardThreshold: Double = 0.7,
      knownCount: Option[Long] = None): (String, DataFrame) = {
    val cap = math.min(simhashMaxRows, Int.MaxValue.toLong - 1)
    val n = knownCount.getOrElse(
      df.select(lit(1)).limit((cap + 1).toInt).count())
    if (n <= simhashMaxRows)
      ("simhash128",
        simHash128NearDups(df, idCol, textCol, simhashN, maxDistance)
          .select(col("id_a"), col("id_b")))
    else
      ("minhash_lsh",
        verifyJaccard(
          minHashCandidates(df, idCol, textCol, minhashN, bands, rowsPerBand),
          df, idCol, textCol, minhashN, jaccardThreshold)
          .select(col("id_a"), col("id_b")))
  }

  // ------------------------------------------------- winnowing overlap

  /** Containment/partial-overlap candidate pairs via winnowing
    * fingerprints: documents sharing ≥ `minShared` local fingerprints.
    * Catches copied PASSAGES (quotes, boilerplate, plagiarized spans)
    * that whole-document similarity misses — by the winnowing guarantee,
    * any shared run of ≥ w+k-1 normalized bytes surfaces here. Same
    * posting-list join shape as [[jaccardPairs]]: shuffle on the
    * fingerprint, pairs only within posting lists. */
  def winnowOverlapPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, minShared: Int = 2,
      dfCap: Option[Long] = None): DataFrame =
    overlapFromPostings(
      winnowPostings(df, idCol, textCol, k, w, dfCap), minShared)

  /** Posting stage of [[winnowOverlapPairs]]: distinct `(id, fp)` rows,
    * one per document × winnowing fingerprint — exposed separately so the
    * postings can be materialized (and the overlap join recomputed
    * independently from them). */
  def winnowPostings(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, dfCap: Option[Long] = None): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
        explode(TextAnalysis.winnowFingerprints(col(textCol), k, w)).as("fp"))
      .distinct()
    // Same skew guard as [[jaccardPairs]]: a boilerplate passage present
    // in f docs fans out f² rows on its fingerprints; capping document
    // frequency drops those posting lists (shared counts become a lower
    // bound — pairs can only disappear, never appear).
    dfCap match {
      case None => exploded
      case Some(cap) =>
        val rare = exploded.groupBy(col("fp")).count()
          .filter(col("count") <= cap).select(col("fp"))
        exploded.join(rare, "fp")
    }
  }

  /** Overlap stage of [[winnowOverlapPairs]]: posting-list self-join on
    * the fingerprint, count shared fingerprints per pair. */
  def overlapFromPostings(postings: DataFrame, minShared: Int): DataFrame = {
    val a = postings.select(col("id").as("id_a"), col("fp"))
    val b = postings.select(col("id").as("id_b"), col("fp").as("fp2"))
    a.join(b, col("fp") === col("fp2") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= minShared)
  }

  /** Exact shared-token-run detection — the substring-dedup semantics of
    * Lee et al. (2022), "Deduplicating Training Data Makes Language
    * Models Better", at token grain: report document pairs sharing a run
    * of ≥ `minRunTokens` CONSECUTIVE tokens, with the run count and the
    * longest run per pair. Where [[winnowOverlapPairs]] samples local
    * fingerprints (approximate, cheap), this measures the exact run
    * length — the thing the suffix-array pass in the paper computes —
    * using only joins and keyed windows:
    *
    *   1. posting list of k-token gram hashes WITH positions,
    *   2. equi-join on the gram hash (posting-list shape — never doc×doc),
    *   3. group matches by alignment diagonal (posA − posB): a shared run
    *      of t tokens is exactly a chain of t−k+1 consecutive gram
    *      matches on ONE diagonal,
    *   4. islands trick (pos − row_number is constant inside a
    *      consecutive chain) to measure each chain — the window is keyed
    *      by (pair, diagonal), so it parallelizes.
    *
    * `dfCap` is the usual posting-list skew guard (boilerplate grams fan
    * out f² — capping drops them; runs through a dropped gram split in
    * two, so reported max runs become a lower bound). */
  def sharedTokenRuns(
      df: DataFrame, idCol: String, textCol: String,
      gramSize: Int = 8, minRunTokens: Int = 16,
      dfCap: Option[Long] = None): DataFrame = {
    require(minRunTokens >= gramSize, "a run shorter than one gram is unobservable")
    val postings = tokenGramPostings(df, idCol, textCol, gramSize, dfCap)
    val a = postings.select(col("id").as("id_a"), col("pos").as("pa"), col("h"))
    val b = postings.select(col("id").as("id_b"), col("pos").as("pb"), col("h").as("h2"))
    val w = Window.partitionBy(col("id_a"), col("id_b"), col("diag"))
      .orderBy(col("pa"))
    a.join(b, col("h") === col("h2") && col("id_a") < col("id_b"))
      .withColumn("diag", col("pa") - col("pb"))
      .withColumn("island", col("pa") - row_number().over(w))
      .groupBy(col("id_a"), col("id_b"), col("diag"), col("island"))
      .agg((count(lit(1)) + (gramSize - 1)).as("run_tokens"))
      .filter(col("run_tokens") >= minRunTokens)
      .groupBy(col("id_a"), col("id_b"))
      .agg(
        count(lit(1)).as("n_runs"),
        max(col("run_tokens")).as("max_run_tokens"))
  }

  /** Posting stage of [[sharedTokenRuns]]: one row per (doc, gram
    * position), gram hashed to 64 bits so the join shuffles fixed-width
    * keys, not strings. Exposed for materialization. */
  def tokenGramPostings(
      df: DataFrame, idCol: String, textCol: String,
      gramSize: Int, dfCap: Option[Long] = None): DataFrame = {
    // sequence(0, n) DESCENDS when n < 0 — guard short docs explicitly.
    val grams = when(size(col("__toks")) >= gramSize,
      expr(s"transform(sequence(0, size(__toks) - $gramSize), " +
        s"i -> xxhash64(concat_ws(' ', slice(__toks, i + 1, $gramSize))))"))
      .otherwise(array().cast(ArrayType(LongType)))
    val exploded = df
      .select(col(idCol).as("id"), tokens(normalize(col(textCol))).as("__toks"))
      .select(col("id"), posexplode(grams).as(Seq("pos", "h")))
    dfCap match {
      case None => exploded
      case Some(cap) =>
        val rare = exploded.groupBy(col("h")).count()
          .filter(col("count") <= cap).select(col("h"))
        exploded.join(rare, "h")
    }
  }

  /** Exact passage-level duplicates (the C4/web-corpus boilerplate
    * detector): explode lines, fingerprint each normalized line of ≥
    * `minChars`, and report fingerprints appearing in ≥ `minDocs`
    * distinct documents. One shuffle on the md5 key — the passage-grain
    * analogue of [[exactDuplicateGroups]]; [[winnowOverlapPairs]] finds
    * the fuzzy/containment cases this exact matcher can't. */
  def passageDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      minChars: Int = 20, minDocs: Int = 2): DataFrame =
    df.select(col(idCol).as("id"),
        explode(split(col(textCol), "\n")).as("line"))
      .withColumn("norm", normalize(col("line")))
      .filter(length(col("norm")) >= minChars)
      .groupBy(md5(col("norm")).as("passage_fp"))
      .agg(
        countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)

  /** C4-style boilerplate REMOVAL (the rewrite step on top of
    * [[passageDuplicates]]'s detector): drop every line whose normalized
    * fingerprint appears in ≥ `minDocs` distinct documents, reconstruct
    * each document's remaining lines in original order, and report
    * (n_lines, n_removed, cleaned text hash) per document — documents
    * whose every line is boilerplate survive with empty cleaned text,
    * not silently disappear.
    *
    * Scale shape: one posexplode (no data motion), one line-fingerprint
    * aggregate to build the hot set, one left_anti equi-join on the
    * 128-bit fingerprint (high-cardinality key — no skew guard needed;
    * the HOT side of the join is the small aggregated set), one per-doc
    * re-aggregation. The per-doc collect_list is bounded by document
    * size, the same bound any per-doc rewrite has. Short lines
    * (< `minChars` normalized) never enter the hot set and are always
    * kept, mirroring the detector's threshold. */
  def stripBoilerplate(
      df: DataFrame, idCol: String, textCol: String,
      minChars: Int = 20, minDocs: Int = 2): DataFrame = {
    // NULL text reads as empty (same present-but-NULL semantic as
    // [[graft.llm.Curation.corpusDiff]]): without the coalesce,
    // split(NULL) is NULL, posexplode drops the doc from `lines` AND
    // n_lines goes NULL — the output would then claim md5('') cleaned
    // content with NULL counts, silently skipping those docs from any
    // n_removed rollup.
    val src = df.select(col(idCol).as("id"),
      coalesce(col(textCol), lit("")).as("__text"))
    val lines = src.select(col("id"),
        posexplode(split(col("__text"), "\n")).as(Seq("pos", "line")))
      .withColumn("fp",
        when(length(normalize(col("line"))) >= minChars,
          md5(normalize(col("line")))))
    val hot = lines.filter(col("fp").isNotNull)
      .groupBy(col("fp"))
      .agg(countDistinct(col("id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("fp"))
    val rebuilt = lines
      .join(hot, Seq("fp"), "left_anti")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")),
          "\n").as("__cleaned"))
    src.select(col("id"),
        size(split(col("__text"), "\n")).cast(LongType).as("n_lines"))
      .join(rebuilt, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        md5(coalesce(col("__cleaned"), lit(""))).as("cleaned_md5"))
  }

  // ------------------------------------------- near-dup canonicalization

  /** Resolve near-dup PAIRS into connected components and assign each
    * doc the minimum id of its component as `canonical_id` — the
    * keep-one step every dedup pipeline runs after MinHash/SimHash.
    *
    * Since round 9 this routes through
    * [[graft.llm.Graph.connectedComponents]] (alternating large-star /
    * small-star contraction): O(log diameter) rounds instead of the
    * label-propagation baseline's O(diameter), which is the difference
    * between "runs" and "doesn't" on chain-shaped components (templated
    * / serially-edited docs where consecutive versions overlap but
    * endpoints don't). Docs in no pair keep their own id.
    *
    * `ids` = one row per doc id; `pairs` = (id_a, id_b) near-dup pairs. */
  def canonicalizeNearDups(
      ids: DataFrame, pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val labels = Graph.connectedComponents(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
      maxRounds = maxIter)
    ids.select(col(ids.columns.head).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("canonical_id"))
  }

  /** The O(diameter) min-label-propagation fixpoint — superseded by the
    * star-contraction path above, KEPT as the independent small-slice
    * verification baseline (GraphSpec pins the two implementations
    * multiset-identical on random graphs): each step joins current
    * labels to the (bidirected) edge list and takes the min over self +
    * neighbors until a distributed fixpoint check passes. One shuffle
    * per diameter hop; every 5 rounds the label frame is locally
    * checkpointed so the plan tree stays bounded. A non-converged exit
    * (diameter > maxIter) is logged loudly. */
  private[graft] def canonicalizeNearDupsLabelProp(
      ids: DataFrame, pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val checkpointEvery = 5
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = ids.select(col(ids.columns.head).as("id"))
      .withColumn("canonical_id", col("id")).persist()
    try {
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        val neighborMin = edges
          .join(labels, edges("dst") === labels("id"))
          .groupBy(col("src")).agg(min(col("canonical_id")).as("nmin"))
        val stepped = labels
          .join(neighborMin, labels("id") === neighborMin("src"), "left")
          .select(col("id"),
            least(col("canonical_id"), coalesce(col("nmin"), col("canonical_id")))
              .as("canonical_id"))
        // localCheckpoint (eager) truncates lineage: without it the plan
        // deepens by one join per round and Catalyst re-analysis cost
        // grows superlinearly on high-diameter components.
        val next =
          if ((iter + 1) % checkpointEvery == 0) stepped.localCheckpoint()
          else stepped.persist()
        val changed = next.alias("n")
          .join(labels.alias("p"), col("n.id") === col("p.id"))
          .filter(col("n.canonical_id") =!= col("p.canonical_id"))
          .limit(1).count()
        labels.unpersist()
        labels = next
        converged = changed == 0
        iter += 1
      }
      if (!converged)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"canonicalizeNearDupsLabelProp did NOT converge after $maxIter iterations; " +
            "canonical_id values are only partially propagated " +
            "(component diameter exceeds maxIter)")
      labels
    } finally { edges.unpersist(); () }
  }

  /** End-to-end near-dup keep-one: MinHash candidates → Jaccard verify →
    * components → keep each component's minimum id. */
  def dedupNear(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val pairs = minHashNearDups(df, idCol, textCol, n, bands, rowsPerBand, threshold)
    val labels = canonicalizeNearDups(df.select(col(idCol)), pairs)
    df.join(labels.filter(col("id") === col("canonical_id")).select(col("id")),
      df(idCol) === col("id"), "left_semi")
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
