package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Value-level checks for the LLM-pipeline operators — especially the
  * sketch/LSH paths that the DuckDB gate can only rows-check.
  */
class LlmSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents").persist()
  private lazy val vecs = Tables.load(spark, sfDir, "embeddings").persist()

  private lazy val nearDupDocs = docs.unionByName(docs.select(
    (col("doc_id") + 20000).as("doc_id"),
    concat(col("text"), lit(" graftmarker")).as("text"),
    col("lang"), col("source"), col("n_chars")))

  test("wordShingles produces ordered distinct n-grams") {
    val df = Seq((1L, "a b c b c")).toDF("id", "text")
    val sh = df.select(Dedup.wordShingles(col("text"), 2).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(sh.toSet === Set("a b", "b c", "c b"))
    val short = Seq((1L, "one")).toDF("id", "text")
      .select(Dedup.wordShingles(col("text"), 3).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(short.isEmpty) // no fabricated shingles below n tokens
  }

  test("minhash signature agreement approximates true Jaccard") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // 7/9 shared 1-grams
      (3L, "completely different words entirely here now")).toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"),
      Dedup.minHashSignature(col("text"), n = 1, k = 128).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def agree(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    assert(agree(sigs(1L), sigs(2L)) > 0.55 && agree(sigs(1L), sigs(2L)) < 0.95)
    assert(agree(sigs(1L), sigs(3L)) < 0.15)
  }

  test("minhash LSH near-dup detection: high recall + precision vs exact baseline") {
    val exact = Dedup.jaccardPairs(nearDupDocs, "doc_id", "text", n = 2, threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Dedup.minHashNearDups(nearDupDocs, "doc_id", "text",
      n = 2, bands = 16, rowsPerBand = 4, threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Verification step makes precision exact by construction; recall from
    // banding should be near-total at jaccard >= 0.7 with b=16, r=4.
    assert(approx.subsetOf(exact))
    assert(exact.nonEmpty)
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"LSH recall $recall too low (${exact.size} true pairs)")
    // every injected near-dup (id, id+20000) must be found
    val injected = docs.select("doc_id").collect().map(_.getLong(0))
      .map(id => (id, id + 20000)).toSet
    assert(injected.subsetOf(approx))
  }

  test("nearDupsAuto: threshold picks the algorithm; both branches find injected dups") {
    // small corpus → simhash128 branch, exact vs the in-corpus reference
    val (m1, p1) = Dedup.nearDupsAuto(nearDupDocs, "doc_id", "text")
    assert(m1 === "simhash128")
    val autoPairs = p1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val refPairs = Dedup.simHash128NearDups(nearDupDocs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(autoPairs === refPairs)

    // forcing a tiny threshold flips to the minhash branch, which must
    // still find every injected (id, id+20000) near-dup end-to-end;
    // knownCount skips the probe so the policy is testable without data
    val (m2, p2) = Dedup.nearDupsAuto(nearDupDocs, "doc_id", "text",
      simhashMaxRows = 10)
    assert(m2 === "minhash_lsh")
    val mhPairs = p2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val injected = docs.select("doc_id").collect().map(_.getLong(0))
      .map(id => (id, id + 20000)).toSet
    assert(injected.subsetOf(mhPairs))

    // knownCount bypasses the bounded probe entirely
    val (m3, _) = Dedup.nearDupsAuto(nearDupDocs, "doc_id", "text",
      knownCount = Some(50000000L))
    assert(m3 === "minhash_lsh")
  }

  test("simhash: identical text → distance 0; near-dup → small; finds injected pairs") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "entirely unrelated content about database engines and queries"))
      .toDF("doc_id", "text")
    val keyed = Dedup.withSimHash64(df, "text")
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keyed(1L) === keyed(2L))
    assert(java.lang.Long.bitCount(keyed(1L) ^ keyed(3L)) <= 12)
    assert(java.lang.Long.bitCount(keyed(1L) ^ keyed(4L)) > 12)

    // The 8-block scheme is EXACT for distance <= 7: the LSH result must
    // equal the brute-force all-pairs answer on the simhash keys.
    val keys = Dedup.withSimHash64(nearDupDocs, "text")
      .select("doc_id", "simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (ia, ka) <- keys; (ib, kb) <- keys
      if ia < ib && java.lang.Long.bitCount(ka ^ kb) <= 7
    } yield (ia, ib)).toSet
    val pairs = Dedup.simHashNearDups(nearDupDocs, "doc_id", "text", n = 1, maxDistance = 7)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === expected, s"LSH ${pairs.size} pairs vs brute-force ${expected.size}")
    assert(expected.nonEmpty)
  }

  test("random-projection ANN join recalls injected identical vectors") {
    val dupVecs = vecs.unionByName(vecs.select(
      (col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label")))
    val pairs = Similarity.lshSimilarityJoin(
      dupVecs, "vec_id", "embedding", maxDistance = 0.1,
      numHashTables = 4, bucketLength = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val injected = vecs.select("vec_id").collect().map(_.getLong(0))
      .map(id => (id, id + 10000)).toSet
    val recall = injected.intersect(pairs).size.toDouble / injected.size
    assert(recall >= 0.95, s"ANN recall $recall")
    // identical-vector pairs have distance ~0
    assert(pairs.nonEmpty)
  }

  test("lshCandidatePairs bucketCap: generous cap exact, oversized buckets dropped") {
    val dupVecs = vecs.unionByName(vecs.select(
      (col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label")))
    def cands(cap: Int) = Similarity.lshCandidatePairs(
        dupVecs, "vec_id", "embedding",
        numHashTables = 4, bucketLength = 1.0, bucketCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = cands(0)
    // a cap above every bucket size changes nothing
    assert(cands(100000) === uncapped)
    // cap 1 drops every pair-producing bucket (pairs need ≥2 ids) —
    // the lower-bound semantics in one line
    assert(cands(1).isEmpty && uncapped.nonEmpty)
  }

  test("semanticDedupPairsAuto sizes k to the corpus and matches the manual path") {
    val dupVecs = vecs.unionByName(vecs.select(
      (col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label")))
    val n = dupVecs.count()
    val target = 16L
    val k = math.max(8L, (n + target - 1) / target).toInt
    assert(k > 8, "fixture must exercise the scaled-k branch")
    val auto = Similarity.semanticDedupPairsAuto(
        dupVecs, "vec_id", "embedding", minCosine = 0.999,
        targetClusterSize = target)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val manual = Similarity.semanticDedupPairs(
        dupVecs, "vec_id", "embedding",
        Similarity.trainIvfCentroids(dupVecs, "embedding", k),
        minCosine = 0.999)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto === manual)
    // the injected identical twins are found (same cluster always)
    val injected = vecs.select("vec_id").collect().map(_.getLong(0))
      .map(id => (id, id + 10000)).toSet
    val recall = injected.intersect(auto).size.toDouble / injected.size
    assert(recall >= 0.95, s"auto-k recall $recall")
  }

  test("winnowing: shared substring guarantee, identical docs share all fingerprints") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "completely unrelated text about database engines " +
        "and the quick brown fox jumps over the lazy dog near the river bank today ok"),
      (4L, "nothing in common with anything else zzz qqq www eee rrr ttt yyy uuu"))
      .toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
        TextAnalysis.winnowFingerprints(col("text"), k = 8, w = 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) === fps(2L)) // identical docs → identical fingerprints
    assert(fps(1L).intersect(fps(3L)).size >= 3) // long shared substring surfaces
    assert(fps(1L).intersect(fps(4L)).isEmpty || fps(1L).intersect(fps(4L)).size <= 1)

    val pairs = Dedup.winnowOverlapPairs(df, "doc_id", "text", minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("near-dup canonicalization: min-id per component, chain depth handled") {
    // components: {1,2,3,4} (a chain), {10,11}, singleton {20}
    val ids = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.canonicalizeNearDups(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))

    // dedupNear keeps exactly one survivor per near-dup cluster: the
    // injected (id, id+20000) copies collapse onto the original ids
    val kept = Dedup.dedupNear(nearDupDocs, "doc_id", "text",
        n = 2, bands = 16, rowsPerBand = 4, threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.forall(_ < 20000), s"near-dup copies survived: ${kept.filter(_ >= 20000)}")
    assert(kept.nonEmpty)
  }

  test("token chunking covers every token with the declared overlap") {
    val nToks = 100
    val text = (0 until nToks).map(i => s"w$i").mkString(" ")
    val chunks = Seq((1L, text)).toDF("doc_id", "text")
      .select(explode(TextAnalysis.tokenChunks(col("text"), 32, 24)).as("c"))
      .select(col("c.chunk_idx"), col("c.start_token"), col("c.n_tokens"),
        col("c.chunk_text"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(_._1)
    // ceil((100-32)/24)+1 = 4 chunks; starts 0,24,48,72; last is short
    assert(chunks.map(_._2).toSeq === Seq(0, 24, 48, 72))
    assert(chunks.map(_._3).toSeq === Seq(32, 32, 32, 28))
    // every token appears in at least one chunk, in position order
    val covered = chunks.flatMap { case (_, start, n, txt) =>
      val toks = txt.split(" ")
      assert(toks.length === n)
      toks.zipWithIndex.map { case (t, i) => (start + i, t) }
    }.toMap
    assert((0 until nToks).forall(i => covered(i) == s"w$i"))
    // a short doc yields exactly one chunk with everything in it
    val one = Seq((1L, "a b c")).toDF("doc_id", "text")
      .select(explode(TextAnalysis.tokenChunks(col("text"), 32, 24)).as("c"))
      .select(col("c.chunk_text")).collect()
    assert(one.length === 1 && one(0).getString(0) === "a b c")
    // empty / whitespace-only docs yield NO chunks (no phantom tokens)
    val none = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
      .select(explode(TextAnalysis.tokenChunks(col("text"), 32, 24)).as("c"))
      .collect()
    assert(none.isEmpty)
  }

  test("PII scrub replaces emails/phones/IPs and nothing else") {
    val df = Seq(
      "mail me at jane.doe+x@sub.example.org today",
      "call +27821234567 or visit 192.168.0.1 now",
      "no pii in this sentence at all").toDF("text")
    val out = df.select(TextAnalysis.scrubPii(col("text")).as("s"))
      .collect().map(_.getString(0))
    assert(out(0) === "mail me at <EMAIL> today")
    assert(out(1) === "call <PHONE> or visit <IP> now")
    assert(out(2) === "no pii in this sentence at all")
    val counts = df.select(TextAnalysis.piiCounts(col("text")).as("c"))
      .select(col("c.n_emails"), col("c.n_phones"), col("c.n_ips"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(counts.toSeq === Seq((1, 0, 0), (0, 1, 1), (0, 0, 0)))
  }

  test("passage duplicates find cross-doc shared lines only") {
    val df = Seq(
      (1L, "the quick brown fox jumps over dogs\nunique line of doc one here"),
      (2L, "the quick brown fox jumps over dogs\nanother unique line in doc two"),
      (3L, "totally unrelated content in here")).toDF("doc_id", "text")
    val dups = Dedup.passageDuplicates(df, "doc_id", "text", minChars = 20, minDocs = 2)
      .collect()
    assert(dups.length === 1)
    assert(dups(0).getLong(1) === 2L) // n_docs
    assert(dups(0).getLong(2) === 2L) // n_occurrences
  }

  test("stripBoilerplate removes hot lines, keeps order, survives empty docs") {
    val boiler = "subscribe to our newsletter for updates today"
    val df = Seq(
      (1L, s"alpha first unique line of doc one\n$boiler\nomega last unique line here"),
      (2L, s"$boiler\nbeta solitary unique line in doc two"),
      (3L, boiler), // every line hot -> cleaned text must be empty, not dropped
      (4L, "ok\nshort dup\nok"), // short lines never enter the hot set
      (5L, "ok\nshort dup\nok"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplate(df, "doc_id", "text",
        minChars = 20, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1)._1 === 3L && out(1)._2 === 1L)
    assert(out(2) === ((2L, 1L,
      md5Hex("beta solitary unique line in doc two"))))
    // order preserved: doc 1 keeps first + last lines in original order
    assert(out(1)._3 === md5Hex(
      "alpha first unique line of doc one\nomega last unique line here"))
    assert(out(3) === ((1L, 1L, md5Hex(""))))
    assert(out(4) === ((3L, 0L, md5Hex("ok\nshort dup\nok"))))
    // NULL text = present-but-empty (the corpusDiff semantic): one empty
    // line kept, never NULL counts
    assert(out(6) === ((1L, 0L, md5Hex(""))))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("tokenizerFertility computes exact ratios per detected language") {
    val df = Seq(
      // en: stopword 'the' present; 6 ws tokens; bpe: don't -> don ' t
      "the cat sat, don't move",
      "the dog ran fast").toDF("text")
    val out = TextAnalysis.tokenizerFertility(df, "text").collect()
    assert(out.length === 1 && out(0).getString(0) === "en")
    val ws = out(0).getLong(2); val bpe = out(0).getLong(3)
    val chars = out(0).getLong(4)
    // "the cat sat, don't move" -> ws 5; bpe: the cat sat , don ' t move = 8
    // "the dog ran fast" -> ws 4; bpe 4
    assert(ws === 9L && bpe === 12L)
    assert(out(0).getDouble(5) === bpe.toDouble / ws.toDouble)
    assert(out(0).getDouble(6) === chars.toDouble / bpe.toDouble)
  }

  test("canonicalization converges on deep chains (checkpointed lineage)") {
    // A 14-node path has component diameter > checkpointEvery (5), so the
    // label-prop BASELINE crosses at least two localCheckpoint
    // generations — the labels must still reach the fixpoint and the
    // returned frame must stay collectable after lineage truncation.
    // The public path (star contraction since round 9) must agree.
    val n = 14
    val ids = (0L until n).toDF("id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.canonicalizeNearDupsLabelProp(ids, pairs, maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === n)
    assert(labels.values.forall(_ == 0L), s"not converged: $labels")
    val cc = Dedup.canonicalizeNearDups(ids, pairs, maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === labels, "contraction path diverged from label-prop")
  }

  test("LSH top-k probe finds the query's injected identical vector first") {
    val dupVecs = vecs.unionByName(vecs.select(
      (col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label")))
    val query = vecs.filter(col("vec_id") === 1)
      .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
    val hits = Similarity.lshTopK(
        dupVecs.filter(col("vec_id") =!= 1), "vec_id", "embedding",
        query, k = 3, numHashTables = 4, bucketLength = 1.0)
      .collect()
    assert(hits.nonEmpty)
    // vec 10001 is the identical copy of the query — distance 0, rank 1
    assert(hits.head.getLong(0) === 10001L)
    assert(hits.head.getDouble(1) === 0.0)
  }

  test("jaccardPairs dfCap only removes pairs, never adds or inflates") {
    val exact = Dedup.jaccardPairs(nearDupDocs, "doc_id", "text", n = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val capped = Dedup.jaccardPairs(
        nearDupDocs, "doc_id", "text", n = 2, threshold = 0.5,
        dfCap = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped.keySet.subsetOf(exact.keySet))
    capped.foreach { case (k, j) => assert(j <= exact(k) + 1e-12) }
  }

  test("IVF top-k: full probe is exact, partial probe keeps high recall") {
    val centroids = Similarity.trainIvfCentroids(vecs, "embedding", k = 8)
    assert(centroids.length === 8)
    val query = vecs.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
    val corpus = vecs.filter(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(
        vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", k = 10)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    val full = Similarity.ivfTopK(
        corpus, "vec_id", "embedding", centroids, query, k = 10, nprobe = 8)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(full === exact, "full probe must equal brute force")
    val partial = Similarity.ivfTopK(
        corpus, "vec_id", "embedding", centroids, query, k = 10, nprobe = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    val recall = partial.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF nprobe=4/8 recall $recall")
  }

  test("NSW graph ANN: recall@10 >= 0.95 vs brute force, deterministic rebuild") {
    val centroids = Similarity.trainIvfCentroids(vecs, "embedding", k = 8)
    val corpus = vecs.filter(col("vec_id") =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("nsw").toString
    Similarity.materializeNsw(
      corpus, "vec_id", "embedding", centroids, s"$dir/idx",
      m = 8, efConstruction = 48)
    // recall over 10 distinct query vectors, full probe + generous beam
    val queries = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val hits = queries.toSeq.sortBy(_._1).map { case (qid, q) =>
      val exact = Similarity.bruteForceTopK(
          vecs.filter(col("vec_id") === qid), vecs, "vec_id", "embedding", k = 10)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
      val cands = Similarity.nswTopKCandidates(
          spark, s"$dir/idx", centroids, q, ef = 64, nprobe = 8)
        .collect().map(_.getLong(0)).toSet - qid
      val approx = vecs.filter(col("vec_id").isin(cands.toSeq: _*))
        .select(col("vec_id"), col("embedding")).collect()
        .map { r =>
          val v = r.getSeq[Float](1)
          val d = v.zip(q).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
          (d, r.getLong(0))
        }.sorted.take(10).map(_._2).toSet
      approx.intersect(exact).size.toDouble / exact.size
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.95, s"NSW mean recall@10 $recall (per-query: $hits)")

    // rebuilding the index yields byte-identical adjacency (determinism)
    Similarity.materializeNsw(
      corpus, "vec_id", "embedding", centroids, s"$dir/idx2",
      m = 8, efConstruction = 48)
    val a = spark.read.parquet(s"$dir/idx").orderBy("id")
      .select("id", "neighbors").collect().toSeq
    val b = spark.read.parquet(s"$dir/idx2").orderBy("id")
      .select("id", "neighbors").collect().toSeq
    assert(a === b, "NSW build is not deterministic")
  }

  test("NSW probe survives a list split across scan partitions") {
    // One centroid = one list holding the whole corpus; shrinking
    // maxPartitionBytes makes the scan slice that list's parquet into
    // several FilePartitions. The probe must re-key whole lists before
    // walking — a task holding half a list would hit neighbor ids from
    // the other half (pre-fix: NoSuchElementException in the id index).
    val centroids = Array(Array.fill(vecs.select(size(col("embedding")))
      .head.getInt(0))(0.0))
    val dir = java.nio.file.Files.createTempDirectory("nsw_split").toString
    Similarity.materializeNsw(
      vecs, "vec_id", "embedding", centroids, s"$dir/idx",
      m = 8, efConstruction = 48)
    val q = vecs.filter(col("vec_id") === 3)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    val whole = Similarity.nswTopKCandidates(
        spark, s"$dir/idx", centroids, q, ef = 64, nprobe = 1)
      .collect().map(_.getLong(0)).toSet
    val mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val oc = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val split = Similarity.nswTopKCandidates(
          spark, s"$dir/idx", centroids, q, ef = 64, nprobe = 1)
        .collect().map(_.getLong(0)).toSet
      assert(split === whole,
        s"split-scan probe diverged: ${split.size} vs ${whole.size} candidates")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      spark.conf.set("spark.sql.files.openCostInBytes", oc)
    }
  }

  test("kmeansStep: assignment matches brute force, means are per-list averages") {
    // 2-d toy data with two obvious clusters; fixed initial centroids.
    val pts = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.2f, 0.0f)), (3L, Seq(0.0f, 0.2f)),
      (4L, Seq(10.0f, 10.0f)), (5L, Seq(10.2f, 10.0f))).toDF("id", "v")
    val init = Array(Array(0.1, 0.1), Array(9.0, 9.0))
    val step = Similarity.kmeansStep(pts, "v", init)
      .orderBy(col("list_id")).collect()
    assert(step.length === 2)
    assert(step(0).getAs[Long]("n_members") === 3)
    assert(step(1).getAs[Long]("n_members") === 2)
    val c0 = step(0).getSeq[Double](step(0).fieldIndex("centroid"))
    val c1 = step(1).getSeq[Double](step(1).fieldIndex("centroid"))
    assert(math.abs(c0(0) - (0.0 + 0.2f + 0.0) / 3) < 1e-6)
    assert(math.abs(c0(1) - (0.0 + 0.0 + 0.2f) / 3) < 1e-6)
    assert(math.abs(c1(0) - (10.0f + 10.2f) / 2) < 1e-5)
    assert(math.abs(c1(1) - 10.0) < 1e-5)
  }

  test("distributed Lloyd training separates clusters and beats its init") {
    def sse(cents: Array[Array[Double]]) =
      Similarity.withIvfList(vecs.select(col("embedding").as("v")), "v", cents)
        .select(col("v"), col("__ivf_list"))
        .collect().map { r =>
          val v = r.getSeq[Float](0)
          val c = cents(r.getInt(1))
          v.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum
        }.sum
    val trained = Similarity.trainIvfCentroidsDistributed(
      vecs, "vec_id", "embedding", k = 8, iters = 6)
    assert(trained.length === 8)
    assert(trained.forall(_.length === 64))
    // deterministic: retraining yields byte-identical centroids (modulo
    // shuffle-order float sums — compare with tolerance)
    val again = Similarity.trainIvfCentroidsDistributed(
      vecs, "vec_id", "embedding", k = 8, iters = 6)
    trained.zip(again).foreach { case (a, b) =>
      a.indices.foreach(i => assert(math.abs(a(i) - b(i)) < 1e-9))
    }
    // Lloyd monotonicity: the trained quantizer has lower within-cluster
    // SSE than a 1-iteration version
    val early = Similarity.trainIvfCentroidsDistributed(
      vecs, "vec_id", "embedding", k = 8, iters = 1)
    assert(sse(trained) <= sse(early) + 1e-6,
      s"training must not increase SSE: ${sse(trained)} vs ${sse(early)}")
  }

  test("simHash128 pair set is exactly the brute-force <=7-bit set") {
    // pigeonhole exactness must hold for the 16-bit-block scheme too
    val docs = nearDupDocs.limit(300)
    val keys = Dedup.withSimHash128(
        docs.select(col("doc_id").as("id"), col("text")), "text", n = 1)
      .select(col("id"), col("skey1"), col("skey2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (ia, a1, a2) <- keys; (ib, b1, b2) <- keys if ia < ib
      h = java.lang.Long.bitCount(a1 ^ b1) + java.lang.Long.bitCount(a2 ^ b2)
      if h <= 7
    } yield (ia, ib, h)).toSet
    val got = Dedup.simHash128NearDups(docs, "doc_id", "text", n = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === brute, s"${got.size} vs brute ${brute.size}")
    // the two signature halves are genuinely independent (salt works):
    // identical halves would make the scheme 64-bit in disguise
    assert(keys.exists { case (_, s1, s2) => s1 != s2 })
  }

  test("trainIvfCentroids auto-delegates to distributed Lloyd above the threshold") {
    // forcing the threshold below the corpus size must produce exactly
    // the distributed-Lloyd result (same synthetic-id init), so no
    // caller can silently train a huge corpus's quantizer on a 10k
    // driver sample
    val auto = Similarity.trainIvfCentroids(
      vecs, "embedding", k = 8, autoDistributeOver = 10L)
    val dist = Similarity.trainIvfCentroidsDistributed(
      vecs.select(col("embedding")).withColumn("__ivf_tid", xxhash64(col("embedding"))),
      "__ivf_tid", "embedding", k = 8)
    assert(auto.length === dist.length)
    auto.zip(dist).foreach { case (a, b) =>
      a.indices.foreach(i => assert(math.abs(a(i) - b(i)) < 1e-9))
    }
    // and the sample path still answers below the threshold
    val sampled = Similarity.trainIvfCentroids(
      vecs, "embedding", k = 8, autoDistributeOver = Long.MaxValue)
    assert(sampled.length === 8)
  }

  test("IVF recall@10 curve: monotone in nprobe, >=0.9 at nprobe=8, exact at k") {
    // Deterministic clustered corpus: 8 well-separated Gaussian clusters
    // in 16-d, k=16 trained lists (each true cluster splits across ~2
    // lists, so partial probes genuinely miss neighbors).
    val rnd = new java.util.Random(7)
    val dim = 16
    // overlapping clusters (noise ~ center scale): a query's true top-10
    // straddles list boundaries, so small probes genuinely miss
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian() * 2.0))
    // unit-normalized so cosine ordering (bruteForceTopK) and euclidean
    // ordering (ivfTopK) agree — the operator contract for embeddings
    val pts = (0 until 2000).map { i =>
      val c = centers(i % 8)
      val raw = c.map(x => x + rnd.nextGaussian() * 3.0)
      val norm = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(x => (x / norm).toFloat).toSeq)
    }
    val corpus = pts.toDF("vec_id", "embedding")
    val centroids = Similarity.trainIvfCentroids(corpus, "embedding", k = 16)
    val queryIds = Seq(3L, 401L, 805L, 1207L, 1601L)
    val exact = queryIds.map { q =>
      q -> Similarity.bruteForceTopK(
          corpus.filter(col("vec_id") === q), corpus, "vec_id", "embedding", k = 10)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
    }.toMap
    val curve = Seq(1, 2, 4, 8, 16).map { np =>
      val r = queryIds.map { q =>
        val qv = pts(q.toInt)._2.toArray
        val got = Similarity.ivfTopK(
            corpus.filter(col("vec_id") =!= q), "vec_id", "embedding",
            centroids, qv, k = 10, nprobe = np)
          .select("id").collect().map(_.getLong(0)).toSet
        got.intersect(exact(q)).size.toDouble / exact(q).size
      }.sum / queryIds.size
      np -> r
    }
    info(s"recall curve: ${curve.map { case (np, r) => s"nprobe=$np:$r" }.mkString(", ")}")
    // candidate sets are nested in nprobe, so recall must be monotone
    curve.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(b >= a - 1e-9, s"recall curve dipped: $curve")
      case _ =>
    }
    assert(curve.toMap.apply(8) >= 0.9, s"recall@nprobe=8 below 0.9: $curve")
    assert(curve.toMap.apply(16) === 1.0, "probing every list must be exact")
  }

  test("sharedTokenRuns measures exact run lengths on known overlaps") {
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, shared + " " + (1 to 10).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 10).map(i => s"b$i").mkString(" ") + " " + shared),
      (3L, (1 to 30).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val runs = Dedup.sharedTokenRuns(df, "doc_id", "text",
      gramSize = 4, minRunTokens = 8).collect()
    assert(runs.length === 1)
    val r = runs(0)
    assert(r.getAs[Long]("id_a") === 1L && r.getAs[Long]("id_b") === 2L)
    assert(r.getAs[Long]("max_run_tokens") === 20L, "exact shared-run length")
    assert(r.getAs[Long]("n_runs") === 1L)
    // below-threshold overlaps stay silent
    val none = Dedup.sharedTokenRuns(df, "doc_id", "text",
      gramSize = 4, minRunTokens = 21).collect()
    assert(none.isEmpty)
  }

  test("sharedTokenRuns finds planted near-dups with full-text runs") {
    val slice = docs.filter(col("doc_id") < 50)
    val planted = slice.unionByName(slice.select(
      (col("doc_id") + 20000).as("doc_id"),
      concat(col("text"), lit(" graftmarker")).as("text"),
      col("lang"), col("source"), col("n_chars")))
    // docs shorter than minRunTokens can't contain a qualifying run —
    // expect exactly the pairs whose original doc has ≥ 16 tokens
    val eligible = slice
      .filter(size(TextAnalysis.tokens(TextAnalysis.normalize(col("text")))) >= 16)
      .count()
    val runs = Dedup.sharedTokenRuns(planted, "doc_id", "text",
        gramSize = 8, minRunTokens = 16)
      .filter(col("id_b") === col("id_a") + 20000)
    assert(runs.count() === eligible,
      s"every eligible planted pair must share a long run (eligible=$eligible)")
  }

  test("weighted sample is deterministic and weight-proportional") {
    // 200 heavy rows (w=50) vs 200 light rows (w=1): a 100-row sample
    // should be dominated by heavy rows
    val df = (0L until 400L).map(i =>
      (i, if (i < 200) 50L else 1L)).toDF("id", "w")
    val s1 = Curation.weightedSample(df, "id", "w", 100)
      .collect().map(_.getLong(0)).toSet
    val s2 = Curation.weightedSample(df, "id", "w", 100)
      .collect().map(_.getLong(0)).toSet
    assert(s1 === s2, "same inputs → same sample")
    assert(s1.size === 100)
    val heavy = s1.count(_ < 200)
    assert(heavy >= 80, s"heavy rows should dominate, got $heavy/100")
    // append stability: adding rows never evicts a higher-key survivor
    // below rank k — check the sample only changes by inclusion
    val bigger = (0L until 500L).map(i =>
      (i, if (i < 200) 50L else 1L)).toDF("id", "w")
    val s3 = Curation.weightedSample(bigger, "id", "w", 100)
      .collect().map(_.getLong(0)).toSet
    assert((s3 -- s1).forall(_ >= 400L) || s3.intersect(s1).size >= 90,
      "appends shift the sample only through new contenders")
  }

  test("SemDeDup collapses injected identical vectors within clusters") {
    val dupVecs = vecs.unionByName(vecs.select(
      (col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label")))
    val centroids = Similarity.trainIvfCentroids(vecs, "embedding", k = 8)
    val labels = Similarity.semanticDedupLabels(
      dupVecs, "vec_id", "embedding", centroids, minCosine = 0.999)
    val n = vecs.count()
    // every copy must collapse onto its original (identical vector →
    // same cluster always → cosine 1 pair)
    val collapsed = labels.filter(col("id") >= 10000 &&
      col("canonical_id") === col("id") - 10000).count()
    assert(collapsed === n, s"all $n copies must collapse, got $collapsed")
    // survivors = rows that keep their own id; at most one per component
    val survivors = labels.filter(col("id") === col("canonical_id")).count()
    assert(survivors <= n)
  }

  test("brute-force top-k is symmetric-rank consistent") {
    val topk = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") < 3), vecs, "vec_id", "embedding", k = 3)
      .collect()
    assert(topk.length === 9) // 3 queries x 3 ranks
    topk.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cosines = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cosines.sameElements(cosines.sorted.reverse)) // rank order = cosine desc
    }
  }

  test("language-ID detects real sentences; word salad maps en/und") {
    val samples = Seq(
      (1L, "the cat sat on the mat and it was happy"),
      (2L, "der hund ist nicht mit der katze zu hause"),
      (3L, "le chat est avec une souris pour la nuit"),
      (4L, "el perro es un animal con una cola"),
      (5L, "xyzzy plugh qwerty")).toDF("id", "text")
    val out = samples.select(col("id"), TextAnalysis.languageId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "und"))
  }

  test("quality score rewards long stopword-bearing prose, penalizes noise") {
    val en = TextAnalysis.StopwordProfiles.head._2
    val samples = Seq(
      (1L, ("the data is stored in a table and it was fast " * 12).trim),
      (2L, "!!! ### $$$ %%% ^^^ &&& *** ((( )))"),
      (3L, "short")).toDF("id", "text")
    val scores = samples
      .select(col("id"), TextAnalysis.qualityScore(col("text"), en).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > 80.0)
    assert(scores(2L) < 40.0)
    assert(scores(1L) > scores(3L))
  }

  test("vocabulary: counts, fractions, and the deterministic tie-break cut") {
    val df = Seq(
      (1L, "apple banana apple  Cherry"),
      (2L, "banana cherry date banana")).toDF("id", "text")
    val all = TextAnalysis.vocabulary(df, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // 8 tokens total: banana×3, apple×2, cherry×2, date×1 (case-folded)
    assert(all.map(t => t._1 -> t._2).toSeq ===
      Seq("banana" -> 3L, "apple" -> 2L, "cherry" -> 2L, "date" -> 1L))
    assert(math.abs(all.map(_._3).sum - 1.0) < 1e-12)
    // topK cuts on (cnt desc, token asc): apple (a < c) survives at k=2
    val top2 = TextAnalysis.vocabulary(df, "text", topK = 2)
      .collect().map(_.getString(0))
    assert(top2.toSeq === Seq("banana", "apple"))
  }

  test("bm25TopK: exact scores, dfCap pruning, length normalization") {
    val docs = Seq(
      (1L, "cat dog"),
      (2L, "cat cat cat fish"),
      (3L, "bird")).toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text")
    val stats = Retrieval.corpusStats(idx)
    def q(text: String) = Seq((1, text)).toDF("query_id", "qtext")

    // hand-computed: N=3, total_len=7, idf(cat)=1.5/2.5=0.6
    val cat = Retrieval.bm25TopK(idx, stats, q("cat"), "query_id", "qtext", 10)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(cat.map(_._1).toSeq === Seq(2L, 1L)) // tf=3 beats tf=1; d3 absent
    assert(math.abs(cat(0)._2 - 0.6 * (3 * 2.2 /
      (3 + 1.2 * (0.25 + 0.75 * (4.0 * 3 / 7))))) < 1e-9)
    assert(math.abs(cat(1)._2 - 0.6 * (1 * 2.2 /
      (1 + 1.2 * (0.25 + 0.75 * (2.0 * 3 / 7))))) < 1e-9)

    // dfCap: "cat" (df=2) is dropped at dfCap=1; only "bird" survives,
    // so the hot term's postings never become candidates
    val capped = Retrieval.bm25TopK(idx, stats, q("cat bird"),
        "query_id", "qtext", 10, dfCap = 1L)
      .collect().map(_.getLong(2))
    assert(capped.toSeq === Seq(3L))

    // length normalization: same tf, shorter doc wins
    val lenDocs = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val lenIdx = Retrieval.invertedIndex(lenDocs, "doc_id", "text")
    val len = Retrieval.bm25TopK(lenIdx, Retrieval.corpusStats(lenIdx),
        q("a"), "query_id", "qtext", 10)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(len.map(_._1).toSeq === Seq(1L, 2L))
    assert(len(0)._2 > len(1)._2)

    // logIdf is a monotone transform: single-term ranking unchanged
    val logRank = Retrieval.bm25TopK(idx, stats, q("cat"),
        "query_id", "qtext", 10, logIdf = true)
      .collect().map(_.getLong(2))
    assert(logRank.toSeq === Seq(2L, 1L))
  }

  test("embeddingDrift: identity is zero drift; shifts move the right metric") {
    val base = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f)),
      (2L, Array(0.0f, 1.0f, 0.5f))).toDF("vec_id", "embedding")
    val same = Similarity.embeddingDrift(base, base, "embedding")
      .collect()(0)
    assert(same.getLong(0) === 3L) // dims
    assert(same.getDouble(3) === 1.0 && same.getDouble(4) === 0.0)
    // pure magnitude scale: direction identical (cosine 1), L2 > 0
    val scaled = base.select(col("vec_id"),
      transform(col("embedding"), x => x * 2.0f).as("embedding"))
    val mag = Similarity.embeddingDrift(base, scaled, "embedding")
      .collect()(0)
    assert(mag.getDouble(3) === 1.0)
    assert(mag.getDouble(4) > 0.0)
    // directional shift: cosine drops below 1
    val rotated = Seq(
      (1L, Array(0.0f, 1.0f, 0.5f)),
      (2L, Array(1.0f, 0.0f, -0.5f))).toDF("vec_id", "embedding")
    val dir = Similarity.embeddingDrift(base, rotated, "embedding")
      .collect()(0)
    assert(dir.getDouble(3) < 1.0)
  }

  test("cmsTokenCounts: contract holds even under forced collisions") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a a a b b k l m n o")).toDF("doc_id", "text")
    // eps = 0.4 → width ~7 buckets for 15 distinct tokens: collisions
    // certain. CMS must still never underestimate, and the eps bound
    // (0.4 · 20 = 8) absorbs every collision overestimate.
    val rows = TextAnalysis.cmsTokenCounts(df, "text",
        probes = Seq("a", "k", "zz_absent"), eps = 0.4,
        confidence = 0.99, seed = 7)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getBoolean(2), r.getBoolean(3)))
    assert(rows.map(r => r._1 -> r._2).toMap ===
      Map("a" -> 4L, "k" -> 1L, "zz_absent" -> 0L))
    assert(rows.forall(_._3), "CMS underestimated a count")
    assert(rows.forall(_._4), "CMS overshot the eps bound")
  }

  test("heavyHitterTokensByGroup: per-group exactness at tight capacity") {
    // group A: 'x' dominates; group B: 'y' dominates and 'x' is absent.
    // capacity=2 forces the sketch path (per-group vocab is larger);
    // ratio=2 keeps tokens above half the group's stream.
    val df = Seq(
      ("A", "x x x x q r"), ("A", "x x s t"),
      ("B", "y y y u v"), ("B", "y y y w z")).toDF("source", "text")
    val got = TextAnalysis.heavyHitterTokensByGroup(
        df, "source", "text", ratio = 2L, capacity = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // A: 10 tokens, x=6 > 5; B: 10 tokens, y=6 > 5 — nothing else passes
    assert(got.toSeq === Seq(("A", "x", 6L), ("B", "y", 6L)))
  }

  test("trainingTriples: negatives exclude truth, rank by bm25, bound holds") {
    val docs = Seq(
      (1L, "cat dog"), (2L, "cat cat fish"), (3L, "cat bird"),
      (4L, "dog dog")).toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text")
    val qs = Seq((1, "cat")).toDF("query_id", "qtext")
    // docs 1,2,3 all match "cat"; doc 2 is the only positive
    val truth = Seq((1, 2L)).toDF("query_id", "doc_id")
    val got = Retrieval.trainingTriples(idx, Retrieval.corpusStats(idx),
        qs, "query_id", "qtext", truth, negPerQuery = 1, recallN = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // one positive × one negative; the negative is the best NON-relevant
    // bm25 match (doc 2 has top bm25 but is truth → excluded)
    assert(got.length === 1)
    val (q, pos, neg, nr) = got(0)
    assert(q === 1 && pos === 2L && nr === 1)
    assert(neg != 2L && Set(1L, 3L).contains(neg))
    // widening the budget pulls in the remaining non-relevant match only
    val wide = Retrieval.trainingTriples(idx, Retrieval.corpusStats(idx),
        qs, "query_id", "qtext", truth, negPerQuery = 5, recallN = 10)
      .collect().map(_.getLong(2)).toSet
    assert(wide === Set(1L, 3L)) // doc 4 never matched; doc 2 is truth
  }

  test("retrievalMetrics: hand-computed AP/MRR, zero-hit queries keep rows") {
    val pred = Seq(
      (1L, 1, 100L), (1L, 2, 101L), (1L, 3, 102L), (1L, 4, 103L),
      (2L, 1, 200L), (2L, 2, 201L)).toDF("query_id", "rank", "doc_id")
    val truth = Seq(
      (1L, 101L), (1L, 103L), (1L, 999L), (1L, 101L), // dup collapses
      (2L, 888L)                                      // never retrieved
    ).toDF("query_id", "doc_id")
    val m = Retrieval.retrievalMetrics(pred, truth, k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // q1: hits at ranks 2,4 of truth {101,103,999} →
    // precision 2/4, recall 2/3, rr 1/2, ap (1/2 + 2/4)/min(3,4) = 1/3
    assert(m(1L)._1 === 3L && m(1L)._2 === 2L)
    assert(m(1L)._3 === 0.5 && m(1L)._5 === 0.5)
    assert(math.abs(m(1L)._4 - 2.0 / 3) < 1e-12)
    assert(math.abs(m(1L)._6 - 1.0 / 3) < 1e-12)
    // q2: zero hits — the row survives with zeroed metrics
    assert(m(2L) === ((1L, 0L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("hybridTopK: RRF arithmetic, vectorless candidates drop, k bound") {
    // doc 1 wins bm25 for "cat" (higher tf, same length); doc 2's vector
    // IS the query vector, so it wins the cosine stage — RRF fuses.
    val docs = Seq(
      (1L, "cat cat dog x"),
      (2L, "cat dog fish x"),
      (3L, "dog dog dog x")).toDF("doc_id", "text")
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.6f, 0.8f)),
      (9L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val qs = Seq((9L, "cat")).toDF("query_id", "qtext")
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text")
    val got = Retrieval.hybridTopK(idx, Retrieval.corpusStats(idx),
        qs, "query_id", "qtext",
        vecs.filter(col("vec_id") === 9L), "vec_id", "embedding",
        vecs, "vec_id", "embedding", k = 5, recallN = 5)
      .collect()
      .map(r => (r.getLong(2), r.getInt(1), r.getInt(3), r.getInt(4),
        r.getDouble(5)))
    // doc 3 never matches "cat"; docs 1,2 both survive with vectors
    assert(got.map(_._1).toSeq === Seq(2L, 1L) ||
      got.map(_._1).toSeq === Seq(1L, 2L))
    val byDoc = got.map(g => g._1 -> g).toMap
    // bm25: doc1 rank 1 (tf=2), doc2 rank 2; cosine: doc2 rank 1
    // (identical vector), doc1 rank 2
    assert(byDoc(1L)._3 === 1 && byDoc(1L)._4 === 2)
    assert(byDoc(2L)._3 === 2 && byDoc(2L)._4 === 1)
    // RRF is exact integer-division arithmetic — both fuse to the same
    // score here, and the doc_id tie-break puts doc 1 first
    assert(byDoc(1L)._5 === 1.0 / 61 + 1.0 / 62)
    assert(byDoc(2L)._5 === 1.0 / 62 + 1.0 / 61)
    assert(got.head._1 === 1L && got.head._2 === 1)
    // a candidate without a vector drops from the re-rank
    val noVec = Retrieval.hybridTopK(idx, Retrieval.corpusStats(idx),
        qs, "query_id", "qtext",
        vecs.filter(col("vec_id") === 9L), "vec_id", "embedding",
        vecs.filter(col("vec_id") === 1L), "vec_id", "embedding",
        k = 5, recallN = 5)
      .collect().map(_.getLong(2))
    assert(noVec.toSeq === Seq(1L))
  }

  test("proximityMatches: window bound, either order, self-position excluded") {
    val docs = Seq(
      (1L, "cat x x dog"),      // distance 3
      (2L, "dog cat"),          // distance 1, B before A
      (3L, "cat x x x x dog"),  // distance 5 — outside window
      (4L, "cat cat")           // same term twice
    ).toDF("doc_id", "text")
    val idx = Retrieval.positionalIndex(docs, "doc_id", "text")
    def near(a: String, b: String, w: Int) =
      Retrieval.proximityMatches(idx, a, b, w)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(near("cat", "dog", 3) === Map(1L -> 1, 2L -> 1))
    assert(near("cat", "dog", 5) === Map(1L -> 1, 2L -> 1, 3L -> 1))
    assert(near("cat", "dog", 2) === Map(2L -> 1))
    // A NEAR A: a position may not witness itself
    assert(near("cat", "cat", 3) === Map(4L -> 2))
  }

  test("phraseMatches: boundaries, overlaps, repeated terms, single term") {
    val docs = Seq(
      (1L, "cat dog cat dog"),   // "cat dog" at 1 and 3; starts the doc
      (2L, "dog cat dog"),       // "cat dog" at 2; ends the doc
      (3L, "a a a"),             // overlapping "a a" at 1 and 2
      (4L, "dog dog cat")        // "cat dog" absent (order matters)
    ).toDF("doc_id", "text")
    val idx = Retrieval.positionalIndex(docs, "doc_id", "text")
    def m(phrase: String*) =
      Retrieval.phraseMatches(idx, phrase)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m("cat", "dog") === Map(1L -> 2, 2L -> 1))
    assert(m("a", "a") === Map(3L -> 2))        // overlaps both count
    assert(m("a", "a", "a") === Map(3L -> 1))
    assert(m("cat") === Map(1L -> 2, 2L -> 1, 4L -> 1)) // single term = tf
    assert(m("cat", "cat") === Map.empty)
  }

  test("knFluency: discount arithmetic, continuation property, OOV ladder") {
    // train model: B = 8 bigram types, V = 8 words, floor = 1/9.
    // "the" continues 3 distinct contexts; "francisco" only follows
    // "san" — the Kneser–Ney showcase pair.
    val train = Seq(
      (1L, "a the b the c the"),
      (2L, "san francisco san francisco"),
      (3L, "u v")).toDF("doc_id", "text")
    val target = Seq(
      (10L, "x the"),         // unseen prefix → pure continuation 3/8
      (11L, "x francisco"),   // unseen prefix → continuation 1/8
      (12L, "zz qq"),         // both unseen → uniform floor 1/9
      (13L, "san francisco"), // seen: (2-.75)/2 + (.75·1/2)·(1/8)
      (14L, "the san")        // seen prefix, unseen bigram: (.75·2/2)·(1/8)
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.knFluency(train, target, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows(10L) === ((1L, 1L, 0.375)))
    assert(rows(11L) === ((1L, 1L, 0.125)))
    assert(rows(13L) === ((1L, 0L, 0.671875)))
    assert(rows(14L) === ((1L, 1L, 0.09375)))
    assert(math.abs(rows(12L)._3 - 1.0 / 9) < 1e-9)
    // the continuation property: same raw frequency would rank
    // "francisco" ≥ "the" under MLE; KN ranks by context diversity
    assert(rows(10L)._3 > rows(11L)._3)
  }

  test("vocabGrowth: first-seen epochs, empty-epoch spine, cumulative cut") {
    // ids 0..7 → 4 epochs of 2 docs; vocabulary grows then saturates:
    // epoch 1 brings {a,b}, epoch 2 brings {c}, epoch 3 nothing new,
    // epoch 4 brings {d}. Epoch 3 reuses old words (epoch_vocab 1,
    // new_words 0) — the spine must still emit its row.
    val df = Seq(
      (0L, "a b"), (1L, "a"),
      (2L, "c a"), (3L, "b c"),
      (4L, "a b"), (5L, "b"),
      (6L, "d a"), (7L, "d")).toDF("doc_id", "text")
    val rows = TextAnalysis.vocabGrowth(df, "doc_id", "text", buckets = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      (1, 2L, 2L, 2L),   // {a,b} new; epoch sees {a,b}
      (2, 1L, 3L, 3L),   // {c} new; epoch sees {a,b,c}
      (3, 0L, 2L, 3L),   // nothing new; epoch sees {a,b}
      (4, 1L, 2L, 4L)))  // {d} new; epoch sees {a,d}
  }

  test("lshTopKCandidates ∪ exact-rerank matches lshTopK end-to-end") {
    val query = vecs.filter(col("vec_id") === 1)
      .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
    val corpus = vecs.filter(col("vec_id") =!= 1)
    val cands = Similarity.lshTopKCandidates(
        corpus, "vec_id", "embedding", query,
        numHashTables = 4, bucketLength = 1.0)
    // candidate ids are unique and drawn from the corpus
    val ids = cands.select("id").collect().map(_.getLong(0))
    assert(ids.length === ids.distinct.length)
    val endToEnd = Similarity.lshTopK(
        corpus, "vec_id", "embedding", query, k = 5,
        numHashTables = 4, bucketLength = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(endToEnd.map(_._1).toSet.subsetOf(ids.toSet))
    assert(endToEnd.map(_._2).toSeq === endToEnd.map(_._2).sorted.toSeq)
  }

  test("tfidf top terms rank rare repeated terms over ubiquitous ones") {
    val df = Seq(
      (1L, "common common zyzzyva zyzzyva zyzzyva common"),
      (2L, "common words common here common too"),
      (3L, "common filler common text common body")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", topK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(5)) -> (r.getString(1), r.getDouble(4)))
      .toMap
    // doc 1: zyzzyva tf=3 df=1 → score 9; common tf=3 df=3 → score 3
    assert(top((1L, 1))._1 === "zyzzyva")
    assert(top((1L, 1))._2 === 9.0)
    assert(top((1L, 2)) === (("common", 3.0)))
    // per-doc top-k: every doc has exactly topK (or fewer) rows
    val counts = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", topK = 2)
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 2L))
  }

  test("batched decode is row-identical to per-row decode and honors the lifecycle") {
    val media = Multimodal.fromDocuments(docs, "doc_id", "text").repartition(3)
    val perRow = Multimodal.decodeStub(media)
      .select("media_id", "n_bytes", "checksum", "features")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getSeq[Float](3))).toMap
    val opens = spark.sparkContext.longAccumulator("opens")
    val closes = spark.sparkContext.longAccumulator("closes")
    val batches = spark.sparkContext.longAccumulator("batches")
    val oversize = spark.sparkContext.longAccumulator("oversize")
    class CountingDecoder extends Multimodal.BatchDecoder {
      private val inner = new Multimodal.StubBatchDecoder
      override def open(): Unit = opens.add(1)
      override def close(): Unit = closes.add(1)
      override def decode(contents: Array[Array[Byte]]): Array[Multimodal.Decoded] = {
        batches.add(1)
        if (contents.length > 7) oversize.add(1)
        inner.decode(contents)
      }
    }
    val batched = Multimodal.decodeBatched(media, batchSize = 7, () => new CountingDecoder)
      .select("media_id", "n_bytes", "checksum", "features")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getSeq[Float](3))).toMap
    assert(batched === perRow)
    // lifecycle: one open and one close per partition, batches capped at
    // batchSize, and real batching happened (fewer calls than rows)
    assert(opens.value === closes.value)
    assert(opens.value >= 3L)
    assert(oversize.value === 0L)
    assert(batches.value < perRow.size, "no batching amortization observed")
  }

  test("multimodal: stub decode is deterministic, frame sampling fans out videos") {
    val media = Multimodal.fromDocuments(docs, "doc_id", "text")
    val d1 = Multimodal.decodeStub(media).select("media_id", "checksum", "features")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d2 = Multimodal.decodeStub(media).select("media_id", "checksum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1 === d2) // deterministic across runs
    val frames = Multimodal.sampleFrames(Multimodal.decodeStub(media), 1000L)
    val videoFrames = frames.filter(col("modality") === "video")
      .groupBy(col("media_id")).count().collect()
    videoFrames.foreach(r => assert(r.getLong(1) >= 1))
    val nonVideo = frames.filter(col("modality") =!= "video")
      .groupBy(col("media_id")).count().filter(col("count") > 1).count()
    assert(nonVideo === 0) // image/audio rows don't fan out
    val resized = Multimodal.resizeStub(media, 64)
      .select(max(col("meta.width")), max(col("meta.height"))).collect()(0)
    assert(resized.getInt(0) <= 64 && resized.getInt(1) <= 64)
  }

  test("multimodal features feed similarity search end-to-end") {
    // decode → feature vectors → exact-dup detection via cosine: the
    // injected byte-identical copies must surface as cosine-1 pairs
    val docsWithExactDups = docs.unionByName(docs.select(
      (col("doc_id") + 10000).as("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars")))
    val media = Multimodal.fromDocuments(docsWithExactDups, "doc_id", "text")
    val feats = Multimodal.decodeStub(media)
      .select(col("media_id"), col("features"))
    val pairs = Dedup.embeddingCosinePairs(feats, "media_id", "features", 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val injected = docs.select("doc_id").collect().map(_.getLong(0))
      .map(id => (id, id + 10000)).toSet
    assert(injected.subsetOf(pairs),
      s"missing ${injected.diff(pairs).size} of ${injected.size} injected dups")
  }

  test("incremental near-dup index: batch probes find dups, loop closes on append") {
    val idx = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_incr_idx").toString
    graft.tables.FsUtil.deleteRec(java.nio.file.Paths.get(idx))
    val corpus = docs.select(col("doc_id"), col("text"))
    Dedup.materializeNearDupIndex(
      corpus, "doc_id", "text", idx, n = 2, bands = 8, rowsPerBand = 8)
    // batch = near-dup copies of the corpus plus genuinely novel docs
    val dupBatch = corpus.select((col("doc_id") + 20000).as("doc_id"),
      concat(col("text"), lit(" graftmarker")).as("text"))
    val novel = Seq(
      (90001L, "completely novel sentence about quarks and lattice gauge theory"),
      (90002L, "another unique document no corpus text resembles at all today"))
      .toDF("doc_id", "text")
    val hits = Dedup.incrementalNearDups(
      spark, idx, dupBatch.unionByName(novel), "doc_id", "text",
      n = 2, bands = 8, rowsPerBand = 8, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every injected near-dup maps back to its origin; novel docs don't hit
    val expected = corpus.select("doc_id").collect().map(_.getLong(0))
      .map(id => (id + 20000, id)).toSet
    assert(expected.subsetOf(hits),
      s"missing ${expected.diff(hits).size} of ${expected.size} dups")
    assert(!hits.exists(_._1 >= 90000L), "novel docs must not match")
    // same pairs as the batch-equivalent full recompute (candidates may
    // differ by seed; verified output must agree on batch-vs-corpus pairs)
    // close the loop: append the novel docs, re-probe finds them as dups
    Dedup.materializeNearDupIndex(
      novel, "doc_id", "text", idx, n = 2, bands = 8, rowsPerBand = 8,
      append = true)
    val again = Dedup.incrementalNearDups(
      spark, idx, novel.select(col("doc_id") + 100 as "doc_id", col("text")),
      "doc_id", "text", n = 2, bands = 8, rowsPerBand = 8, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === Set((90101L, 90001L), (90102L, 90002L)))
  }

  test("PQ: encode is total, ADC+rerank finds the injected dup, recall high") {
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val withDup = vecs.unionByName(vecs.filter(col("vec_id") === 0).select(
      (col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label")))
    val base = withDup.filter(col("vec_id") =!= 0)
    val query = vecs.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
    val books = Similarity.trainPqCodebooks(base, "embedding", m = 8, k = 64)
    assert(books.length === 8 && books.forall(_.length === 64))
    // every vector encodes to m in-range codes
    val codes = Similarity.pqEncode(base, "vec_id", "embedding", books)
      .collect().map(r => r.getSeq[Int](1))
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 64)))
    // candidates: plan is TakeOrderedAndProject (never a global sort)
    val cands = Similarity.pqTopNCandidates(
      base, "vec_id", "embedding", books, query, topN = 100)
    assert(cands.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    val candIds = cands.collect().map(_.getLong(0)).toSet
    // the identical copy of the query must be among the candidates and
    // rank first after exact re-rank
    assert(candIds.contains(10000L))
    val queryCol = typedlit(query.map(_.toDouble).toSeq)
    val reranked = base.select(col("vec_id").as("id"), col("embedding").as("v"))
      .filter(col("id").isin(candIds.toSeq: _*))
      .withColumn("dist", graft.functions.F.euclidean(col("v"), queryCol))
      .orderBy(asc("dist"), asc("id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(reranked.head === 10000L)
    // recall@10 vs brute force over the raw vectors
    val exact = base.select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("dist", graft.functions.F.euclidean(col("v"), queryCol))
      .orderBy(asc("dist"), asc("id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.count(reranked.toSet.contains).toDouble / exact.size
    assert(recall >= 0.7, s"PQ recall@10 = $recall")
  }

  test("hardNegatives: labels always differ, ranks follow cosine, self excluded") {
    val labels = vecs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Similarity.hardNegatives(
      vecs.filter(col("vec_id") < 5), vecs, "vec_id", "embedding", "label", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length === 15)
    out.foreach { case (q, _, n) =>
      assert(n !== q, "self must be excluded")
      assert(labels(n) !== labels(q), s"negative $n shares label with query $q")
    }
    // rank 1 is the best different-label cosine (verified brute force)
    val q0 = vecs.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val qCol = typedlit(q0.map(_.toDouble).toSeq)
    val best = vecs.filter(col("vec_id") =!= 0 && col("label") =!= labels(0L))
      .withColumn("cos", graft.functions.F.cosineSim(col("embedding"), qCol))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(1).collect()(0).getLong(0)
    assert(out.filter(_._1 == 0L).minBy(_._2)._3 === best)
  }

  test("word census is additive: shard merge equals the direct census") {
    val direct = TextAnalysis.wordCensus(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val shards = (0 until 3).map(i =>
      TextAnalysis.wordCensus(
        docs.filter(pmod(col("doc_id"), lit(3)) === i), "text"))
    val merged = TextAnalysis.mergeWordCensus(shards)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct)
    // a single-census merge is the identity
    val one = TextAnalysis.mergeWordCensus(
      Seq(TextAnalysis.wordCensus(docs, "text")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one == direct)
    // and the derived seed census via the incremental path matches the
    // direct-from-corpus derivation exactly (the retrain contract)
    val seedDirect = Unigram.seedCensus(docs, "text",
      maxPieceLen = 2, seedSize = 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val seedInc = Unigram.seedCensusFromWords(
      TextAnalysis.mergeWordCensus(shards), maxPieceLen = 2, seedSize = 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(seedInc == seedDirect)
    // every trainer family retrains from the merged census identically
    // to training from the corpus (all three are deterministic)
    val mergedDf = TextAnalysis.mergeWordCensus(shards)
    assert(TextAnalysis.trainBpeMergesFromWords(mergedDf, numMerges = 5) ==
      TextAnalysis.trainBpeMerges(docs, "text", numMerges = 5))
    assert(WordPiece.buildVocabFromWords(mergedDf, vocabSize = 30, maxPieceLen = 3)
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2))).toSet ==
      WordPiece.buildVocab(docs, "text", vocabSize = 30, maxPieceLen = 3)
        .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2))).toSet)
    assert(Unigram.trainFromWords(mergedDf,
        vocabSize = 40, maxPieceLen = 2, iterations = 1, seedSize = 60).toSeq ==
      Unigram.train(docs, "text",
        vocabSize = 40, maxPieceLen = 2, iterations = 1, seedSize = 60).toSeq)
  }

  test("BPE symbols are code points: non-BMP words train and encode losslessly") {
    val emoji = new String(Character.toChars(0x1F600))
    val tiny = Seq((1L, s"$emoji$emoji a$emoji a$emoji")).toDF("doc_id", "text")
    // pair census (SQL substring = code points) and the driver trainer
    // must agree: the only 2-symbol pairs are (😀,😀)x1 and (a,😀)x2
    val merges = TextAnalysis.trainBpeMerges(tiny, "text", numMerges = 1)
    assert(merges == Seq(("a", emoji)), s"got $merges")
    // no piece is ever a lone surrogate (invalid string) — encode of an
    // unmerged emoji keeps the full code point as one symbol
    val pieces = TextAnalysis.applyBpeMerges(
      emoji + emoji, merges.zipWithIndex.toMap)
    assert(pieces.toSeq == Seq(emoji, emoji), s"got ${pieces.toSeq}")
  }

  test("BPE: pair census matches hand count; merges reconstruct a known corpus") {
    // weighted census: "aaab" x3, "ab" x2 → pairs aa: 2*3=6, ab: 3+2=5
    val tiny = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val census = TextAnalysis.bpePairCensus(tiny, "text", topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(census.toSeq === Seq("aa" -> 6L, "ab" -> 5L))
    // plan: top-k is a TakeOrderedAndProject, not a global sort
    assert(TextAnalysis.bpePairCensus(docs, "text", 20)
      .queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    // merge training: first merge is the census argmax (a,a); greedy
    // left-to-right turns "aaab" into [aa, a, b], so round 2 counts
    // (a,b) = 3 + 2 = 5 over (aa,a) = 3 and merges (a,b)
    val merges = TextAnalysis.trainBpeMerges(tiny, "text", numMerges = 2)
    assert(merges === Seq(("a", "a"), ("a", "b")))
    // deterministic on the real corpus; merges are distinct pairs
    val m1 = TextAnalysis.trainBpeMerges(docs, "text", 8)
    val m2 = TextAnalysis.trainBpeMerges(docs, "text", 8)
    assert(m1 === m2 && m1.distinct.size === 8)
  }

  test("IVF-PQ: probe is partition-pruned, dup surfaces first, recall high") {
    val withDup = vecs.unionByName(vecs.filter(col("vec_id") === 0).select(
      (col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label")))
    val base = withDup.filter(col("vec_id") =!= 0)
    val query = vecs.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
    val centroids = Similarity.trainIvfCentroids(base, "embedding", k = 16)
    val books = Similarity.trainPqCodebooks(base, "embedding", m = 8, k = 64)
    val path = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_ivfpq_spec").toString
    graft.tables.FsUtil.deleteRec(java.nio.file.Paths.get(path))
    Similarity.materializeIvfPq(base, "vec_id", "embedding", centroids, books, path)
    // partial probe: the scan's partition filters prune to nprobe dirs
    val cands = Similarity.ivfPqCandidates(
      spark, path, centroids, books, query, nprobe = 4, topN = 100)
    val scan = cands.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("__ivf_list"),
      s"probe must partition-prune:\n$scan")
    // end-to-end: the injected identical vector ranks first
    val top = Similarity.ivfPqTopK(
      spark, path, centroids, books, query, k = 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(top.head === 10000L)
    // recall vs brute force
    val queryCol = typedlit(query.map(_.toDouble).toSeq)
    val exact = base.select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("dist", graft.functions.F.euclidean(col("v"), queryCol))
      .orderBy(asc("dist"), asc("id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.count(top.toSet.contains).toDouble / exact.size
    assert(recall >= 0.7, s"IVF-PQ recall@10 = $recall")
  }

  test("BPE encode: rank-ordered merges, losslessness, trained-on-corpus roundtrip") {
    // rank order decides: with merges [(l,o),(lo,w)], "low" → ["low"];
    // reversing ranks leaves (lo,w) unreachable until (l,o) fires first
    val r1 = Map(("l", "o") -> 0, ("lo", "w") -> 1)
    assert(TextAnalysis.applyBpeMerges("low", r1).toSeq === Seq("low"))
    val r2 = Map(("o", "w") -> 0, ("l", "o") -> 1)
    assert(TextAnalysis.applyBpeMerges("low", r2).toSeq === Seq("l", "ow"))
    assert(TextAnalysis.applyBpeMerges("slow", r1).toSeq === Seq("s", "low"))
    assert(TextAnalysis.applyBpeMerges("x", r1).toSeq === Seq("x"))
    // corpus roundtrip: pieces concat back to every word exactly
    val merges = TextAnalysis.trainBpeMerges(docs, "text", 20)
    val enc = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
    // join back to original text for comparison
    val joined = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(
        concat_ws(" ", transform(col("bpe_tokens"), a => concat_ws("", a))).as("rec"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"))
      .filter(col("rec") =!= col("norm"))
    assert(joined.count() === 0L, "reconstruction must be exact for every doc")
    // trained merges actually compress: mean pieces per word < chars per word
    val stats = enc.select(
      aggregate(transform(col("bpe_tokens"), a => size(a)), lit(0), (a, x) => a + x)
        .as("p"),
      size(col("bpe_tokens")).as("w")).agg(sum("p"), sum("w")).collect()(0)
    assert(stats.getLong(0) > stats.getLong(1), "multi-piece words exist")
  }

  test("bigramFluency separates phrase-reusing docs from unique word orders") {
    // fluent docs all walk the same token chain (transitions dominate
    // the census); gibberish docs permute the SAME vocabulary uniquely,
    // so every one of their transitions is census-rare
    val chain = "alpha beta gamma delta epsilon zeta"
    val fluent = (0L until 30L).map(i => (i, chain))
    val gibberish = Seq(
      (100L, "zeta gamma alpha epsilon beta delta"),
      (101L, "delta alpha zeta beta epsilon gamma"),
      (102L, "beta epsilon delta zeta gamma alpha"))
    val corpus = (fluent ++ gibberish).toDF("doc_id", "text")
    val byId = TextAnalysis.bigramFluency(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val f = byId.filter(_._1 < 100).values
    val g = byId.filter(_._1 >= 100).values
    assert(f.sum / f.size > 5 * (g.sum / g.size),
      s"fluent mean ${f.sum / f.size} vs gibberish ${g.sum / g.size}")
    // scores are probabilities in (0, 1]; identical docs score identically
    assert(byId.values.forall(p => p > 0.0 && p <= 1.0))
    assert(byId.filter(_._1 < 100).values.toSet.size === 1)
    // a doc with < 2 tokens contributes no row
    val tiny = Seq((1L, "word"), (2L, "two words")).toDF("doc_id", "text")
    assert(TextAnalysis.bigramFluency(tiny, "doc_id", "text").count() === 1L)
  }

  test("collocations: exclusive pairs out-lift independent pairs, floor prunes") {
    // "alpha beta" always co-occur (exclusive pair); "the" pairs with
    // everything (independent); "rare pair" appears under the floor
    val rows =
      (0 until 20).map(i => (i.toLong, "alpha beta")) ++
      (100 until 120).map(i => (i.toLong, s"the tok$i")) ++
      Seq((200L, "rare pair"), (201L, "rare pair"))
    val corpus = rows.toDF("doc_id", "text")
    val out = TextAnalysis.collocations(corpus, "text", topK = 10,
        minCount = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // the under-floor pair never surfaces
    assert(!out.exists(_._1 == "rare pair"))
    // the exclusive pair ranks first and its lift is the hand value:
    // c2=20, t_b=42, ca=cb=20, t_u=84 → (20/42)/((20/84)^2)
    val expected = (20.0 / 42.0) / ((20.0 / 84.0) * (20.0 / 84.0))
    assert(out.head._1 === "alpha beta")
    assert(math.abs(out.head._3 - expected) < 1e-9, s"${out.head._3}")
    // determinism
    val again = TextAnalysis.collocations(corpus, "text", 10, 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === again.toSeq)
  }

  test("perplexityBuckets: sample cutoffs rank fluent docs head, gibberish tail") {
    // same construction as the fluency test, scaled so the deterministic
    // md5-bucket sample (rate ~1/5, any id type) sees both populations:
    // ids 0..49 fluent (8 sampled), 100..129 gibberish permutations of
    // the same vocabulary (5 sampled)
    val chain = "alpha beta gamma delta epsilon zeta"
    val fluent = (0L until 50L).map(i => (i, chain))
    val perms = chain.split(" ").permutations.drop(1).take(30).toSeq
    val gibberish = perms.zipWithIndex.map { case (p, i) =>
      (100L + i, p.mkString(" "))
    }
    val corpus = (fluent ++ gibberish).toDF("doc_id", "text")
    val out = TextAnalysis.perplexityBuckets(corpus, "doc_id", "text",
        sampleMod = 5L, sampleCap = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    // every scored doc got a bucket; buckets are exactly the three labels
    assert(out.length === 80)
    assert(out.map(_._3).toSet.subsetOf(Set("head", "middle", "tail")))
    // golden model: recompute the sample cutoffs by the documented rule
    // — sample membership is the md5-prefix bucket (Curation.hashBucket's
    // convention) mod 5, cutoffs the elements at 1-based ranks ceil(k/3),
    // ceil(2k/3) of the sample sorted by (fluency, id) — and check every
    // bucket assignment
    def inSample(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(2).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 5 == 0
    }
    val sample = out.filter(r => inSample(r._1)).sortBy(r => (r._2, r._1))
    val k = sample.length
    val t1 = sample((k + 2) / 3 - 1)._2
    val t2 = sample((2 * k + 2) / 3 - 1)._2
    out.foreach { case (id, f, b) =>
      val expected = if (f > t2) "head" else if (f > t1) "middle" else "tail"
      assert(b === expected, s"doc $id fluency $f: $b != $expected")
    }
    // bucket ORDER is value-consistent: every head doc outscores every
    // middle doc, every middle doc outscores every tail doc
    def scores(b: String) = out.filter(_._3 == b).map(_._2)
    if (scores("head").nonEmpty && scores("middle").nonEmpty)
      assert(scores("head").min > scores("middle").max)
    if (scores("middle").nonEmpty && scores("tail").nonEmpty)
      assert(scores("middle").min > scores("tail").max)
    // the gibberish population never reaches head (fluent docs dominate
    // the transition census, so they bound the top tercile)
    assert(!out.filter(_._1 >= 100).map(_._3).contains("head"))
    // deterministic re-run
    val again = TextAnalysis.perplexityBuckets(corpus, "doc_id", "text",
        sampleMod = 5L, sampleCap = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // cutoffs come from the sample: with a cap of 2 the two sampled
    // values still split the corpus into ≤3 nonempty buckets
    val capped = TextAnalysis.perplexityBuckets(corpus, "doc_id", "text",
        sampleMod = 5L, sampleCap = 2)
      .select("bucket").distinct().collect().map(_.getString(0)).toSet
    assert(capped.nonEmpty && capped.subsetOf(Set("head", "middle", "tail")))
  }

  test("two-level IVF assignment matches the driver's nearest-sub rule") {
    val (coarse, subs) = Similarity.trainTwoLevelIvf(vecs, "embedding", k = 25)
    assert(coarse.length == 5 && subs.length == 5) // k1 = ceil(sqrt(25))
    val k2max = subs.map(_.length).max
    val got = Similarity.withTwoLevelIvfList(
        vecs.select(col("vec_id"), col("embedding")), "embedding", coarse, subs)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.MaxValue
      for (c <- cs.indices) {
        val d = v.zip(cs(c)).map { case (a, b) => (a - b) * (a - b) }.sum
        if (d < bestD) { bestD = d; best = c }
      }
      best
    }
    val raw = vecs.select("vec_id", "embedding").collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    raw.foreach { case (id, v) =>
      val c = nearest(v, coarse)
      val s = nearest(v, subs(c))
      assert(got(id) == c * k2max + s, s"vec $id: got ${got(id)}, want ($c,$s)")
    }
    // the composite partitioning is non-trivial and k-bounded
    val cells = got.values.toSet
    assert(cells.size > coarse.length && cells.size <= 5 * k2max,
      s"${cells.size} cells")
    // deterministic retrain
    val (c2, s2) = Similarity.trainTwoLevelIvf(vecs, "embedding", k = 25)
    assert(c2.map(_.toSeq).toSeq == coarse.map(_.toSeq).toSeq &&
      s2.map(_.map(_.toSeq).toSeq).toSeq == subs.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("JL random projection preserves pairwise distances and stays map-only") {
    val proj = Similarity.randomProject(
      vecs, "vec_id", "embedding", inDim = 64, outDim = 16, seed = 2024L)
    // map-only: the projection must plan with ZERO exchanges — at scale
    // it is a pure scan-side pass
    assert(!proj.queryExecution.executedPlan.toString.contains("Exchange"),
      "randomProject must not shuffle")
    val p = proj.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(p.values.forall(_.length == 16))
    val v = vecs.select("vec_id", "embedding").collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // JL guarantee: squared distances within (1±ε); at outDim=16 the ε
    // is loose, so assert the MEDIAN ratio over a fixed pair sample is
    // near 1 and every ratio stays within a wide sanity band
    val ids = v.keys.toSeq.sorted.take(40)
    val ratios = for {
      (a, i) <- ids.zipWithIndex; b <- ids.drop(i + 1)
      da = d2(v(a), v(b)) if da > 0
    } yield d2(p(a), p(b)) / da
    val sortedR = ratios.sorted
    val median = sortedR(sortedR.size / 2)
    assert(math.abs(median - 1.0) < 0.25, s"median distortion $median")
    assert(ratios.forall(r => r > 0.1 && r < 3.5),
      s"pair distortion out of band: ${ratios.filterNot(r => r > 0.1 && r < 3.5).take(3)}")
    // deterministic: same seed, same matrix, same projections
    val again = Similarity.randomProject(
        vecs, "vec_id", "embedding", inDim = 64, outDim = 16, seed = 2024L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p.keys.forall(k => again(k) == p(k).toSeq))
    // Achlioptas sparsity: ~2/3 of matrix entries are exactly zero
    val m = Similarity.jlMatrix(64, 16, 2024L)
    val zeros = m.map(_.count(_ == 0.0)).sum.toDouble / (64 * 16)
    assert(zeros > 0.55 && zeros < 0.78, s"zero fraction $zeros")
  }
}
