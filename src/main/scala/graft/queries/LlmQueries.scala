package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.llm.{Curation, Dedup, MediaCodecs, Multimodal, Packing, Pca, Retrieval, Similarity, TextAnalysis}
import QueryDef._

/** LLM-training-data operators (builder brief §extensions) over the
  * `documents` / `embeddings` tables. SQL-expressible ops carry DuckDB
  * oracles; the sketch/LSH ops (MinHash, SimHash, random-projection ANN)
  * are rows-only here and value-checked in LlmSpec instead — hash
  * sketches don't reproduce across engines by design.
  */
object LlmQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  /** Fixed scratch root for sketch-stage materialization. The sketch ops
    * (MinHash, SimHash, E2LSH, winnowing) hash with engine-specific seeds
    * DuckDB can't reproduce, so each gate materializes its sketch output
    * (keys / candidate pairs / postings) here, RE-READS it, and derives
    * the final result from the read-back frame — the oracle then
    * `read_parquet`s the same files and recomputes the exact verification
    * stage (Hamming / Jaccard / euclidean / posting join) independently.
    * The path is resolved once per JVM ([[QueryDef.oracleScratch]]) and
    * interpolated into both the write path and the oracle SQL, so they
    * always agree — and a forked test JVM gets its own root instead of
    * racing a concurrent Verify run over the same files. */
  private val OracleScratch = QueryDef.oracleScratch

  private def materialize(df: DataFrame, name: String): DataFrame = {
    val path = s"$OracleScratch/$name"
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  private val idxCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, DataFrame)]()

  /** The inverted index + corpus stats, persisted once per (session,
    * sfDir) — mirrors production, where the index is MATERIALIZED once
    * and every query batch reads it (`Retrieval.invertedIndex` scaladoc;
    * the `cachedFactRounds` discipline). The five retrieval gates
    * (bm25 / hybrid / triples / metrics-adjacent) share this build
    * instead of re-censusing the corpus each. */
  private[queries] def cachedIndex(
      s: SparkSession, d: String): (DataFrame, DataFrame) =
    idxCache.computeIfAbsent((s, d), { k =>
      val idx = Retrieval.invertedIndex(
        t(k._1, k._2, "documents"), "doc_id", "text").persist()
      val st = Retrieval.corpusStats(idx).persist()
      (idx, st)
    })

  private val posIdxCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  /** The positional index, persisted once per (session, sfDir) — shared
    * by the phrase and proximity gates, same rationale as
    * [[cachedIndex]]. */
  private[queries] def cachedPosIndex(
      s: SparkSession, d: String): DataFrame =
    posIdxCache.computeIfAbsent((s, d), { k =>
      Retrieval.positionalIndex(
        t(k._1, k._2, "documents"), "doc_id", "text").persist()
    })

  /** Force-build the shared retrieval index caches (inverted index +
    * corpus stats + positional index) so a bench traversal doesn't charge
    * the whole build to whichever gate touches them first. Production
    * contract: these are materialized once, probed per query batch. */
  def prewarmSharedIndexes(s: SparkSession, d: String): Unit = {
    val (idx, st) = cachedIndex(s, d)
    idx.write.mode("overwrite").format("noop").save()
    st.write.mode("overwrite").format("noop").save()
    cachedPosIndex(s, d).write.mode("overwrite").format("noop").save()
  }

  /** Lifecycle hook, the prewarm's twin: evict this session's cached
    * retrieval indexes (see `GraphQueries.clearSharedCells` for the
    * rationale — keyed-by-session caches are correct for the run
    * lifecycle but unbounded in a long-lived session). */
  def clearSharedIndexes(s: SparkSession): Unit = {
    val it = idxCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        try { e.getValue._1.unpersist(); e.getValue._2.unpersist() }
        catch { case _: Throwable => () }
        it.remove()
      }
    }
    val it2 = posIdxCache.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      if (e.getKey._1 eq s) {
        try e.getValue.unpersist() catch { case _: Throwable => () }
        it2.remove()
      }
    }
  }

  /** DuckDB bigram-shingle set of a text expression — mirrors
    * Dedup.wordShingles(_, 2) (normalize → split → distinct bigrams). */
  private def bigramSql(textExpr: String): String = {
    val toks = s"string_split(trim(regexp_replace(lower($textExpr), '\\s+', ' ', 'g')), ' ')"
    s"""list_distinct(list_transform(
        generate_series(1, len($toks) - 1),
        i -> $toks[i] || ' ' || $toks[i+1]))"""
  }

  /** DuckDB trigram-shingle set — mirrors Dedup.wordShingles(_, 3). */
  private def trigramSql(textExpr: String): String = {
    val toks = s"string_split(trim(regexp_replace(lower($textExpr), '\\s+', ' ', 'g')), ' ')"
    s"""list_distinct(list_transform(
        generate_series(1, len($toks) - 2),
        i -> $toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2]))"""
  }

  /** documents ∪ an exact-duplicate shadow copy (id + 10000). */
  private def docsWithDups(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    docs.unionByName(docs.select(
      (col("doc_id") + 10000).as("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars")))
  }

  /** documents ∪ a near-duplicate copy (id + 20000, one word appended). */
  private def docsWithNearDups(s: SparkSession, d: String): DataFrame = {
    // A narrow-scan spread here was TRIED in r11 and REVERTED on
    // measurement: the interleaved A/B (tools/SpreadAb) put the spread
    // at 1.5-1.8× for the cheap-kernel consumers (minhash bands,
    // winnowing) — their per-row work doesn't buy back the exchange.
    // Only the positioned-gram kernel keeps it, at ITS gate
    // (l_substring_runs, A/B 0.73×).
    val docs = t(s, d, "documents")
    docs.unionByName(docs.select(
      (col("doc_id") + 20000).as("doc_id"),
      concat(col("text"), lit(" graftmarker")).as("text"),
      col("lang"), col("source"), col("n_chars")))
  }

  /** embeddings ∪ an identical-vector shadow copy (id + 10000). */
  private def vecsWithDups(s: SparkSession, d: String): DataFrame = {
    val v = t(s, d, "embeddings")
    v.unionByName(v.select(
      (col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label")))
  }

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup via md5-of-normalized-text hash-groupBy: the injected
    // shadow copies collapse onto their originals.
    QueryDef(
      "l_dedup_exact",
      (s, d) =>
        Dedup.exactDuplicateGroups(docsWithDups(s, d), "doc_id", "text")
          .orderBy(col("fingerprint")),
      Some("""SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
              CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
              COUNT(*) AS n_members
              FROM (SELECT doc_id, text FROM documents
                    UNION ALL SELECT doc_id + 10000, text FROM documents)
              GROUP BY 1 ORDER BY fingerprint""")),

    // Exact dedup keep-first: survivors are exactly the original ids.
    QueryDef(
      "l_dedup_exact_keep",
      (s, d) =>
        Dedup.dedupExact(docsWithDups(s, d), "doc_id", "text")
          .agg(
            count(lit(1)).as("n"),
            sum(col("doc_id")).as("sum_ids"),
            countDistinct(col("source")).as("n_sources")),
      Some("""SELECT COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
              COUNT(DISTINCT source) AS n_sources FROM documents""")),

    // One-row dataset card: the header block of every dataset release —
    // corpus size, token total, exact-dedup rate, and language/source
    // concentration. Concentration is the Gini–Simpson index
    // 1 − Σ share² instead of entropy: Σ c² is an exact integer, so the
    // index is ONE IEEE division (Σc² / n²) and hash-verifies
    // cross-engine where Σ p·log p cannot. Three collapsing aggregates
    // (lang grain, source grain, fingerprint grain) + 1-row joins.
    QueryDef(
      "l_dataset_card",
      (s, d) => {
        val docs = t(s, d, "documents")
        def gini(c: String) = docs.groupBy(col(c))
          .agg(count(lit(1)).as("__c"))
          .agg(count(lit(1)).as(s"n_${c}s"),
            sum(col("__c") * col("__c")).cast(LongType).as(s"__ss_$c"))
        val base = docs.agg(
          count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast(LongType))
            .cast(LongType).as("n_tokens"))
        val fps = docs.agg(countDistinct(
          TextAnalysis.fingerprint(col("text"))).as("n_distinct_fps"))
        base.crossJoin(broadcast(fps))
          .crossJoin(broadcast(gini("lang")))
          .crossJoin(broadcast(gini("source")))
          .select(col("n_docs"), col("n_tokens"), col("n_distinct_fps"),
            (lit(1.0) - col("n_distinct_fps").cast(DoubleType) /
              col("n_docs").cast(DoubleType)).as("dup_rate"),
            col("n_langs"),
            (lit(1.0) - col("__ss_lang").cast(DoubleType) /
              (col("n_docs") * col("n_docs")).cast(DoubleType))
              .as("lang_gini"),
            col("n_sources"))
      },
      Some("""WITH b AS (
                SELECT COUNT(*) AS n_docs,
                  CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens,
                  COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS n_distinct_fps
                FROM documents
              ),
              lg AS (
                SELECT COUNT(*) AS n_langs,
                  CAST(SUM(c * c) AS BIGINT) AS ss
                FROM (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang)
              ),
              sg AS (
                SELECT COUNT(*) AS n_sources
                FROM (SELECT source FROM documents GROUP BY source)
              )
              SELECT b.n_docs, b.n_tokens, b.n_distinct_fps,
                1.0e0 - CAST(b.n_distinct_fps AS DOUBLE) / b.n_docs AS dup_rate,
                lg.n_langs,
                1.0e0 - CAST(lg.ss AS DOUBLE) / (b.n_docs * b.n_docs) AS lang_gini,
                sg.n_sources
              FROM b, lg, sg""")),

    // Duplicate-cluster size histogram — the dataset-card dedup
    // statistic (how much of the corpus sits in duplicate classes of
    // each size): fingerprint groupBy to cluster grain, then a
    // cluster-size groupBy to histogram grain. Two collapsing shuffles,
    // output bounded by the largest cluster size.
    QueryDef(
      "l_dedup_cluster_stats",
      (s, d) => {
        val clusters = Dedup.exactDuplicateGroups(
          docsWithDups(s, d), "doc_id", "text")
        val total = clusters.agg(sum(col("n_members")).cast(LongType)
          .as("total_docs"))
        clusters.groupBy(col("n_members"))
          .agg(count(lit(1)).as("n_clusters"))
          .crossJoin(broadcast(total))
          .select(col("n_members"), col("n_clusters"),
            (col("n_members") * col("n_clusters")).cast(LongType)
              .as("n_docs"),
            ((col("n_members") * col("n_clusters")).cast(DoubleType) /
              col("total_docs").cast(DoubleType)).as("frac_docs"))
          .orderBy(col("n_members"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, text FROM documents
                UNION ALL SELECT doc_id + 10000, text FROM documents
              ),
              cl AS (
                SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
                  COUNT(*) AS n_members
                FROM docs GROUP BY fp
              ),
              t AS (SELECT CAST(SUM(n_members) AS BIGINT) AS total_docs FROM cl)
              SELECT n_members, COUNT(*) AS n_clusters,
                CAST(n_members * COUNT(*) AS BIGINT) AS n_docs,
                CAST(n_members * COUNT(*) AS DOUBLE) / t.total_docs AS frac_docs
              FROM cl, t GROUP BY n_members, t.total_docs
              ORDER BY n_members""")),

    // Word-bigram Jaccard near-dup pairs — the exact all-pairs baseline
    // the MinHash path approximates. Bounded to a fixed 500-doc slice:
    // all-pairs is the small-slice verification tool (Dedup.jaccardPairs
    // scaladoc); the LSH query below is the unbounded scale path.
    QueryDef(
      "l_ngram_jaccard",
      (s, d) =>
        Dedup.jaccardPairs(
          t(s, d, "documents").filter(col("doc_id") < 500),
          "doc_id", "text", n = 2, threshold = 0.2)
          .orderBy(col("id_a"), col("id_b")),
      Some("""WITH sh AS (
                SELECT doc_id,
                list_distinct(list_transform(
                  generate_series(1, len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) - 1),
                  i -> string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')[i] || ' ' ||
                       string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')[i+1]
                )) AS sh
                FROM documents WHERE doc_id < 500
              )
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(LEN(LIST_INTERSECT(a.sh, b.sh)) AS DOUBLE) /
                NULLIF(LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))), 0) AS jaccard
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE CAST(LEN(LIST_INTERSECT(a.sh, b.sh)) AS DOUBLE) /
                NULLIF(LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))), 0) >= 0.2
              ORDER BY id_a, id_b""")),

    // Near-dup canonicalization: Jaccard pairs → connected components →
    // min-id canonical per component (the keep-one step after MinHash).
    // Oracle: transitive closure via recursive CTE over the same pairs.
    QueryDef(
      "l_neardup_canonical",
      (s, d) => {
        val slice = t(s, d, "documents").filter(col("doc_id") < 500)
        val pairs = Dedup.jaccardPairs(slice, "doc_id", "text", n = 2, threshold = 0.2)
        Dedup.canonicalizeNearDups(slice.select(col("doc_id")), pairs)
          .orderBy(col("id"))
      },
      Some("""WITH RECURSIVE sh AS (
                SELECT doc_id,
                list_distinct(list_transform(
                  generate_series(1, len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) - 1),
                  i -> string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')[i] || ' ' ||
                       string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')[i+1]
                )) AS sh
                FROM documents WHERE doc_id < 500
              ),
              pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE CAST(LEN(LIST_INTERSECT(a.sh, b.sh)) AS DOUBLE) /
                  NULLIF(LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))), 0) >= 0.2
              ),
              edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
              ),
              reach(id, r) AS (
                SELECT doc_id, doc_id FROM documents WHERE doc_id < 500
                UNION
                SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
              )
              SELECT id, MIN(r) AS canonical_id FROM reach
              GROUP BY id ORDER BY id""")),

    // MinHash + LSH near-dup detection (shingle→minhash→band→bucket join→
    // verify). The LSH candidate set is seed-specific, so it's
    // materialized and the oracle recomputes the EXACT verification stage
    // (bigram Jaccard ≥ threshold) over the same candidates from raw
    // text; LlmSpec separately pins candidate recall vs the exact
    // baseline.
    QueryDef(
      "l_minhash_near_dups",
      (s, d) => {
        val docs = docsWithNearDups(s, d)
        // r=8 rows/band: this synthetic corpus shares one small vocab, so
        // moderate-jaccard pairs are everywhere — a steeper S-curve keeps
        // bucket fan-out linear while still catching the >0.9 near-dups.
        val cands = materialize(
          Dedup.minHashCandidates(docs, "doc_id", "text",
            n = 2, bands = 8, rowsPerBand = 8),
          "minhash_cands")
        Dedup.verifyJaccard(cands, docs, "doc_id", "text", n = 2, threshold = 0.7)
      },
      Some(s"""WITH docs AS (
                 SELECT doc_id, text FROM documents
                 UNION ALL SELECT doc_id + 20000, text || ' graftmarker' FROM documents
               ),
               sh AS (SELECT doc_id, ${bigramSql("text")} AS sh FROM docs),
               c AS (SELECT id_a, id_b
                     FROM read_parquet('$OracleScratch/minhash_cands/*.parquet'))
               SELECT c.id_a, c.id_b,
               CAST(LEN(LIST_INTERSECT(a.sh, b.sh)) AS DOUBLE) /
                 NULLIF(LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))), 0) AS jaccard
               FROM c JOIN sh a ON a.doc_id = c.id_a
                      JOIN sh b ON b.doc_id = c.id_b
               WHERE CAST(LEN(LIST_INTERSECT(a.sh, b.sh)) AS DOUBLE) /
                 NULLIF(LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))), 0) >= 0.7""")),

    // Incremental near-dup detection (the continuous-ingest shape):
    // the corpus is indexed ONCE (band postings + shingle hashes); a
    // new batch probes the index via an equi-join and exact-verifies
    // candidate ids only — corpus text is never re-read, so each
    // increment pays its own size, not the corpus's. The seed-specific
    // candidates are materialized; the oracle recomputes the exact
    // bigram-Jaccard verification from raw text over the same pairs.
    QueryDef(
      "l_neardup_incremental",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val batch = corpus.select(
          (col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" graftmarker")).as("text"))
        val idx = s"$OracleScratch/neardup_index"
        Dedup.materializeNearDupIndex(
          corpus, "doc_id", "text", idx, n = 2, bands = 8, rowsPerBand = 8)
        val cands = materialize(
          Dedup.incrementalNearDupCandidates(
            s, idx, batch, "doc_id", "text", n = 2, bands = 8, rowsPerBand = 8),
          "incr_neardup_cands")
        Dedup.verifyIncrementalCandidates(
          s, idx, cands, batch, "doc_id", "text", n = 2, threshold = 0.7)
      },
      Some(s"""WITH corpus AS (SELECT doc_id, text FROM documents),
               batch AS (SELECT doc_id + 20000 AS doc_id, text || ' graftmarker' AS text
                         FROM documents),
               bsh AS (SELECT doc_id, ${bigramSql("text")} AS sh FROM batch),
               csh AS (SELECT doc_id, ${bigramSql("text")} AS sh FROM corpus),
               c AS (SELECT batch_id, corpus_id
                     FROM read_parquet('$OracleScratch/incr_neardup_cands/*.parquet'))
               SELECT c.batch_id, c.corpus_id,
               CAST(LEN(LIST_INTERSECT(a.sh, b.sh)) AS DOUBLE) /
                 NULLIF(LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))), 0) AS jaccard
               FROM c JOIN bsh a ON a.doc_id = c.batch_id
                      JOIN csh b ON b.doc_id = c.corpus_id
               WHERE CAST(LEN(LIST_INTERSECT(a.sh, b.sh)) AS DOUBLE) /
                 NULLIF(LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))), 0) >= 0.7""")),

    // SimHash near-dup detection (64-bit votes, 8-bit block candidates,
    // Hamming verify — EXACT for distance ≤ 7 by pigeonhole). The keys
    // are hash-scheme-specific, so they're materialized and the oracle
    // recomputes the full ≤7-bit pair set from them by brute force:
    // exactness means block-join + brute force agree pair-for-pair.
    QueryDef(
      "l_simhash_near_dups",
      (s, d) => {
        val keyed = materialize(
          Dedup.withSimHash64(
            docsWithNearDups(s, d).select(col("doc_id").as("id"), col("text")),
            "text", n = 1)
            .select(col("id"), col("simhash").as("skey")),
          "simhash_keys")
        // blockCap: the 8×8-bit pigeonhole puts ~n/256 docs per bucket,
        // so candidates grow O(n²/256) with corpus size — the cap keeps
        // the operator bounded under the ×100 scale-stress corpus (where
        // it reports a lower bound) and is a no-op at gate scale (~4
        // docs/bucket), so the exact-pair oracle below still matches.
        // The scale path proper is simHash128 (l_simhash128_near_dups).
        Dedup.simHashNearDupsFromKeys(keyed, maxDistance = 7,
          blockCap = Some(2000L))
      },
      Some(s"""WITH k AS (SELECT id, skey
                 FROM read_parquet('$OracleScratch/simhash_keys/*.parquet'))
               SELECT a.id AS id_a, b.id AS id_b,
               CAST(bit_count(xor(a.skey, b.skey)) AS INTEGER) AS hamming
               FROM k a JOIN k b ON a.id < b.id
               WHERE bit_count(xor(a.skey, b.skey)) <= 7""")),

    // 128-bit SimHash near-dups — the SCALE PATH for signature-space
    // similarity: eight 16-bit pigeonhole blocks put n/65536 docs per
    // bucket (vs n/256 for the 64-bit scheme), keeping candidates
    // near-linear to ~10⁷ docs with the same exact ≤7-bit guarantee.
    // Keys materialized (engine-seeded hashes); oracle brute-forces the
    // exact ≤7 pair set over the 128-bit signature from the keys.
    QueryDef(
      "l_simhash128_near_dups",
      (s, d) => {
        val keyed = materialize(
          Dedup.withSimHash128(
            docsWithNearDups(s, d).select(col("doc_id").as("id"), col("text")),
            "text", n = 1)
            .select(col("id"), col("skey1"), col("skey2")),
          "simhash128_keys")
        Dedup.simHash128NearDupsFromKeys(keyed, maxDistance = 7)
      },
      Some(s"""WITH k AS (SELECT id, skey1, skey2
                 FROM read_parquet('$OracleScratch/simhash128_keys/*.parquet'))
               SELECT a.id AS id_a, b.id AS id_b,
               CAST(bit_count(xor(a.skey1, b.skey1)) +
                    bit_count(xor(a.skey2, b.skey2)) AS INTEGER) AS hamming
               FROM k a JOIN k b ON a.id < b.id
               WHERE bit_count(xor(a.skey1, b.skey1)) +
                     bit_count(xor(a.skey2, b.skey2)) <= 7""")),

    // Near-dup AUTO-POLICY (Dedup.nearDupsAuto): corpus size picks the
    // algorithm — SimHash-128 (exact, but pairs ∝ n²/65536) under the
    // threshold, MinHash-LSH (slope ~1.2) above it — so no caller ships
    // the quadratic path at 10⁸ docs. At this scale the policy must pick
    // simhash128, whose pair set is deterministic from the materialized
    // keys; the same call with a tiny threshold must pick minhash_lsh
    // (the branch itself is exercised end-to-end in LlmSpec and at ×100
    // in SCALE.md, where auto beats raw simhash128's slope).
    QueryDef(
      "l_neardup_auto",
      (s, d) => {
        val docs = docsWithNearDups(s, d).select(col("doc_id").as("id"), col("text"))
        materialize(
          Dedup.withSimHash128(docs, "text", n = 1)
            .select(col("id"), col("skey1"), col("skey2")),
          "neardup_auto_keys")
        val (method, pairs) = Dedup.nearDupsAuto(docs, "id", "text")
        val (bigMethod, _) =
          Dedup.nearDupsAuto(docs, "id", "text", simhashMaxRows = 10)
        pairs
          .withColumn("method", lit(method))
          .withColumn("big_corpus_picks_minhash", lit(bigMethod == "minhash_lsh"))
      },
      Some(s"""WITH k AS (SELECT id, skey1, skey2
                 FROM read_parquet('$OracleScratch/neardup_auto_keys/*.parquet'))
               SELECT a.id AS id_a, b.id AS id_b,
               'simhash128' AS method,
               TRUE AS big_corpus_picks_minhash
               FROM k a JOIN k b ON a.id < b.id
               WHERE bit_count(xor(a.skey1, b.skey1)) +
                     bit_count(xor(a.skey2, b.skey2)) <= 7""")),

    // Embedding-cosine duplicate pairs over injected identical vectors —
    // the LSH SCALE PATH, unbounded over the whole table: E2LSH bucket
    // candidates (identical vectors always collide), exact cosine ≥ 0.999
    // verify. Candidates are seed-specific → materialized; the oracle
    // recomputes the exact cosine verification over them. The all-pairs
    // O(n²) baseline lives in LlmSpec only.
    QueryDef(
      "l_embedding_dup_pairs",
      (s, d) => {
        val vecs = vecsWithDups(s, d)
        val cands = materialize(
          Similarity.lshCandidatePairs(vecs, "vec_id", "embedding",
            numHashTables = 4, bucketLength = 1.0, bucketCap = 1000),
          "embdup_cands")
        Similarity.verifyCosine(cands, vecs, "vec_id", "embedding", 0.999)
          .select(col("id_a"), col("id_b"))
      },
      Some(s"""WITH v AS (
                 SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                 FROM embeddings
                 UNION ALL
                 SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE))
                 FROM embeddings
               ),
               c AS (SELECT id_a, id_b
                     FROM read_parquet('$OracleScratch/embdup_cands/*.parquet'))
               SELECT c.id_a, c.id_b
               FROM c JOIN v a ON a.vec_id = c.id_a
                      JOIN v b ON b.vec_id = c.id_b
               WHERE list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i])) /
                     (SQRT(list_sum(list_transform(a.e, x -> x * x))) *
                      SQRT(list_sum(list_transform(b.e, x -> x * x)))) >= 0.999""")),

    // Brute-force cosine top-k: exact ANN baseline, per-query ranking.
    QueryDef(
      "l_cosine_topk",
      (s, d) => {
        val vecs = t(s, d, "embeddings")
        Similarity.bruteForceTopK(
            vecs.filter(col("vec_id") < 10), vecs, "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
              ),
              pairs AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                list_sum(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i])) /
                  (SQRT(list_sum(list_transform(q.e, x -> x * x))) *
                   SQRT(list_sum(list_transform(c.e, x -> x * x)))) AS cosine
                FROM v q JOIN v c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 10
              )
              SELECT query_id, rank, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rank
                FROM pairs
              ) WHERE rank <= 5 ORDER BY query_id, rank""")),

    // Hard-negative mining (contrastive-training data prep): per query,
    // the top-3 most-similar vectors with a DIFFERENT label — the
    // negatives that still carry gradient. Rank-only output keeps the
    // compare float-safe.
    QueryDef(
      "l_hard_negatives",
      (s, d) => {
        val vecs = t(s, d, "embeddings")
        Similarity.hardNegatives(
            vecs.filter(col("vec_id") < 10), vecs,
            "vec_id", "embedding", "label", k = 3)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH v AS (
                SELECT vec_id, label,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
              ),
              pairs AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                list_sum(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i])) /
                  (SQRT(list_sum(list_transform(q.e, x -> x * x))) *
                   SQRT(list_sum(list_transform(c.e, x -> x * x)))) AS cosine
                FROM v q JOIN v c
                  ON q.vec_id <> c.vec_id AND q.label IS DISTINCT FROM c.label
                WHERE q.vec_id < 10
              )
              SELECT query_id, rank, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC NULLS LAST, neighbor_id ASC NULLS LAST) AS rank
                FROM pairs
              ) WHERE rank <= 3 ORDER BY query_id, rank""")),

    // Approximate similarity join via random-projection LSH buckets —
    // the ANN scale path. Candidates materialized; the oracle recomputes
    // the exact euclidean ≤ 0.1 verification over them (index-order
    // double accumulation on both engines → bit-identical distances);
    // LlmSpec separately pins candidate recall vs brute force.
    QueryDef(
      "l_lsh_ann_join",
      (s, d) => {
        val vecs = vecsWithDups(s, d)
        val cands = materialize(
          Similarity.lshCandidatePairs(vecs, "vec_id", "embedding",
            numHashTables = 4, bucketLength = 1.0, bucketCap = 1000),
          "lsh_cands")
        Similarity.verifyEuclidean(cands, vecs, "vec_id", "embedding", 0.1)
          .select(col("id_a"), col("id_b"))
      },
      Some(s"""WITH v AS (
                 SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                 FROM embeddings
                 UNION ALL
                 SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE))
                 FROM embeddings
               ),
               c AS (SELECT id_a, id_b
                     FROM read_parquet('$OracleScratch/lsh_cands/*.parquet'))
               SELECT c.id_a, c.id_b
               FROM c JOIN v a ON a.vec_id = c.id_a
                      JOIN v b ON b.vec_id = c.id_b
               WHERE SQRT(list_sum(list_transform(range(1, len(a.e) + 1),
                 i -> (a.e[i] - b.e[i]) * (a.e[i] - b.e[i])))) <= 0.1""")),

    // IVF top-k probe: k-means coarse quantizer (driver-trained on a
    // bounded sample), codegen nearest-centroid assignment, exact
    // distances within the probed lists. Probing every list makes the
    // result EXACT, so the brute-force SQL is a valid oracle here.
    QueryDef(
      "l_ivf_topk",
      (s, d) => {
        val vecs = t(s, d, "embeddings")
        val centroids = Similarity.trainIvfCentroids(vecs, "embedding", k = 16)
        val query = vecs.filter(col("vec_id") === 0)
          .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
        // Assign-once / probe-many: materialize the index partitioned by
        // list id, then probe the materialized table (partition-pruned —
        // PlanSpec asserts a probe with nprobe < k reads only the probed
        // directories). nprobe = 16 probes every list → exact result, so
        // the brute-force SQL below remains a valid oracle.
        val path = s"$OracleScratch/ivf_index"
        Similarity.materializeIvf(
          vecs.filter(col("vec_id") =!= 0), "vec_id", "embedding", centroids, path)
        Similarity.ivfTopKMaterialized(s, path, centroids, query, k = 10, nprobe = 16)
          .select(col("id"))
      },
      Some("""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
              ),
              q AS (SELECT e FROM v WHERE vec_id = 0)
              SELECT vec_id AS id FROM v, q
              WHERE v.vec_id <> 0
              ORDER BY SQRT(list_sum(list_transform(range(1, len(v.e) + 1),
                i -> (v.e[i] - q.e[i]) * (v.e[i] - q.e[i])))) ASC, vec_id ASC
              LIMIT 10""")),

    // LSH single-query top-k probe: the per-query ANN read path. The
    // bucket-filtered candidate set is seed-specific → materialized; the
    // oracle recomputes the exact euclidean top-k over those candidates.
    // The injected identical copy of the query vector must rank first.
    QueryDef(
      "l_lsh_topk",
      (s, d) => {
        val vecs = vecsWithDups(s, d)
        val query = t(s, d, "embeddings").filter(col("vec_id") === 0)
          .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
        val cands = materialize(
          Similarity.lshTopKCandidates(
            vecs.filter(col("vec_id") =!= 0), "vec_id", "embedding", query,
            numHashTables = 4, bucketLength = 1.0)
            .select(col("id")),
          "lsh_topk_cands")
        val queryCol = typedlit(query.map(_.toDouble).toSeq)
        // top-k as orderBy+limit → TakeOrderedAndProject (never a global
        // sort, never a single-partition window), same as l_ivf_topk
        cands
          .join(vecs.select(col("vec_id").as("id"), col("embedding").as("v")), "id")
          .withColumn("dist", graft.functions.F.euclidean(col("v"), queryCol))
          .orderBy(asc("dist"), asc("id"))
          .limit(10)
          .select(col("id"))
      },
      Some(s"""WITH v AS (
                 SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                 FROM embeddings
                 UNION ALL
                 SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE))
                 FROM embeddings
               ),
               q AS (SELECT e FROM v WHERE vec_id = 0),
               c AS (SELECT id FROM read_parquet('$OracleScratch/lsh_topk_cands/*.parquet'))
               SELECT v.vec_id AS id
               FROM c JOIN v ON v.vec_id = c.id, q
               ORDER BY SQRT(list_sum(list_transform(range(1, len(v.e) + 1),
                 i -> (v.e[i] - q.e[i]) * (v.e[i] - q.e[i])))) ASC NULLS LAST,
               v.vec_id ASC NULLS LAST
               LIMIT 10""")),

    // Graph ANN (NSW inside IVF lists — the recall-frontier option
    // completing the LSH/IVF/PQ menu): the coarse quantizer plays
    // HNSW's upper layers (probe descends centroids → lists), one
    // deterministic navigable-small-world graph per list directory,
    // beam-search candidates, exact re-rank. Everything about build and
    // walk is tie-broken on (dist, id), so the candidate set is
    // reproducible → materialized, and the oracle recomputes the exact
    // euclidean top-k over it. The injected identical copy of the query
    // vector must surface first. Recall ≥ 0.95 vs brute force is pinned
    // separately in SimilaritySpec.
    QueryDef(
      "l_hnsw_topk",
      (s, d) => {
        val vecs = vecsWithDups(s, d)
        val query = t(s, d, "embeddings").filter(col("vec_id") === 0)
          .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
        val corpus = vecs.filter(col("vec_id") =!= 0)
        val centroids = Similarity.trainIvfCentroids(corpus, "embedding", k = 8)
        val path = s"$OracleScratch/nsw_index"
        Similarity.materializeNsw(
          corpus, "vec_id", "embedding", centroids, path,
          m = 8, efConstruction = 48)
        val cands = materialize(
          Similarity.nswTopKCandidates(s, path, centroids, query,
            ef = 64, nprobe = 4),
          "nsw_topk_cands")
        val queryCol = typedlit(query.map(_.toDouble).toSeq)
        cands
          .join(vecs.select(col("vec_id").cast("long").as("id"),
            col("embedding").as("v")), "id")
          .withColumn("dist", graft.functions.F.euclidean(col("v"), queryCol))
          .orderBy(asc("dist"), asc("id"))
          .limit(10)
          .select(col("id"))
      },
      Some(s"""WITH v AS (
                 SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                 FROM embeddings
                 UNION ALL
                 SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE))
                 FROM embeddings
               ),
               q AS (SELECT e FROM v WHERE vec_id = 0),
               c AS (SELECT id FROM read_parquet('$OracleScratch/nsw_topk_cands/*.parquet'))
               SELECT CAST(v.vec_id AS BIGINT) AS id
               FROM c JOIN v ON v.vec_id = c.id, q
               ORDER BY SQRT(list_sum(list_transform(range(1, len(v.e) + 1),
                 i -> (v.e[i] - q.e[i]) * (v.e[i] - q.e[i])))) ASC NULLS LAST,
               v.vec_id ASC NULLS LAST
               LIMIT 10""")),

    // Product-quantization ANN (PQ + exact re-rank): vectors compress to
    // m=8 codes (32× memory cut — the representation that fits 10⁹
    // vectors in executor memory), the query scores rows by m LUT
    // lookups (codegen aggregate, no per-row vector math), and the
    // exact re-rank touches only the materialized top-50 candidates.
    // The injected identical copy of the query must surface first; the
    // oracle recomputes the exact euclidean top-k over the candidates.
    QueryDef(
      "l_pq_topk",
      (s, d) => {
        val vecs = vecsWithDups(s, d)
        val query = t(s, d, "embeddings").filter(col("vec_id") === 0)
          .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
        val base = vecs.filter(col("vec_id") =!= 0)
        val books = Similarity.trainPqCodebooks(base, "embedding", m = 8, k = 64)
        val cands = materialize(
          Similarity.pqTopNCandidates(
            base, "vec_id", "embedding", books, query, topN = 100)
            .select(col("id")),
          "pq_topk_cands")
        val queryCol = typedlit(query.map(_.toDouble).toSeq)
        cands
          .join(base.select(col("vec_id").as("id"), col("embedding").as("v")), "id")
          .withColumn("dist", graft.functions.F.euclidean(col("v"), queryCol))
          .orderBy(asc("dist"), asc("id"))
          .limit(10)
          .select(col("id"))
      },
      Some(s"""WITH v AS (
                 SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                 FROM embeddings
                 UNION ALL
                 SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE))
                 FROM embeddings
               ),
               q AS (SELECT e FROM v WHERE vec_id = 0),
               c AS (SELECT id FROM read_parquet('$OracleScratch/pq_topk_cands/*.parquet'))
               SELECT v.vec_id AS id
               FROM c JOIN v ON v.vec_id = c.id, q
               ORDER BY SQRT(list_sum(list_transform(range(1, len(v.e) + 1),
                 i -> (v.e[i] - q.e[i]) * (v.e[i] - q.e[i])))) ASC NULLS LAST,
               v.vec_id ASC NULLS LAST
               LIMIT 10""")),

    // IVF-PQ composed index — the billion-scale ANN layout: coarse IVF
    // lists as PARTITION DIRS (the probe is partition-pruned to nprobe
    // of 16 lists) + PQ codes as the scan representation (ADC LUT
    // scoring, raw vectors touched only for the top-100 re-rank). The
    // materialized candidates feed the exact re-rank; the oracle
    // recomputes it independently.
    QueryDef(
      "l_ivfpq_topk",
      (s, d) => {
        val vecs = vecsWithDups(s, d)
        val base = vecs.filter(col("vec_id") =!= 0)
        val query = t(s, d, "embeddings").filter(col("vec_id") === 0)
          .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
        val centroids = Similarity.trainIvfCentroids(base, "embedding", k = 16)
        val books = Similarity.trainPqCodebooks(base, "embedding", m = 8, k = 64)
        val path = s"$OracleScratch/ivfpq_index"
        Similarity.materializeIvfPq(
          base, "vec_id", "embedding", centroids, books, path)
        val cands = materialize(
          Similarity.ivfPqCandidates(
            s, path, centroids, books, query, nprobe = 8, topN = 100)
            .select(col("id")),
          "ivfpq_cands")
        val queryCol = typedlit(query.map(_.toDouble).toSeq)
        cands
          .join(base.select(col("vec_id").as("id"), col("embedding").as("v")), "id")
          .withColumn("dist", graft.functions.F.euclidean(col("v"), queryCol))
          .orderBy(asc("dist"), asc("id"))
          .limit(10)
          .select(col("id"))
      },
      Some(s"""WITH v AS (
                 SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                 FROM embeddings
                 UNION ALL
                 SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE))
                 FROM embeddings
               ),
               q AS (SELECT e FROM v WHERE vec_id = 0),
               c AS (SELECT id FROM read_parquet('$OracleScratch/ivfpq_cands/*.parquet'))
               SELECT v.vec_id AS id
               FROM c JOIN v ON v.vec_id = c.id, q
               ORDER BY SQRT(list_sum(list_transform(range(1, len(v.e) + 1),
                 i -> (v.e[i] - q.e[i]) * (v.e[i] - q.e[i])))) ASC NULLS LAST,
               v.vec_id ASC NULLS LAST
               LIMIT 10""")),

    // Corpus vocabulary (tokenizer prep): top-50 normalized tokens with
    // counts and corpus fraction; deterministic lexicographic tie-break.
    QueryDef(
      "l_vocab_topk",
      (s, d) =>
        TextAnalysis.vocabulary(t(s, d, "documents"), "text", topK = 50),
      Some("""WITH tk AS (
                SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
                FROM documents
              ),
              c AS (SELECT token, COUNT(*) AS cnt FROM tk
                    WHERE len(token) > 0 GROUP BY token),
              t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c)
              SELECT token, cnt, CAST(cnt AS DOUBLE) / total AS frac
              FROM c, t ORDER BY cnt DESC, token ASC LIMIT 50""")),

    // Vocabulary growth curve (Heaps' law): per id-range epoch, the
    // distinct words occurring in it, the words FIRST seen in it, and
    // the cumulative vocabulary at each cut — the tokenizer-budget
    // planning signal. Bucketing is row-local integer arithmetic off a
    // broadcast min/max (never an ntile sort); the corpus pays one
    // (bucket, word)-grain shuffle and both signals reduce off it; a
    // bucket spine keeps empty epochs present.
    QueryDef(
      "l_vocab_growth",
      (s, d) =>
        TextAnalysis.vocabGrowth(t(s, d, "documents"), "doc_id", "text",
          buckets = 4),
      Some(raw"""WITH b AS (
                SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents
              ),
              t AS (
                SELECT CAST(((CAST(d.doc_id AS HUGEINT) - b.lo) * 4)
                    // (CAST(b.hi AS HUGEINT) - b.lo + 1) + 1 AS INT) AS bucket,
                  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
                FROM documents d, b
              ),
              bw AS (
                SELECT bucket, w FROM t WHERE len(w) > 0 GROUP BY bucket, w
              ),
              pe AS (
                SELECT bucket, CAST(COUNT(*) AS BIGINT) AS epoch_vocab
                FROM bw GROUP BY bucket
              ),
              fs AS (
                SELECT w, MIN(bucket) AS first_bucket FROM bw GROUP BY w
              ),
              nw AS (
                SELECT first_bucket AS bucket,
                  CAST(COUNT(*) AS BIGINT) AS new_words
                FROM fs GROUP BY first_bucket
              ),
              sp AS (
                SELECT CAST(unnest(generate_series(1, 4)) AS INT) AS bucket
              )
              SELECT sp.bucket,
                COALESCE(nw.new_words, 0) AS new_words,
                COALESCE(pe.epoch_vocab, 0) AS epoch_vocab,
                CAST(SUM(COALESCE(nw.new_words, 0)) OVER (ORDER BY sp.bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS cumulative_vocab
              FROM sp
              LEFT JOIN nw ON nw.bucket = sp.bucket
              LEFT JOIN pe ON pe.bucket = sp.bucket
              ORDER BY sp.bucket""")),

    // Corpus-frequency quality signal (the exact-rational stand-in for
    // perplexity filtering): per-doc rare-token density + mean token
    // corpus frequency, every score a single IEEE division of exact
    // integers so the DuckDB hash compare holds bit for bit.
    QueryDef(
      "l_token_rarity",
      (s, d) =>
        TextAnalysis.tokenRarity(t(s, d, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some("""WITH tk AS (
                SELECT doc_id,
                  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
                FROM documents
              ),
              c AS (SELECT token, COUNT(*) AS cnt FROM tk GROUP BY token),
              t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c),
              j AS (SELECT tk.doc_id, c.cnt FROM tk JOIN c USING (token))
              SELECT doc_id,
                COUNT(*) AS n_tokens,
                CAST(SUM(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                  / COUNT(*) AS rare_rate,
                CAST(SUM(cnt) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * t.total) AS mean_freq
              FROM j, t GROUP BY doc_id, t.total ORDER BY doc_id""")),

    // Markov bigram-transition fluency (the exact-rational stand-in for
    // KenLM perplexity filtering): mean corpus transition probability
    // over each doc's consecutive token pairs. Natural text scores high,
    // shuffled/gibberish text low — perplexity's decision boundary
    // without the cross-engine transcendental.
    QueryDef(
      "l_bigram_lm_score",
      (s, d) =>
        TextAnalysis.bigramFluency(t(s, d, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some("""WITH tk AS (
                SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
                FROM documents
              ),
              bg AS (
                SELECT doc_id,
                  unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1])) AS bigram
                FROM tk WHERE len(toks) >= 2
              ),
              c2 AS (SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY bigram),
              c1 AS (SELECT split_part(bigram, ' ', 1) AS prefix,
                            CAST(SUM(c2) AS BIGINT) AS c1
                     FROM c2 GROUP BY 1),
              p AS (SELECT bigram, CAST(c2 AS DOUBLE) / c1 AS p
                    FROM c2 JOIN c1 ON split_part(c2.bigram, ' ', 1) = c1.prefix)
              SELECT bg.doc_id,
                COUNT(*) AS n_bigrams,
                CAST(SUM(CAST(p AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS fluency
              FROM bg JOIN p USING (bigram)
              GROUP BY bg.doc_id ORDER BY bg.doc_id""")),

    // Interpolated Kneser–Ney bigram LM (the smoothing KenLM implements;
    // the CCNet shape: TRAIN on one split, SCORE the held-out split).
    // Seen bigrams are discounted and the freed mass backs off through
    // the continuation distribution; OOV pairs ladder to the
    // continuation / uniform floor instead of bigramFluency's zero.
    // Every probability is IEEE arithmetic over exact integers with a
    // pinned expression tree — bit-reproducible cross-engine.
    QueryDef(
      "l_kneser_ney",
      (s, d) => {
        val docs = t(s, d, "documents")
        val h = Curation.hashBucket(col("doc_id")) % 2
        TextAnalysis.knFluency(
            docs.filter(h === 0), docs.filter(h =!= 0), "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some(raw"""WITH hb AS (
                SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 2 AS h
                FROM documents
              ),
              trb AS (
                SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                  i -> toks[i] || ' ' || toks[i+1])) AS bigram
                FROM hb WHERE h = 0 AND len(toks) >= 2
              ),
              c2 AS (SELECT bigram, COUNT(*) AS c2 FROM trb GROUP BY bigram),
              c1 AS (SELECT split_part(bigram, ' ', 1) AS w1,
                            CAST(SUM(c2) AS BIGINT) AS c1,
                            COUNT(*) AS n1_fwd
                     FROM c2 GROUP BY 1),
              ct AS (SELECT split_part(bigram, ' ', 2) AS w2,
                            COUNT(*) AS n1_bwd
                     FROM c2 GROUP BY 1),
              tt AS (SELECT (SELECT COUNT(*) FROM c2) AS bt,
                            (SELECT COUNT(DISTINCT w)
                             FROM (SELECT unnest(toks) AS w
                                   FROM hb WHERE h = 0)
                             WHERE len(w) > 0) AS v),
              tgb AS (
                SELECT doc_id,
                  unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1])) AS bigram
                FROM hb WHERE h <> 0 AND len(toks) >= 2
              ),
              j AS (
                SELECT tgb.doc_id, c2.c2,
                  CASE WHEN c1.c1 IS NOT NULL THEN
                    (CASE WHEN c2.c2 IS NOT NULL
                          THEN (c2.c2 - 0.75e0) / c1.c1 ELSE 0e0 END)
                    + ((0.75e0 * c1.n1_fwd) / c1.c1) *
                      (CASE WHEN ct.n1_bwd IS NOT NULL
                            THEN CAST(ct.n1_bwd AS DOUBLE) / tt.bt
                            ELSE 1e0 / (tt.v + 1) END)
                  ELSE
                    (CASE WHEN ct.n1_bwd IS NOT NULL
                          THEN CAST(ct.n1_bwd AS DOUBLE) / tt.bt
                          ELSE 1e0 / (tt.v + 1) END)
                  END AS p
                FROM tgb
                LEFT JOIN c2 USING (bigram)
                LEFT JOIN c1 ON c1.w1 = split_part(tgb.bigram, ' ', 1)
                LEFT JOIN ct ON ct.w2 = split_part(tgb.bigram, ' ', 2)
                CROSS JOIN tt
              )
              SELECT doc_id,
                COUNT(*) AS n_bigrams,
                CAST(SUM(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS oov_bigrams,
                CAST(SUM(CAST(p AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*)
                  AS kn_score
              FROM j GROUP BY doc_id ORDER BY doc_id""")),

    // Moore–Lewis contrastive selection: pool docs ranked by in-domain
    // LM score minus general LM score — "looks like the target domain"
    // beats "merely fluent". Both LMs are the Kneser–Ney machinery; the
    // oracle recomputes the full double pipeline independently.
    QueryDef(
      "l_moore_lewis",
      (s, d) => {
        val docs = t(s, d, "documents")
        val h = Curation.hashBucket(col("doc_id")) % 4
        Curation.mooreLewisScores(
            docs.filter(h === 0), docs.filter(h === 1 || h === 2),
            docs.filter(h === 3), "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some(raw"""WITH hb AS (
                SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 4 AS h
                FROM documents
              ),
              tgb AS (
                SELECT doc_id,
                  unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1])) AS bigram
                FROM hb WHERE h = 3 AND len(toks) >= 2
              ),
              a_trb AS (
                SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                  i -> toks[i] || ' ' || toks[i+1])) AS bigram
                FROM hb WHERE h = 0 AND len(toks) >= 2
              ),
              a_c2 AS (SELECT bigram, COUNT(*) AS c2 FROM a_trb GROUP BY bigram),
              a_c1 AS (SELECT split_part(bigram, ' ', 1) AS w1,
                              CAST(SUM(c2) AS BIGINT) AS c1,
                              COUNT(*) AS n1_fwd
                       FROM a_c2 GROUP BY 1),
              a_ct AS (SELECT split_part(bigram, ' ', 2) AS w2,
                              COUNT(*) AS n1_bwd
                       FROM a_c2 GROUP BY 1),
              a_tt AS (SELECT (SELECT COUNT(*) FROM a_c2) AS bt,
                              (SELECT COUNT(DISTINCT w)
                               FROM (SELECT unnest(toks) AS w
                                     FROM hb WHERE h = 0)) AS v),
              a_j AS (
                SELECT tgb.doc_id,
                  CASE WHEN a_c1.c1 IS NOT NULL THEN
                    (CASE WHEN a_c2.c2 IS NOT NULL
                          THEN (a_c2.c2 - 0.75e0) / a_c1.c1 ELSE 0e0 END)
                    + ((0.75e0 * a_c1.n1_fwd) / a_c1.c1) *
                      (CASE WHEN a_ct.n1_bwd IS NOT NULL
                            THEN CAST(a_ct.n1_bwd AS DOUBLE) / a_tt.bt
                            ELSE 1e0 / (a_tt.v + 1) END)
                  ELSE
                    (CASE WHEN a_ct.n1_bwd IS NOT NULL
                          THEN CAST(a_ct.n1_bwd AS DOUBLE) / a_tt.bt
                          ELSE 1e0 / (a_tt.v + 1) END)
                  END AS p
                FROM tgb
                LEFT JOIN a_c2 USING (bigram)
                LEFT JOIN a_c1 ON a_c1.w1 = split_part(tgb.bigram, ' ', 1)
                LEFT JOIN a_ct ON a_ct.w2 = split_part(tgb.bigram, ' ', 2)
                CROSS JOIN a_tt
              ),
              a_s AS (SELECT doc_id, COUNT(*) AS n_bigrams,
                        CAST(SUM(CAST(p AS DECIMAL(18,12))) AS DOUBLE)
                          / COUNT(*) AS in_score
                      FROM a_j GROUP BY doc_id),
              b_trb AS (
                SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                  i -> toks[i] || ' ' || toks[i+1])) AS bigram
                FROM hb WHERE h IN (1, 2) AND len(toks) >= 2
              ),
              b_c2 AS (SELECT bigram, COUNT(*) AS c2 FROM b_trb GROUP BY bigram),
              b_c1 AS (SELECT split_part(bigram, ' ', 1) AS w1,
                              CAST(SUM(c2) AS BIGINT) AS c1,
                              COUNT(*) AS n1_fwd
                       FROM b_c2 GROUP BY 1),
              b_ct AS (SELECT split_part(bigram, ' ', 2) AS w2,
                              COUNT(*) AS n1_bwd
                       FROM b_c2 GROUP BY 1),
              b_tt AS (SELECT (SELECT COUNT(*) FROM b_c2) AS bt,
                              (SELECT COUNT(DISTINCT w)
                               FROM (SELECT unnest(toks) AS w
                                     FROM hb WHERE h IN (1, 2))) AS v),
              b_j AS (
                SELECT tgb.doc_id,
                  CASE WHEN b_c1.c1 IS NOT NULL THEN
                    (CASE WHEN b_c2.c2 IS NOT NULL
                          THEN (b_c2.c2 - 0.75e0) / b_c1.c1 ELSE 0e0 END)
                    + ((0.75e0 * b_c1.n1_fwd) / b_c1.c1) *
                      (CASE WHEN b_ct.n1_bwd IS NOT NULL
                            THEN CAST(b_ct.n1_bwd AS DOUBLE) / b_tt.bt
                            ELSE 1e0 / (b_tt.v + 1) END)
                  ELSE
                    (CASE WHEN b_ct.n1_bwd IS NOT NULL
                          THEN CAST(b_ct.n1_bwd AS DOUBLE) / b_tt.bt
                          ELSE 1e0 / (b_tt.v + 1) END)
                  END AS p
                FROM tgb
                LEFT JOIN b_c2 USING (bigram)
                LEFT JOIN b_c1 ON b_c1.w1 = split_part(tgb.bigram, ' ', 1)
                LEFT JOIN b_ct ON b_ct.w2 = split_part(tgb.bigram, ' ', 2)
                CROSS JOIN b_tt
              ),
              b_s AS (SELECT doc_id,
                        CAST(SUM(CAST(p AS DECIMAL(18,12))) AS DOUBLE)
                          / COUNT(*) AS gen_score
                      FROM b_j GROUP BY doc_id)
              SELECT a_s.doc_id, a_s.n_bigrams, a_s.in_score, b_s.gen_score,
                a_s.in_score - b_s.gen_score AS ml_score
              FROM a_s JOIN b_s ON a_s.doc_id = b_s.doc_id
              ORDER BY a_s.doc_id""")),

    // BPE pair census (tokenizer-training primitive): most frequent
    // adjacent character pairs weighted by word frequency — the corpus
    // collapses to its word vocabulary first, so the pair explosion is
    // vocab-sized, never corpus-sized.
    QueryDef(
      "l_bpe_pair_census",
      (s, d) =>
        TextAnalysis.bpePairCensus(t(s, d, "documents"), "text", topK = 20),
      Some("""WITH tk AS (
                SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
                FROM documents
              ),
              wc AS (SELECT w, COUNT(*) AS c FROM tk GROUP BY w),
              pairs AS (
                SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                  i -> substr(w, i, 2))) AS pair, c
                FROM wc WHERE len(w) >= 2
              )
              SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt
              FROM pairs GROUP BY pair
              ORDER BY cnt DESC, pair ASC LIMIT 20""")),

    // BPE tokenizer INFERENCE: encode every doc with 30 trained merges
    // (rank-ordered greedy merge per word behind the justified
    // mapPartitions barrier). The oracle check is the LOSSLESSNESS
    // property cross-engine: md5 of the piece-reconstructed text must
    // equal DuckDB's md5 of the independently normalized text — if the
    // encoder dropped, duplicated, or reordered one character anywhere
    // in the corpus, the hash diverges.
    QueryDef(
      "l_bpe_encode",
      (s, d) => {
        // NULL text reads as present-but-empty on both sides (the
        // l_corpus_diff discipline); an empty norm has 0 pieces for 1
        // empty "word", so the bound carries an explicit empty guard
        // instead of silently failing on blank documents.
        val docs = t(s, d, "documents")
          .withColumn("text", coalesce(col("text"), lit("")))
        val merges = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 30)
        TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
          .select(col("doc_id"),
            size(col("bpe_tokens")).as("n_words"),
            aggregate(transform(col("bpe_tokens"), a => size(a)),
              lit(0), (acc, x) => acc + x).as("__n_pieces"),
            concat_ws(" ",
              transform(col("bpe_tokens"), a => concat_ws("", a))).as("__rec"))
          .select(col("doc_id"), col("n_words"),
            md5(col("__rec")).as("reconstruction_md5"),
            ((col("__n_pieces") >= col("n_words") &&
              col("__n_pieces") <= length(col("__rec"))) ||
              length(col("__rec")) === 0).as("pieces_bounded"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH n AS (
                SELECT doc_id,
                  trim(regexp_replace(lower(COALESCE(text, '')), '\s+', ' ', 'g')) AS norm
                FROM documents
              )
              SELECT doc_id,
                CAST(len(string_split(norm, ' ')) AS INT) AS n_words,
                md5(norm) AS reconstruction_md5,
                TRUE AS pieces_bounded
              FROM n ORDER BY doc_id""")),

    // Unigram-LM (SentencePiece, Kudo 2018) tokenizer — the second
    // tokenizer-training family next to BPE. Gate 1: the SEED-piece
    // census (substrings of census words up to length 3, weighted by
    // word frequency, top-K by count with single chars always retained)
    // is pure relational algebra, so the FULL training input gets a
    // real DuckDB oracle — not just a pinned invariant.
    QueryDef(
      "l_unigram_seed_census",
      (s, d) =>
        graft.llm.Unigram.seedCensus(t(s, d, "documents"), "text",
          maxPieceLen = 3, seedSize = 4000),
      Some(raw"""WITH w AS (
                SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
                FROM documents
              ),
              wc AS (
                SELECT w, COUNT(*) AS c FROM w WHERE len(w) > 0 GROUP BY w
              ),
              pieces AS (
                SELECT unnest(flatten(list_transform(generate_series(1, 3),
                  l -> CASE WHEN len(w) >= l THEN
                         list_transform(generate_series(1, len(w) - l + 1),
                           i -> substring(w, i, l))
                       ELSE CAST([] AS VARCHAR[]) END))) AS piece, c
                FROM wc
              ),
              pc AS (
                SELECT piece, CAST(SUM(c) AS BIGINT) AS cnt
                FROM pieces GROUP BY piece
              ),
              top AS (
                SELECT piece, cnt FROM pc ORDER BY cnt DESC, piece LIMIT 4000
              ),
              uni AS (
                SELECT piece, cnt FROM top
                UNION ALL
                SELECT piece, cnt FROM pc WHERE len(piece) = 1
              )
              SELECT piece, MAX(cnt) AS cnt FROM uni GROUP BY piece""")),

    // Incremental tokenizer-census maintenance: the word census is
    // ADDITIVE, so the 100 TB retrain path never rescans the corpus —
    // census each NEW shard (O(shard)), merge at vocab grain (one
    // ~10⁶-row shuffle), and re-derive any tokenizer census from the
    // merged words. The Spark side goes through the 3-shard
    // split→census→merge→derive chain; the oracle computes the seed
    // census DIRECTLY from the full corpus — hash equality proves the
    // incremental path is lossless end to end.
    QueryDef(
      "l_census_incremental",
      (s, d) => {
        val docs = t(s, d, "documents")
        val shardCensuses = (0 until 3).map(i =>
          TextAnalysis.wordCensus(
            docs.filter(pmod(col("doc_id"), lit(3)) === i), "text"))
        graft.llm.Unigram.seedCensusFromWords(
          TextAnalysis.mergeWordCensus(shardCensuses),
          maxPieceLen = 3, seedSize = 3000)
      },
      Some(raw"""WITH w AS (
                SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
                FROM documents
              ),
              wc AS (
                SELECT w, COUNT(*) AS c FROM w WHERE len(w) > 0 GROUP BY w
              ),
              pieces AS (
                SELECT unnest(flatten(list_transform(generate_series(1, 3),
                  l -> CASE WHEN len(w) >= l THEN
                         list_transform(generate_series(1, len(w) - l + 1),
                           i -> substring(w, i, l))
                       ELSE CAST([] AS VARCHAR[]) END))) AS piece, c
                FROM wc
              ),
              pc AS (
                SELECT piece, CAST(SUM(c) AS BIGINT) AS cnt
                FROM pieces GROUP BY piece
              ),
              top AS (
                SELECT piece, cnt FROM pc ORDER BY cnt DESC, piece LIMIT 3000
              ),
              uni AS (
                SELECT piece, cnt FROM top
                UNION ALL
                SELECT piece, cnt FROM pc WHERE len(piece) = 1
              )
              SELECT piece, MAX(cnt) AS cnt FROM uni GROUP BY piece""")),

    // Gate 2: Viterbi-EM training + exact-integer Viterbi ENCODE, pinned
    // by the l_bpe_encode losslessness discipline — the oracle
    // independently normalizes the raw text and compares md5 against the
    // piece-reconstructed text, so a segmenter that drops, duplicates,
    // or reorders ONE character anywhere in the corpus diverges. The
    // vocabulary-membership and piece-count bounds are Spark-side
    // assertions the oracle pins as constants (DuckDB cannot re-run the
    // DP; the census feeding it is oracle-checked by gate 1).
    QueryDef(
      "l_unigram_encode",
      (s, d) => {
        val docs = t(s, d, "documents")
          .withColumn("text", coalesce(col("text"), lit("")))
        val pieces = graft.llm.Unigram.train(docs, "text",
          vocabSize = 1500, maxPieceLen = 3, iterations = 2, seedSize = 4000)
        val vocab = pieces.map(_.piece)
        graft.llm.Unigram.encode(docs, "doc_id", "text", pieces, maxPieceLen = 3)
          .select(col("doc_id"),
            size(col("unigram_tokens")).as("n_words"),
            aggregate(transform(col("unigram_tokens"), a => size(a)),
              lit(0), (acc, x) => acc + x).as("__n_pieces"),
            concat_ws(" ",
              transform(col("unigram_tokens"), a => concat_ws("", a))).as("__rec"),
            (size(array_except(flatten(col("unigram_tokens")),
              typedLit(vocab))) === 0).as("all_pieces_in_vocab"))
          .select(col("doc_id"), col("n_words"),
            md5(col("__rec")).as("reconstruction_md5"),
            ((col("__n_pieces") >= col("n_words") &&
              col("__n_pieces") <= length(col("__rec"))) ||
              length(col("__rec")) === 0).as("pieces_bounded"),
            col("all_pieces_in_vocab"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""WITH n AS (
                SELECT doc_id,
                  trim(regexp_replace(lower(COALESCE(text, '')), '\s+', ' ', 'g')) AS norm
                FROM documents
              )
              SELECT doc_id,
                CAST(len(string_split(norm, ' ')) AS INT) AS n_words,
                md5(norm) AS reconstruction_md5,
                TRUE AS pieces_bounded,
                TRUE AS all_pieces_in_vocab
              FROM n ORDER BY doc_id""")),

    // WordPiece gate 1: the positional-substring vocabulary (initial vs
    // ##-continuation forms censused separately, keyed by
    // (piece, is_cont) — the display string alone is ambiguous when a
    // corpus word literally starts with '##') is pure relational
    // algebra — DuckDB recomputes census, top-K cut, and the
    // single-form union-back exactly.
    QueryDef(
      "l_wordpiece_vocab",
      (s, d) =>
        graft.llm.WordPiece.buildVocab(t(s, d, "documents"), "text",
          vocabSize = 2000, maxPieceLen = 4),
      Some(raw"""WITH w AS (
                SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
                FROM documents
              ),
              wc AS (
                SELECT w, COUNT(*) AS c FROM w WHERE len(w) > 0 GROUP BY w
              ),
              parts AS (
                SELECT unnest(flatten(list_transform(generate_series(1, 4),
                  l -> CASE WHEN len(w) >= l THEN
                         list_transform(generate_series(1, len(w) - l + 1),
                           i -> struct_pack(sub := substring(w, i, l),
                                            ic := i <> 1))
                       ELSE CAST([] AS STRUCT(sub VARCHAR, ic BOOLEAN)[]) END))) AS u, c
                FROM wc
              ),
              pieces AS (
                SELECT CASE WHEN u.ic THEN '##' || u.sub ELSE u.sub END AS piece,
                       u.ic AS is_cont, c
                FROM parts
              ),
              pc AS (
                SELECT piece, is_cont, CAST(SUM(c) AS BIGINT) AS cnt
                FROM pieces GROUP BY piece, is_cont
              ),
              top AS (
                SELECT piece, is_cont, cnt FROM pc
                ORDER BY cnt DESC, piece, is_cont LIMIT 2000
              ),
              uni AS (
                SELECT piece, is_cont, cnt FROM top
                UNION ALL
                SELECT piece, is_cont, cnt FROM pc
                WHERE (NOT is_cont AND len(piece) = 1)
                   OR (is_cont AND len(piece) = 3)
              )
              SELECT piece, is_cont, MAX(cnt) AS cnt
              FROM uni GROUP BY piece, is_cont""")),

    // WordPiece gate 2: greedy longest-match-first ENCODE, pinned by the
    // tokenizer losslessness discipline — reconstruction strips the ##
    // prefix from continuation positions and must md5-match the
    // independently normalized raw text; bounds and vocabulary
    // membership are Spark-side assertions the oracle pins as constants
    // (the vocab feeding them is oracle-checked by gate 1).
    QueryDef(
      "l_wordpiece_encode",
      (s, d) => {
        val docs = t(s, d, "documents")
          .withColumn("text", coalesce(col("text"), lit("")))
        val vocab = graft.llm.WordPiece.Vocab.fromRows(
          graft.llm.WordPiece
            .buildVocab(docs, "text", vocabSize = 2000, maxPieceLen = 4)
            .select(col("piece"), col("is_cont")).collect()
            .map(r => (r.getString(0), r.getBoolean(1))))
        val initSet = vocab.initial.toSeq.sorted
        val contSet = vocab.continuation.toSeq.sorted
        graft.llm.WordPiece.encode(docs, "doc_id", "text",
          vocab, maxPieceLen = 4)
          .select(col("doc_id"),
            size(col("wp_tokens")).as("n_words"),
            aggregate(transform(col("wp_tokens"), a => size(a)),
              lit(0), (acc, x) => acc + x).as("__n_pieces"),
            concat_ws(" ", transform(col("wp_tokens"), a =>
              concat_ws("", transform(a, (p, i) =>
                when(i === 0, p)
                  .otherwise(p.substr(lit(3), length(p)))))))
              .as("__rec"),
            // positional membership: a word's FIRST piece must be a
            // vocab initial form, every later piece a continuation form
            // (the two namespaces are distinct — see WordPiece doc).
            // countTokensIn probes a SHARED hash set (built once per
            // expression instance) — O(pieces) per row. The previous
            // array_except(literal) rebuilt a 2000-entry set from the
            // vocab literal EVERY ROW (O(pieces+V)·rows): ~40% of the
            // ×100 campaign's encode-gate time, slope 1.01 → 0.x.
            {
              val firstPieces = filter(
                transform(col("wp_tokens"), a => element_at(a, 1)),
                p => p.isNotNull)
              val restPieces = flatten(transform(col("wp_tokens"),
                a => slice(a, lit(2), greatest(size(a) - 1, lit(0)))))
              ((graft.functions.F.countTokensIn(firstPieces, initSet) ===
                size(firstPieces)) &&
                (graft.functions.F.countTokensIn(restPieces, contSet) ===
                  size(restPieces)))
                .as("all_pieces_in_vocab")
            })
          .select(col("doc_id"), col("n_words"),
            md5(col("__rec")).as("reconstruction_md5"),
            ((col("__n_pieces") >= col("n_words") &&
              col("__n_pieces") <= length(col("__rec"))) ||
              length(col("__rec")) === 0).as("pieces_bounded"),
            col("all_pieces_in_vocab"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""WITH n AS (
                SELECT doc_id,
                  trim(regexp_replace(lower(COALESCE(text, '')), '\s+', ' ', 'g')) AS norm
                FROM documents
              )
              SELECT doc_id,
                CAST(len(string_split(norm, ' ')) AS INT) AS n_words,
                md5(norm) AS reconstruction_md5,
                TRUE AS pieces_bounded,
                TRUE AS all_pieces_in_vocab
              FROM n ORDER BY doc_id""")),

    // Corpus heavy hitters — EXACT output at sketch-bounded cost: a
    // Misra–Gries aggregate (mergeable, ≤512 rows per partition cross
    // the wire — never a full-vocabulary shuffle) yields a candidate
    // set guaranteed to contain every token above total/513; the ≤512
    // candidates are exactly recounted (broadcast semi-join) and the
    // true threshold cnt·200 > total applied to exact counts. The
    // oracle recomputes the same answer the exhaustive way.
    QueryDef(
      "l_heavy_hitters",
      (s, d) =>
        TextAnalysis.heavyHitterTokens(
          t(s, d, "documents"), "text", ratio = 200L, capacity = 512),
      Some("""WITH tk AS (
                SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
                FROM documents
              ),
              c AS (SELECT token, COUNT(*) AS cnt FROM tk
                    WHERE len(token) > 0 GROUP BY token),
              t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c)
              SELECT token, cnt FROM c, t
              WHERE cnt * 200 > total
              ORDER BY cnt DESC, token ASC""")),

    // Embedding-distribution drift between two corpus snapshots: each
    // side reduces to its per-dimension mean (decimal-exact, so the
    // means are order-independent), the two mean vectors compare by
    // cosine and L2. One corpus pass per side; the compare is dims-sized.
    QueryDef(
      "l_embedding_drift",
      (s, d) => {
        val vecs = t(s, d, "embeddings")
        Similarity.embeddingDrift(
          vecs.filter(pmod(col("vec_id"), lit(2)) === 0),
          vecs.filter(pmod(col("vec_id"), lit(2)) === 1),
          "embedding")
      },
      Some(raw"""WITH v AS (
                SELECT vec_id, embedding, vec_id % 2 AS h FROM embeddings
              ),
              da AS (
                SELECT u.i AS dim,
                  CAST(SUM(CAST(CAST(e.embedding[u.i] AS DOUBLE)
                    AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m_a,
                  CAST(COUNT(*) AS BIGINT) AS n_a
                FROM v e, (SELECT unnest(generate_series(1, 64)) AS i) u
                WHERE e.h = 0 GROUP BY u.i
              ),
              db AS (
                SELECT u.i AS dim,
                  CAST(SUM(CAST(CAST(e.embedding[u.i] AS DOUBLE)
                    AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m_b,
                  CAST(COUNT(*) AS BIGINT) AS n_b
                FROM v e, (SELECT unnest(generate_series(1, 64)) AS i) u
                WHERE e.h = 1 GROUP BY u.i
              ),
              j AS (SELECT da.dim, m_a, n_a, m_b, n_b
                    FROM da JOIN db USING (dim)),
              agg AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
                  MAX(n_a) AS n_a, MAX(n_b) AS n_b,
                  CAST(SUM(CAST(m_a * m_b AS DECIMAL(38,18))) AS DOUBLE)
                    AS dot,
                  CAST(SUM(CAST(m_a * m_a AS DECIMAL(38,18))) AS DOUBLE)
                    AS na2,
                  CAST(SUM(CAST(m_b * m_b AS DECIMAL(38,18))) AS DOUBLE)
                    AS nb2,
                  CAST(SUM(CAST((m_a - m_b) * (m_a - m_b)
                    AS DECIMAL(38,18))) AS DOUBLE) AS d2
                FROM j
              )
              SELECT n_dims, n_a, n_b,
                ROUND(dot / (SQRT(na2) * SQRT(nb2)), 9) AS cosine_of_means,
                ROUND(SQRT(d2), 9) AS l2_of_means
              FROM agg""")),

    // Count–Min point-frequency probes: one mergeable sketch pass over
    // the token stream, probe lookups driver-side from the
    // broadcast-sized sketch, CMS contract booleans (never-under /
    // within-eps) pinned against exact recounts — the sketch answers
    // "how frequent is THIS key" where MG answers "who is frequent".
    QueryDef(
      "l_cms_counts",
      (s, d) =>
        TextAnalysis.cmsTokenCounts(
          t(s, d, "documents"), "text",
          probes = Seq("table", "spark", "zz_absent"),
          eps = 0.001, confidence = 0.99, seed = 42),
      Some("""WITH p AS (
                SELECT * FROM (VALUES ('table'), ('spark'), ('zz_absent'))
                  AS v(token)
              ),
              tk AS (
                SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
                FROM documents
              ),
              c AS (SELECT token, COUNT(*) AS cnt
                    FROM tk WHERE len(token) > 0 GROUP BY token)
              SELECT p.token,
                COALESCE(c.cnt, 0) AS exact_cnt,
                TRUE AS never_under, TRUE AS within_eps
              FROM p LEFT JOIN c USING (token)
              ORDER BY p.token""")),

    // Per-DOMAIN heavy hitters (the vocabulary profile of every source
    // at sketch-bounded cost): per-group Misra–Gries candidates, exact
    // per-group recount, true threshold on exact counts — output exact,
    // so the oracle is the full per-group census with HAVING.
    QueryDef(
      "l_heavy_hitters_by_domain",
      (s, d) =>
        TextAnalysis.heavyHitterTokensByGroup(
          t(s, d, "documents"), "source", "text",
          ratio = 50L, capacity = 256),
      Some("""WITH tk AS (
                SELECT source,
                  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
                FROM documents
              ),
              c AS (SELECT source, token, COUNT(*) AS cnt
                    FROM tk WHERE len(token) > 0 GROUP BY source, token),
              t AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS total
                    FROM c GROUP BY source)
              SELECT c.source, c.token, c.cnt
              FROM c JOIN t USING (source)
              WHERE c.cnt * 50 > t.total
              ORDER BY c.source, c.cnt DESC, c.token ASC""")),

    // Language-ID heuristic: argmax of per-language function-word stream
    // ratios (deterministic tie-break en > de > fr > es).
    QueryDef(
      "l_langid",
      (s, d) =>
        t(s, d, "documents")
          .withColumn("detected", TextAnalysis.languageId(col("text")))
          .groupBy(col("detected"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("detected")),
      Some("""WITH scored AS (
                SELECT
                CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['the','a','of','and','to','in','is','it','that','was'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_en,
                CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','zu'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_de,
                CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['le','la','les','et','est','un','une','pas','avec','pour'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_fr,
                CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['el','la','los','y','es','un','una','no','con','para'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_es
                FROM documents
              )
              SELECT detected, COUNT(*) AS n FROM (
                SELECT CASE WHEN (s_en + s_de + s_fr + s_es) > 0 THEN
                  CASE WHEN s_es > GREATEST(s_en, s_de, s_fr) THEN 'es'
                       WHEN s_fr > GREATEST(s_en, s_de) THEN 'fr'
                       WHEN s_de > s_en THEN 'de'
                       ELSE 'en' END
                ELSE 'und' END AS detected
                FROM scored
              ) GROUP BY detected ORDER BY detected""")),

    // Linear classifier inference (fastText-shaped quality filter):
    // feature-hashed token weights from a broadcast table, mean-scored
    // per doc — zero shuffles, pure codegen. The stand-in weight table
    // is a deterministic formula both engines rebuild.
    QueryDef(
      "l_classifier_score",
      (s, d) => {
        val w = Curation.standInWeightsMilli(256)
        t(s, d, "documents")
          .select(col("doc_id"),
            Curation.linearTextScore(col("text"), w).as("score"))
          .withColumn("keep", col("score") > 0.0)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tk AS (
                SELECT doc_id,
                  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
                FROM documents
              ),
              w AS (
                SELECT doc_id,
                  ((CAST(('0x' || substr(md5(t), 1, 4)) AS BIGINT) % 256)
                    * 2654435761) % 1000 - 500 AS wm
                FROM tk
              )
              SELECT doc_id,
                CAST(SUM(wm) AS DOUBLE) / (COUNT(*) * 1000.0e0) AS score,
                (CAST(SUM(wm) AS DOUBLE) / (COUNT(*) * 1000.0e0)) > 0.0e0 AS keep
              FROM w GROUP BY doc_id ORDER BY doc_id""")),

    // Eval-suite leak report — the flip side of decontamination: per
    // EVAL doc, how much of it already leaks into training data.
    // Planted design: half the eval suite (doc_id % 20 == 0) has an
    // exact copy in train, so those rows must read fully_leaked with
    // coverage 1.0 while the rest report their natural shared-vocab
    // partial coverage. Eval docs with no match surface with coverage
    // 0 — absence of evidence is a row, not a missing row.
    QueryDef(
      "l_eval_leak_report",
      (s, d) => {
        val docs = t(s, d, "documents")
        // eval is PINNED to the base id block (replicated scale corpora
        // stride doc_id by 1e6 per replica): an eval set is a fixed
        // artifact in production — only train grows with the lake — so
        // the dual-scale campaign must measure fixed-eval × growing-
        // train, not an eval slice growing with the corpus (the r7
        // campaign's 3.03 "slope" measured exactly that artifact;
        // leak_scale.json's production-shape row measured 0.08).
        // Hash-neutral at gate scale: every base doc_id is below the
        // stride. The bound is Tables.ReplicaStride — the SAME constant
        // the replicator strides by — so the two can't silently diverge
        // if the base corpus ever grows toward the stride.
        val evalDocs = docs.filter(
          col("doc_id") % 10 === 0 &&
            col("doc_id") < graft.core.Tables.ReplicaStride)
        val train = docs.filter(col("doc_id") % 10 =!= 0)
          .unionByName(docs.filter(col("doc_id") % 20 === 0)
            .select((col("doc_id") + 50000).as("doc_id"), col("text"),
              col("lang"), col("source"), col("n_chars")))
        // corpus-relative hot-gram cap (~1% of train docs): grams above
        // it take the pair-free hot path — the output is EXACT either
        // way (the DuckDB oracle below is the naive formulation), but
        // without the cap a boilerplate phrase shared by eval and train
        // makes the match stream quadratic (the ×100 campaign filled
        // the disk mid-join before this path existed)
        val nTrain = train.count()
        Curation.evalContaminationReport(
            train, evalDocs, "doc_id", "text", n = 3,
            hotGramDf = Some(math.max(5L, nTrain / 100)))
          .orderBy(col("eval_id"))
      },
      Some(s"""WITH ev AS (
                 SELECT doc_id, text FROM documents
                 WHERE doc_id % 10 = 0
                   AND doc_id < ${graft.core.Tables.ReplicaStride}
               ),
               tr AS (
                 SELECT doc_id, text FROM documents WHERE doc_id % 10 != 0
                 UNION ALL
                 SELECT doc_id + 50000, text FROM documents WHERE doc_id % 20 = 0
               ),
               eg AS (SELECT doc_id AS eval_id, ${trigramSql("text")} AS grams FROM ev),
               base AS (SELECT eval_id, len(grams) AS n_ngrams FROM eg),
               ege AS (SELECT eval_id, unnest(grams) AS gram FROM eg),
               tge AS (SELECT doc_id AS train_id, unnest(${trigramSql("text")}) AS gram FROM tr),
               m AS (SELECT ege.eval_id, ege.gram, tge.train_id
                     FROM ege JOIN tge USING (gram)),
               cov AS (SELECT eval_id, COUNT(DISTINCT gram) AS n_covered
                       FROM m GROUP BY eval_id),
               td AS (SELECT eval_id, COUNT(DISTINCT train_id) AS n_train_docs
                      FROM m GROUP BY eval_id)
               SELECT base.eval_id, base.n_ngrams,
                 CAST(COALESCE(cov.n_covered, 0) AS BIGINT) AS n_covered,
                 CAST(COALESCE(td.n_train_docs, 0) AS BIGINT) AS n_train_docs,
                 CAST(COALESCE(cov.n_covered, 0) AS DOUBLE)
                   / NULLIF(base.n_ngrams, 0) AS coverage,
                 (base.n_ngrams > 0 AND
                  COALESCE(cov.n_covered, 0) = base.n_ngrams) AS fully_leaked
               FROM base
               LEFT JOIN cov USING (eval_id)
               LEFT JOIN td USING (eval_id)
               ORDER BY base.eval_id""")),

    // Classifier threshold sweep — the calibration table every filter
    // deployment reads before picking its operating point: keep count,
    // keep rate, and kept-mean score per candidate threshold. ONE pass:
    // scores compute row-local (zero-shuffle classifier) and all 11
    // thresholds fold into conditional sums inside a single aggregate —
    // never a corpus × thresholds cross join. Exact-rational: the score
    // is the proven classifier double, sums decimal-accumulate, each
    // rate/mean is one IEEE division.
    {
      val thresholds = Seq(-0.5, -0.4, -0.3, -0.2, -0.1, 0.0,
        0.1, 0.2, 0.3, 0.4, 0.5)
      val scoreSql =
        """tk AS (
             SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
             FROM documents
           ),
           w AS (
             SELECT doc_id,
               ((CAST(('0x' || substr(md5(t), 1, 4)) AS BIGINT) % 256)
                 * 2654435761) % 1000 - 500 AS wm
             FROM tk
           ),
           sc AS (
             SELECT doc_id,
               CAST(SUM(wm) AS DOUBLE) / (COUNT(*) * 1000.0e0) AS score
             FROM w GROUP BY doc_id
           )"""
      val armsSql = thresholds.zipWithIndex.map { case (t, i) =>
        s"""SUM(CASE WHEN score > ${t}e0 THEN 1 ELSE 0 END) AS k_$i,
            SUM(CASE WHEN score > ${t}e0 THEN CAST(score AS DECIMAL(18,12)) END) AS s_$i"""
      }.mkString(",\n")
      val rowsSql = thresholds.zipWithIndex.map { case (t, i) =>
        s"""SELECT ${t}e0 AS threshold, n AS n_docs,
            CAST(k_$i AS BIGINT) AS n_keep,
            CAST(k_$i AS DOUBLE) / n AS keep_rate,
            CASE WHEN k_$i > 0 THEN CAST(s_$i AS DOUBLE) / k_$i END AS mean_kept
            FROM c"""
      }.mkString("\nUNION ALL ")
      QueryDef(
        "l_threshold_sweep",
        (s, d) => {
          val weights = Curation.standInWeightsMilli(256)
          val scored = t(s, d, "documents")
            .select(Curation.linearTextScore(col("text"), weights)
              .as("score"))
          val aggCols = thresholds.zipWithIndex.flatMap { case (th, i) =>
            Seq(
              sum(when(col("score") > th, 1L).otherwise(0L)).as(s"k_$i"),
              sum(when(col("score") > th,
                col("score").cast(DecimalType(18, 12)))).as(s"s_$i"))
          }
          val stackRows = thresholds.zipWithIndex.map { case (th, i) =>
            s"""cast($th as double), n, k_$i,
                cast(k_$i as double) / cast(n as double),
                if(k_$i > 0, cast(s_$i as double) / cast(k_$i as double),
                   cast(null as double))"""
          }.mkString(",\n")
          scored.agg(count(lit(1)).as("n"), aggCols: _*)
            .select(expr(
              s"""stack(${thresholds.size},
                 $stackRows) AS (threshold, n_docs, n_keep, keep_rate, mean_kept)"""))
            .orderBy(col("threshold"))
        },
        Some(s"""WITH $scoreSql,
                 c AS (SELECT COUNT(*) AS n, $armsSql FROM sc)
                 $rowsSql
                 ORDER BY threshold"""))
    },

    // URL canonicalization dedup (the pre-fetch crawl step): lowercase
    // scheme/host, drop fragments and utm_* tracking params, sort the
    // surviving query params — four raw spellings per page collapse to
    // one canonical form via a hash-groupBy. The crafted variants are
    // deterministic functions of doc_id that both engines rebuild.
    QueryDef(
      "l_url_canonical",
      (s, d) => {
        val urls = t(s, d, "documents").select(col("doc_id"),
          concat(
            when(col("doc_id") % 2 === 0, lit("HTTPS://"))
              .otherwise(lit("https://")),
            when(col("doc_id") % 3 === 0, lit("Example.COM"))
              .otherwise(lit("example.com")),
            lit("/p/"), (col("doc_id") % 50).cast(StringType),
            when(col("doc_id") % 4 === 0, lit("?utm_source=feed&b=2&a=1"))
              .when(col("doc_id") % 4 === 1, lit("?a=1&b=2"))
              .otherwise(lit("")),
            when(col("doc_id") % 5 === 0, lit("#frag"))
              .otherwise(lit(""))).as("url"))
        urls
          .withColumn("canonical", Curation.canonicalizeUrl(col("url")))
          .groupBy(col("canonical"))
          .agg(
            count(lit(1)).as("n_variants"),
            countDistinct(col("url")).as("n_raw_forms"),
            min(col("doc_id")).as("canonical_id"))
          .orderBy(col("canonical"))
      },
      Some("""WITH u AS (
                SELECT doc_id,
                  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
                  (CASE WHEN doc_id % 3 = 0 THEN 'Example.COM' ELSE 'example.com' END) ||
                  '/p/' || CAST(doc_id % 50 AS VARCHAR) ||
                  (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&b=2&a=1'
                        WHEN doc_id % 4 = 1 THEN '?a=1&b=2' ELSE '' END) ||
                  (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url
                FROM documents
              ),
              q AS (
                SELECT doc_id, url,
                  COALESCE(array_to_string(list_sort(list_filter(
                    string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
                    p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&'), '') AS q2
                FROM u
              ),
              c AS (
                SELECT doc_id, url,
                  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://' ||
                  lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) ||
                  (CASE WHEN regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) = ''
                        THEN '/' ELSE regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) END) ||
                  (CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END) AS canonical
                FROM q
              )
              SELECT canonical, COUNT(*) AS n_variants,
                CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_forms,
                CAST(MIN(doc_id) AS BIGINT) AS canonical_id
              FROM c GROUP BY canonical ORDER BY canonical""")),

    // Code-vs-prose routing signals (code-corpus curation's first
    // pass): symbol density, indented-line ratio, programming-keyword
    // hits — all row-local codegen. Injected code-bearing docs must
    // flag; the plain prose corpus must not.
    QueryDef(
      "l_code_filter",
      (s, d) => {
        val docs = t(s, d, "documents")
        val snippet = "import os\ndef main():\n    return compute(x=1);\n" +
          "  const y = foo(bar);\n    public int z = 2;\n"
        val code = docs.filter(col("doc_id") % 10 === 0).select(
          (col("doc_id") + 80000).as("doc_id"),
          concat(lit(snippet), col("text")).as("text"))
        docs.select(col("doc_id"), col("text")).unionByName(code)
          .select(col("doc_id"), Curation.codeSignals(col("text")).as("cs"))
          .select(col("doc_id"),
            col("cs.symbol_ratio").as("symbol_ratio"),
            col("cs.indent_ratio").as("indent_ratio"),
            col("cs.keyword_hits").as("keyword_hits"),
            col("cs.looks_code").as("looks_code"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 80000,
                  'import os' || chr(10) || 'def main():' || chr(10) ||
                  repeat(' ', 4) || 'return compute(x=1);' || chr(10) ||
                  repeat(' ', 2) || 'const y = foo(bar);' || chr(10) ||
                  repeat(' ', 4) || 'public int z = 2;' || chr(10) || text
                FROM documents WHERE doc_id % 10 = 0
              ),
              sig AS (
                SELECT doc_id,
                  CAST(length(text) - length(regexp_replace(text, '[{}()\[\];=<>]', '', 'g')) AS DOUBLE)
                    / GREATEST(length(text), 1) AS symbol_ratio,
                  CAST(len(list_filter(string_split(text, chr(10)),
                    l -> regexp_matches(l, '^[ \t]{2,}'))) AS DOUBLE)
                    / GREATEST(len(string_split(text, chr(10))), 1) AS indent_ratio,
                  CAST(len(list_filter(
                    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                    t -> list_contains(['def','class','import','return','void','int','const','function','var','public'], t))) AS INT) AS keyword_hits
                FROM corpus
              )
              SELECT doc_id, symbol_ratio, indent_ratio, keyword_hits,
                (symbol_ratio > 0.05e0 OR
                 (keyword_hits >= 2 AND indent_ratio > 0.3e0)) AS looks_code
              FROM sig ORDER BY doc_id""")),

    // Quality scoring: length / stopword / punctuation / word-length
    // composite, 0-100.
    QueryDef(
      "l_quality_score",
      (s, d) =>
        t(s, d, "documents")
          .select(
            col("doc_id"),
            TextAnalysis.qualityScore(
              col("text"), TextAnalysis.StopwordProfiles.head._2).as("quality"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
              ROUND(100.0e0 * (
                LEAST(CAST(LENGTH(text) AS DOUBLE) / 500.0e0, 1.0e0) * 0.3e0 +
                LEAST(CAST(len(list_filter(string_split(trim(text), ' '), t -> list_contains(['the','a','of','and','to','in','is','it','that','was'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(text), ' ')), 0) * 5.0e0, 1.0e0) * 0.3e0 +
                (1.0e0 - LEAST(CAST(len(regexp_extract_all(text, '[^\p{L}\p{N}\s]')) AS DOUBLE) / NULLIF(LENGTH(text), 0) * 5.0e0, 1.0e0)) * 0.2e0 +
                (CASE WHEN CAST(LENGTH(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / NULLIF(len(string_split(trim(text), ' ')), 0) BETWEEN 3.0e0 AND 10.0e0 THEN 1.0e0
                      WHEN CAST(LENGTH(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / NULLIF(len(string_split(trim(text), ' ')), 0) IS NULL THEN 0.0e0
                      ELSE 0.5e0 END) * 0.2e0
              ), 2) AS quality
              FROM documents ORDER BY doc_id""")),

    // Token counting: whitespace tokens + BPE-ish pre-tokenizer count.
    // Repetition filters (Gopher/C4-style): duplicate-line counts and
    // dominant-token fraction per doc, rolled up per source. All
    // cross-engine aggregation is over INTEGERS (ratios come from one
    // final division of exact sums), so floats never accumulate in
    // engine-dependent order.
    QueryDef(
      "l_repetition",
      (s, d) => {
        val toks = TextAnalysis.tokens(col("text"))
        val lines = split(col("text"), "\n")
        t(s, d, "documents")
          .select(col("source"),
            size(array_distinct(lines)).cast(LongType).as("dl"),
            size(lines).cast(LongType).as("nl"),
            graft.functions.F.maxTokenFreq(toks).cast(LongType).as("mc"),
            size(toks).cast(LongType).as("nt"))
          .groupBy(col("source"))
          .agg(
            (lit(1.0) - sum(col("dl")).cast(DoubleType) /
              sum(col("nl")).cast(DoubleType)).as("dup_line_frac"),
            (sum(col("mc")).cast(DoubleType) /
              sum(col("nt")).cast(DoubleType)).as("dominant_token_frac"),
            count(when(col("mc") * 5 > col("nt"), 1)).as("n_repetitive"),
            count(lit(1)).as("n_docs"))
          .orderBy(col("source"))
      },
      Some("""WITH freq AS (
                SELECT doc_id, MAX(c) AS mc, CAST(SUM(c) AS BIGINT) AS nt FROM (
                  SELECT doc_id, tk, COUNT(*) AS c FROM (
                    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tk
                    FROM documents
                  ) GROUP BY doc_id, tk
                ) GROUP BY doc_id
              ),
              per_doc AS (
                SELECT d.source,
                CAST(LEN(LIST_DISTINCT(string_split(d.text, chr(10)))) AS BIGINT) AS dl,
                CAST(LEN(string_split(d.text, chr(10))) AS BIGINT) AS nl,
                f.mc, f.nt
                FROM documents d JOIN freq f ON d.doc_id = f.doc_id
              )
              SELECT source,
              1.0e0 - CAST(SUM(dl) AS DOUBLE) / CAST(SUM(nl) AS DOUBLE) AS dup_line_frac,
              CAST(SUM(mc) AS DOUBLE) / CAST(SUM(nt) AS DOUBLE) AS dominant_token_frac,
              COUNT(CASE WHEN mc * 5 > nt THEN 1 END) AS n_repetitive,
              COUNT(*) AS n_docs
              FROM per_doc GROUP BY source ORDER BY source""")),

    QueryDef(
      "l_token_counts",
      (s, d) =>
        t(s, d, "documents")
          .select(
            col("doc_id"),
            TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
            TextAnalysis.bpeTokenCount(col("text")).cast(IntegerType).as("bpe_tokens"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
              CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS ws_tokens,
              CAST(len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]')) AS INTEGER) AS bpe_tokens
              FROM documents ORDER BY doc_id""")),

    // Winnowing (rolling-hash) fingerprint overlap: near-dup copies share
    // nearly all local fingerprints. The fingerprints are hash-scheme-
    // specific → the postings are materialized and the oracle recomputes
    // the posting-list join + threshold from them; LlmSpec pins the
    // winnowing substring guarantee itself.
    QueryDef(
      "l_winnow_overlap",
      (s, d) => {
        val postings = materialize(
          Dedup.winnowPostings(
            docsWithNearDups(s, d).filter(col("doc_id") % 20000 < 500),
            // dfCap: boilerplate passages shared by thousands of docs fan
            // out f² pairs on their fingerprints — the scale-stress run
            // (hot phrase in 30% of docs) goes superlinear without it.
            // No-op at gate scale (the slice has no fingerprint this hot),
            // and the oracle derives from the capped postings either way.
            "doc_id", "text", k = 8, w = 4, dfCap = Some(500L)),
          "winnow_postings")
        Dedup.overlapFromPostings(postings, minShared = 5)
      },
      Some(s"""WITH p AS (SELECT id, fp
                 FROM read_parquet('$OracleScratch/winnow_postings/*.parquet'))
               SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS shared_fingerprints
               FROM p a JOIN p b ON a.fp = b.fp AND a.id < b.id
               GROUP BY a.id, b.id HAVING COUNT(*) >= 5""")),

    // Token-window chunking (training-sequence prep): 32-token chunks,
    // stride 24 (8-token overlap). Chunk text is compared via md5 so the
    // gate pins exact content, not just shapes.
    QueryDef(
      "l_chunking",
      (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"),
            explode(TextAnalysis.tokenChunks(col("text"), chunkSize = 32, stride = 24))
              .as("chunk"))
          .select(
            col("doc_id"),
            col("chunk.chunk_idx").as("chunk_idx"),
            col("chunk.start_token").as("start_token"),
            col("chunk.n_tokens").as("n_tokens"),
            md5(col("chunk.chunk_text")).as("chunk_md5")),
      Some("""WITH t AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents WHERE LENGTH(trim(text)) > 0
              ),
              c AS (
                SELECT doc_id, toks, len(toks) AS n,
                CASE WHEN len(toks) <= 32 THEN 1
                     ELSE CAST(CEIL((len(toks) - 32) / 24.0) AS INTEGER) + 1 END AS nc
                FROM t
              ),
              x AS (
                SELECT doc_id, UNNEST(list_transform(range(0, nc), i -> struct_pack(
                  chunk_idx := CAST(i AS INTEGER),
                  start_token := CAST(i * 24 AS INTEGER),
                  n_tokens := CAST(LEAST(32, n - i * 24) AS INTEGER),
                  chunk_md5 := md5(array_to_string(toks[i * 24 + 1 : i * 24 + 32], ' '))
                ))) AS u
                FROM c
              )
              SELECT doc_id, u.chunk_idx AS chunk_idx, u.start_token AS start_token,
              u.n_tokens AS n_tokens, u.chunk_md5 AS chunk_md5 FROM x""")),

    // PII scrubbing: deterministic synthetic PII (email / E.164 phone /
    // IPv4) appended per doc, then counted and replaced with typed
    // placeholders. Both engines run the same RE2-compatible patterns.
    QueryDef(
      "l_pii_scrub",
      (s, d) => {
        val withPii = t(s, d, "documents")
          .withColumn("text2", concat(
            col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com tel +2782"),
            col("doc_id") + 1000000, lit(" host 10.0."), col("doc_id") % 256,
            lit(".7")))
        val counts = TextAnalysis.piiCounts(col("text2"))
        withPii.select(
          col("doc_id"),
          counts.getField("n_emails").as("n_emails"),
          counts.getField("n_phones").as("n_phones"),
          counts.getField("n_ips").as("n_ips"),
          md5(TextAnalysis.scrubPii(col("text2"))).as("scrubbed_md5"))
      },
      Some("""WITH p AS (
                SELECT doc_id,
                text || ' contact user' || CAST(doc_id AS VARCHAR) ||
                '@example.com tel +2782' || CAST(doc_id + 1000000 AS VARCHAR) ||
                ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS text2
                FROM documents
              )
              SELECT doc_id,
              CAST(len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
              CAST(len(regexp_extract_all(text2, '\+[0-9]{8,14}')) AS INTEGER) AS n_phones,
              CAST(len(regexp_extract_all(text2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS INTEGER) AS n_ips,
              md5(regexp_replace(regexp_replace(regexp_replace(text2,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\+[0-9]{8,14}', '<PHONE>', 'g'),
                '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')) AS scrubbed_md5
              FROM p""")),

    // Passage-level exact dedup (C4-style boilerplate detection): lines
    // shared across >= 2 docs by normalized-md5 fingerprint. The injected
    // exact copies guarantee every long line is cross-doc duplicated.
    QueryDef(
      "l_passage_dedup",
      (s, d) =>
        Dedup.passageDuplicates(docsWithDups(s, d), "doc_id", "text",
          minChars = 20, minDocs = 2),
      Some("""WITH docs AS (
                SELECT doc_id, text FROM documents
                UNION ALL SELECT doc_id + 10000, text FROM documents
              ),
              lines AS (
                SELECT doc_id AS id, UNNEST(string_split(text, chr(10))) AS line
                FROM docs
              ),
              norm AS (
                SELECT id, trim(regexp_replace(lower(line), '\s+', ' ', 'g')) AS nline
                FROM lines
              )
              SELECT md5(nline) AS passage_fp,
              COUNT(DISTINCT id) AS n_docs, COUNT(*) AS n_occurrences
              FROM norm WHERE LENGTH(nline) >= 20
              GROUP BY 1 HAVING COUNT(DISTINCT id) >= 2""")),

    // C4-style line filter (codegen kernel): drop lines with < 3 tokens,
    // pin the kept-line count and the exact cleaned text via md5.
    QueryDef(
      "l_line_filter",
      (s, d) => {
        val cleaned = TextAnalysis.cleanLines(col("text"), minWords = 3)
        t(s, d, "documents")
          .select(
            col("doc_id"),
            size(split(col("text"), "\n")).as("n_lines"),
            when(length(cleaned) === 0, 0)
              .otherwise(size(split(cleaned, "\n"))).as("n_kept"),
            md5(cleaned).as("cleaned_md5"))
      },
      Some("""WITH k AS (
                SELECT doc_id,
                CAST(len(string_split(text, chr(10))) AS INTEGER) AS n_lines,
                list_filter(string_split(text, chr(10)),
                  l -> CASE WHEN trim(l) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(l), '\s+')) END >= 3) AS kept
                FROM documents
              )
              SELECT doc_id, n_lines,
              CAST(len(kept) AS INTEGER) AS n_kept,
              md5(array_to_string(kept, chr(10))) AS cleaned_md5
              FROM k""")),

    // Document fingerprinting: md5-of-normalized keys per source.
    QueryDef(
      "l_fingerprint",
      (s, d) =>
        t(s, d, "documents")
          .groupBy(col("source"))
          .agg(
            countDistinct(TextAnalysis.fingerprint(col("text"))).as("distinct_fps"),
            count(lit(1)).as("n"))
          .orderBy(col("source")),
      Some("""SELECT source,
              COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS distinct_fps,
              COUNT(*) AS n
              FROM documents GROUP BY source ORDER BY source""")),

    // Multimodal pipeline: binary payloads + typed metadata → stub decode
    // (mapPartitions) → video frame sampling → rollup. The checksum/
    // feature columns are stub-derived (spec-checked); the oracle pins the
    // schema-level plumbing: modalities, byte counts, frame fan-out.
    QueryDef(
      "l_multimodal_pipeline",
      (s, d) => {
        val media = Multimodal.fromDocuments(t(s, d, "documents"), "doc_id", "text")
        // batched contract (vectorized-codec shape); value-identical to
        // the per-row decodeStub — LlmSpec pins that equivalence
        val decoded = Multimodal.decodeBatched(media, batchSize = 32)
        Multimodal.sampleFrames(decoded, frameIntervalMs = 1000L)
          .groupBy(col("modality"))
          .agg(
            countDistinct(col("media_id")).as("n_media"),
            count(lit(1)).as("n_frames"),
            sum(col("n_bytes")).as("total_bytes"),
            sum(col("frame_ts_ms")).as("sum_frame_ts"))
          .orderBy(col("modality"))
      },
      Some("""WITH media AS (
                SELECT doc_id AS media_id,
                (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS modality,
                LENGTH(text) AS n_bytes,
                LENGTH(text) * 40 AS duration_ms
                FROM documents
              ),
              frames AS (
                SELECT media_id, modality, n_bytes,
                UNNEST(CASE WHEN modality = 'video'
                  THEN range(0, GREATEST(CAST(duration_ms // 1000 AS INTEGER), 1))
                  ELSE [0] END) AS frame_idx
                FROM media
              )
              SELECT modality,
              COUNT(DISTINCT media_id) AS n_media,
              COUNT(*) AS n_frames,
              CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
              CAST(SUM(frame_idx * 1000) AS BIGINT) AS sum_frame_ts
              FROM frames GROUP BY modality ORDER BY modality""")),

    // REAL media decode (no stub): deterministic P6 PPM / PCM-16 WAV
    // payloads are byte-encoded for a bounded id set (closed-form pixels
    // and samples), decoded in Spark by the pure-JVM CodecBatchDecoder
    // through the batched mapPartitions contract, and the extracted
    // features (dimensions, per-channel means, sample rate, RMS, peak,
    // duration) are pinned numerically by the oracle recomputing the
    // same closed forms. The one collect() is the ≤200-row fixture.
    QueryDef(
      "l_multimodal_decode",
      (s, d) => {
        import s.implicits._
        val ids = t(s, d, "documents")
          .filter(col("doc_id") % 5 === 0 && col("doc_id") < 1000)
          .select(col("doc_id").cast(LongType)).as[Long].collect().sorted
        val rows = ids.toSeq.map { id =>
          val content: Array[Byte] =
            if (id % 2 == 0) {
              val w = (id % 8 + 2).toInt; val h = (id % 6 + 2).toInt
              MediaCodecs.encodePpm(w, h, (_, _) =>
                ((id % 256).toInt, (2 * id % 256).toInt, (3 * id % 256).toInt))
            } else {
              val nSamples = (id % 50 + 10).toInt
              val a = (id * 37 % 1000).toShort
              MediaCodecs.encodeWavPcm16(8000, 1,
                Array.tabulate(nSamples)(i => if (i % 2 == 0) a else (-a).toShort))
            }
          (id, if (id % 2 == 0) "image" else "audio", content)
        }
        val media = rows.toDF("media_id", "modality", "content")
          .select(col("media_id"), col("modality"), col("content"),
            struct(
              col("modality").as("format"),
              lit(null).cast(IntegerType).as("width"),
              lit(null).cast(IntegerType).as("height"),
              lit(null).cast(LongType).as("duration_ms")).as("meta"))
        val feats = (0 to 5).map(i =>
          element_at(col("features"), i + 1).cast(DoubleType).as(s"f$i"))
        Multimodal.decodeBatched(media, batchSize = 32,
            () => new MediaCodecs.CodecBatchDecoder(strict = true))
          .select(Seq(col("media_id"), col("modality")) ++ feats: _*)
          .orderBy(col("media_id"))
      },
      Some("""SELECT doc_id AS media_id,
              CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
              CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 8 + 2 ELSE 8000 END AS DOUBLE) AS f0,
              CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 6 + 2 ELSE 1 END AS DOUBLE) AS f1,
              CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 256 ELSE doc_id % 50 + 10 END AS DOUBLE) AS f2,
              CAST(CASE WHEN doc_id % 2 = 0 THEN (2*doc_id) % 256 ELSE (doc_id*37) % 1000 END AS DOUBLE) AS f3,
              CAST(CASE WHEN doc_id % 2 = 0 THEN (3*doc_id) % 256 ELSE (doc_id*37) % 1000 END AS DOUBLE) AS f4,
              CAST(CASE WHEN doc_id % 2 = 0
                   THEN doc_id % 256 + (2*doc_id) % 256 + (3*doc_id) % 256
                   ELSE ((doc_id % 50 + 10) * 1000) // 8000 END AS DOUBLE) AS f5
              FROM documents WHERE doc_id % 5 = 0 AND doc_id < 1000
              ORDER BY media_id""")),

    // URL extraction + domain blocklist over planted links (same
    // plant-then-verify pattern as l_pii_scrub); both engines run the
    // identical RE2-compatible patterns.
    QueryDef(
      "l_url_blocklist",
      (s, d) => {
        val withUrls = t(s, d, "documents").withColumn("text2", concat(
          col("text"), lit(" see https://ex"), col("doc_id") % 5,
          lit(".com/p/"), col("doc_id"),
          when(col("doc_id") % 7 === 0, lit(" and http://mirror.net/x"))
            .otherwise(lit(""))))
        withUrls.select(
            col("doc_id"),
            TextAnalysis.urlCount(col("text2")).as("n_urls"),
            array_join(TextAnalysis.urlDomains(col("text2")), ",").as("domains"),
            Curation.hasBlockedDomain(col("text2"), Seq("ex0.com", "ex3.com"))
              .as("blocked"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH p AS (
                SELECT doc_id,
                  text || ' see https://ex' || CAST(doc_id % 5 AS VARCHAR) ||
                  '.com/p/' || CAST(doc_id AS VARCHAR) ||
                  CASE WHEN doc_id % 7 = 0 THEN ' and http://mirror.net/x' ELSE '' END AS text2
                FROM documents
              )
              SELECT doc_id,
                CAST(len(regexp_extract_all(text2, 'https?://[A-Za-z0-9.-]+(/[^ \t\n]*)?')) AS INTEGER) AS n_urls,
                array_to_string(regexp_extract_all(text2, 'https?://([A-Za-z0-9.-]+)', 1), ',') AS domains,
                list_has_any(regexp_extract_all(text2, 'https?://([A-Za-z0-9.-]+)', 1),
                  ['ex0.com', 'ex3.com']) AS blocked
              FROM p ORDER BY doc_id""")),

    // Sentence stats via terminal-punctuation COUNTING (splitting needs
    // lookbehind, which RE2 lacks — counts are the portable contract).
    QueryDef(
      "l_sentence_stats",
      (s, d) => {
        val withS = t(s, d, "documents").withColumn("text2",
          concat(col("text"),
            when(col("doc_id") % 3 === 1, lit(". One more! Done")).otherwise(lit("")),
            lit(".")))
        withS.select(
            col("doc_id"),
            TextAnalysis.sentenceCount(col("text2")).as("n_sentences"),
            (TextAnalysis.tokenCount(col("text2")).cast(DoubleType) /
              nullif(TextAnalysis.sentenceCount(col("text2")), lit(0))
                .cast(DoubleType)).as("words_per_sentence"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH p AS (
                SELECT doc_id,
                  text || CASE WHEN doc_id % 3 = 1 THEN '. One more! Done' ELSE '' END
                  || '.' AS text2
                FROM documents
              )
              SELECT doc_id,
                CAST(len(regexp_extract_all(text2, '[.!?]+([ \t\n]|$)')) AS INTEGER) AS n_sentences,
                CAST(len(string_split(trim(text2), ' ')) AS DOUBLE) /
                  CAST(NULLIF(len(regexp_extract_all(text2, '[.!?]+([ \t\n]|$)')), 0) AS DOUBLE)
                  AS words_per_sentence
              FROM p ORDER BY doc_id""")),

    // Per-doc TF-IDF top terms (raw-idf variant — exact-rational score,
    // see TextAnalysis.tfidfTopTerms): partitioned-window top-k.
    QueryDef(
      "l_tfidf_topk",
      (s, d) => TextAnalysis.tfidfTopTerms(t(s, d, "documents"), "doc_id", "text",
          topK = 5)
        .orderBy(col("doc_id"), col("rank")),
      Some("""WITH tk AS (
                SELECT doc_id,
                  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
                FROM documents
              ),
              tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tk
                     WHERE len(token) > 0 GROUP BY doc_id, token),
              dft AS (SELECT token, COUNT(*) AS df_t FROM tf GROUP BY token),
              n AS (SELECT COUNT(*) AS n_docs FROM documents),
              s AS (SELECT tf.doc_id, tf.token, tf.tf, dft.df_t,
                           (tf.tf * n.n_docs) / dft.df_t AS score
                    FROM tf JOIN dft ON tf.token = dft.token, n),
              r AS (SELECT *, CAST(ROW_NUMBER() OVER (
                      PARTITION BY doc_id ORDER BY score DESC, token ASC)
                      AS INTEGER) AS rank
                    FROM s)
              SELECT doc_id, token, tf, df_t, score, rank
              FROM r WHERE rank <= 5 ORDER BY doc_id, rank""")),

    // BM25 top-k retrieval (inverted-index posting join): a 3-query
    // batch broadcasts its (query, term, qtf) table into the postings
    // scan, contributions use the raw Robertson idf ratio and the
    // standard tf saturation (pinned IEEE expression tree), per-(query,
    // doc) sums decimal-accumulate, and the top-k cut is the bounded
    // heap aggregate — never a per-query window sort. The oracle
    // recomputes the whole thing, ranking by the exact decimal score.
    QueryDef(
      "l_bm25_topk",
      (s, d) => {
        import s.implicits._
        val qs = Seq(
          (1, "spark table join"),
          (2, "fast key scan value"),
          (3, "slow vector group")).toDF("query_id", "qtext")
        val (idx, st) = cachedIndex(s, d)
        Retrieval.bm25TopK(idx, st, qs, "query_id", "qtext", k = 10)
      },
      Some(raw"""WITH q AS (
                SELECT * FROM (VALUES
                  (1, 'spark table join'),
                  (2, 'fast key scan value'),
                  (3, 'slow vector group')) AS v(query_id, qtext)
              ),
              tk AS (
                SELECT doc_id,
                  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
                FROM documents
              ),
              tf AS (SELECT doc_id, token, COUNT(*) AS tf
                     FROM tk WHERE len(token) > 0 GROUP BY doc_id, token),
              dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
                     FROM tf GROUP BY doc_id),
              dft AS (SELECT token, COUNT(*) AS df_t FROM tf GROUP BY token),
              st AS (SELECT COUNT(*) AS n_docs,
                            CAST(SUM(dl) AS BIGINT) AS total_len FROM dl),
              qt AS (
                SELECT query_id, token, COUNT(*) AS qtf
                FROM (SELECT query_id,
                        unnest(string_split(trim(regexp_replace(lower(qtext), '\s+', ' ', 'g')), ' ')) AS token
                      FROM q)
                WHERE len(token) > 0 GROUP BY query_id, token
              ),
              c AS (
                SELECT qt.query_id, tf.doc_id,
                  CAST(qt.qtf AS DOUBLE)
                    * ((st.n_docs - dft.df_t + 0.5e0) / (dft.df_t + 0.5e0))
                    * ((tf.tf * (1.2e0 + 1e0)) /
                       (tf.tf + 1.2e0 * (1e0 - 0.75e0 + 0.75e0 *
                         (CAST(dl.dl * st.n_docs AS DOUBLE) / st.total_len))))
                    AS contrib
                FROM qt
                JOIN tf USING (token)
                JOIN dl USING (doc_id)
                JOIN dft USING (token)
                CROSS JOIN st
              ),
              sc AS (SELECT query_id, doc_id,
                            SUM(CAST(contrib AS DECIMAL(38,12))) AS sd
                     FROM c GROUP BY query_id, doc_id),
              r AS (SELECT query_id, doc_id, sd,
                      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY sd DESC, doc_id DESC) AS INTEGER) AS rank
                    FROM sc)
              SELECT query_id, rank, doc_id, CAST(sd AS DOUBLE) AS score
              FROM r WHERE rank <= 10 ORDER BY query_id, rank""")),

    // Token-budget corpus selection ("train on the best N tokens"):
    // whole quality levels descend until one doesn't fit, the boundary
    // level splits by a 256-way id-hash sub-bucket prefix — two bounded
    // histograms to the driver + one row-local filter, NO global sort.
    QueryDef(
      "l_budget_select",
      (s, d) =>
        Curation.selectToBudget(
          t(s, d, "documents").withColumn("qlevel", expr("n_chars DIV 50")),
          "doc_id", "text", "qlevel", budgetTokens = 6000L)
          .orderBy(col("doc_id")),
      Some("""WITH b AS (
                SELECT doc_id, n_chars // 50 AS quality,
                  CAST(len(string_split(trim(text), ' ')) AS BIGINT)
                    AS n_tokens,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 256 AS sub
                FROM documents
              ),
              h AS (SELECT quality, SUM(n_tokens) AS tok
                    FROM b GROUP BY quality),
              hc AS (SELECT quality,
                       SUM(tok) OVER (ORDER BY quality DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS cum
                     FROM h),
              fs AS (SELECT
                       MIN(CASE WHEN cum <= 6000 THEN quality END) AS mq,
                       COALESCE(MAX(CASE WHEN cum <= 6000 THEN cum END), 0)
                         AS used,
                       MAX(CASE WHEN cum > 6000 THEN quality END) AS qb
                     FROM hc),
              sh AS (SELECT b.sub, SUM(b.n_tokens) AS tok
                     FROM b, fs WHERE b.quality = fs.qb GROUP BY b.sub),
              shc AS (SELECT sub,
                        SUM(tok) OVER (ORDER BY sub ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS cum
                      FROM sh),
              sc AS (SELECT MAX(CASE WHEN shc.cum <= 6000 - fs.used
                       THEN shc.sub END) AS ms
                     FROM shc, fs)
              SELECT b.doc_id, b.quality, b.n_tokens
              FROM b, fs, sc
              WHERE (fs.mq IS NOT NULL AND b.quality >= fs.mq)
                 OR (fs.qb IS NOT NULL AND b.quality = fs.qb
                     AND sc.ms IS NOT NULL AND b.sub <= sc.ms)
              ORDER BY b.doc_id""")),

    // Preference pairs for reward-model / DPO training: per source, the
    // top-k docs by the weak signal (length) pair with the bottom-k,
    // keeping wide-margin pairs — one grouped aggregate with two
    // bounded heaps, never a per-group sort.
    QueryDef(
      "l_preference_pairs",
      (s, d) =>
        Curation.preferencePairs(t(s, d, "documents"),
          "doc_id", "n_chars", "source", k = 3, minGap = 10L),
      Some("""WITH s AS (
                SELECT source AS grp, doc_id AS id, n_chars AS score
                FROM documents
              ),
              tp AS (SELECT grp, id, score,
                       CAST(ROW_NUMBER() OVER (PARTITION BY grp
                         ORDER BY score DESC, id DESC) AS INT) AS r
                     FROM s),
              bt AS (SELECT grp, id, score,
                       CAST(ROW_NUMBER() OVER (PARTITION BY grp
                         ORDER BY score ASC, id DESC) AS INT) AS r
                     FROM s)
              SELECT tp.grp AS source, tp.r AS pair_rank,
                tp.id AS chosen_id, tp.score AS chosen_score,
                bt.id AS rejected_id, bt.score AS rejected_score
              FROM tp JOIN bt ON tp.grp = bt.grp AND tp.r = bt.r
              WHERE tp.r <= 3 AND tp.id <> bt.id
                AND tp.score - bt.score >= 10
              ORDER BY source, pair_rank""")),

    // TRAINED quality classifier (the fastText-shaped filter's training
    // half): batch perceptron over hashed bag-of-words — integer counts,
    // unit learning rate, so training itself is exact integer arithmetic
    // and the DuckDB oracle retrains the SAME model by unrolling the
    // three epochs. Train on the hash-split half, classify the rest.
    QueryDef(
      "l_perceptron",
      (s, d) => {
        val docs = t(s, d, "documents")
        val toksC = TextAnalysis.tokens(TextAnalysis.normalize(col("text")))
        val y = when(array_contains(toksC, "spark"), 1L).otherwise(-1L)
        val h = Curation.hashBucket(col("doc_id")) % 2
        val w = Curation.perceptronTrain(
          docs.filter(h === 0).withColumn("y", y),
          "doc_id", "text", "y", dim = 64, epochs = 3)
        docs.filter(h =!= 0)
          .select(col("doc_id"),
            Curation.perceptronMargin(col("text"), w).as("margin"),
            y.as("actual"))
          .withColumn("predicted",
            when(col("margin") > 0, 1L).otherwise(-1L))
          .withColumn("correct", col("predicted") === col("actual"))
          .select(col("doc_id"), col("margin"), col("predicted"),
            col("actual"), col("correct"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""WITH hb AS (
                SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 2 AS h
                FROM documents
              ),
              lab AS (
                SELECT doc_id, toks, h,
                  CAST(CASE WHEN list_contains(toks, 'spark')
                       THEN 1 ELSE -1 END AS BIGINT) AS y
                FROM hb
              ),
              f AS (
                SELECT doc_id, y,
                  CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) % 64 AS b,
                  COUNT(*) AS cnt
                FROM (SELECT doc_id, y, unnest(toks) AS tok
                      FROM lab WHERE h = 0)
                WHERE len(tok) > 0 GROUP BY doc_id, y, b
              ),
              w1 AS (SELECT b, CAST(SUM(y * cnt) AS BIGINT) AS w
                     FROM f GROUP BY b),
              m2 AS (SELECT f.doc_id, f.y,
                       SUM(f.cnt * COALESCE(w1.w, 0)) AS margin
                     FROM f LEFT JOIN w1 USING (b) GROUP BY f.doc_id, f.y),
              g2 AS (SELECT f.b, CAST(SUM(f.y * f.cnt) AS BIGINT) AS g
                     FROM f JOIN m2 USING (doc_id)
                     WHERE m2.y * m2.margin <= 0 GROUP BY f.b),
              w2 AS (SELECT COALESCE(w1.b, g2.b) AS b,
                       COALESCE(w1.w, 0) + COALESCE(g2.g, 0) AS w
                     FROM w1 FULL OUTER JOIN g2 ON w1.b = g2.b),
              m3 AS (SELECT f.doc_id, f.y,
                       SUM(f.cnt * COALESCE(w2.w, 0)) AS margin
                     FROM f LEFT JOIN w2 ON w2.b = f.b
                     GROUP BY f.doc_id, f.y),
              g3 AS (SELECT f.b, CAST(SUM(f.y * f.cnt) AS BIGINT) AS g
                     FROM f JOIN m3 USING (doc_id)
                     WHERE m3.y * m3.margin <= 0 GROUP BY f.b),
              w3 AS (SELECT COALESCE(w2.b, g3.b) AS b,
                       COALESCE(w2.w, 0) + COALESCE(g3.g, 0) AS w
                     FROM w2 FULL OUTER JOIN g3 ON w2.b = g3.b),
              tst AS (SELECT doc_id, toks, y FROM lab WHERE h <> 0),
              tf2 AS (
                SELECT doc_id,
                  CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) % 64 AS b,
                  COUNT(*) AS cnt
                FROM (SELECT doc_id, unnest(toks) AS tok FROM tst)
                WHERE len(tok) > 0 GROUP BY doc_id, b
              ),
              tm AS (
                SELECT t.doc_id,
                  CAST(COALESCE(SUM(tf2.cnt * COALESCE(w3.w, 0)), 0)
                    AS BIGINT) AS margin
                FROM tst t
                LEFT JOIN tf2 ON tf2.doc_id = t.doc_id
                LEFT JOIN w3 ON w3.b = tf2.b
                GROUP BY t.doc_id
              )
              SELECT tm.doc_id, tm.margin,
                CAST(CASE WHEN tm.margin > 0 THEN 1 ELSE -1 END AS BIGINT)
                  AS predicted,
                t.y AS actual,
                (CASE WHEN tm.margin > 0 THEN 1 ELSE -1 END) = t.y
                  AS correct
              FROM tm JOIN tst t USING (doc_id)
              ORDER BY tm.doc_id""")),

    // Retriever-training triples (the DPR construction): per (query,
    // positive) pair, the top BM25 candidates that are NOT relevant
    // become hard negatives — lexically confusable, semantically wrong.
    // One bounded-heap recall, one keyed anti-join, a bounded re-rank.
    QueryDef(
      "l_training_triples",
      (s, d) => {
        import s.implicits._
        val qs = Seq(
          (1, "spark table join"),
          (2, "fast key scan value"),
          (3, "slow vector group")).toDF("query_id", "qtext")
        val vecs = t(s, d, "embeddings")
        val truth = vecs.filter(col("vec_id").isin(1L, 2L, 3L))
          .select(col("vec_id").cast(IntegerType).as("query_id"),
            col("label").as("qlabel"))
          .join(vecs.select(col("vec_id").as("doc_id"), col("label")),
            col("qlabel") === col("label"))
          .select(col("query_id"), col("doc_id"))
        val (idx, st) = cachedIndex(s, d)
        Retrieval.trainingTriples(idx, st,
          qs, "query_id", "qtext", truth,
          negPerQuery = 3, recallN = 50)
      },
      Some(raw"""WITH q AS (
                SELECT * FROM (VALUES
                  (1, 'spark table join'),
                  (2, 'fast key scan value'),
                  (3, 'slow vector group')) AS v(query_id, qtext)
              ),
              tk AS (
                SELECT doc_id,
                  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
                FROM documents
              ),
              tf AS (SELECT doc_id, token, COUNT(*) AS tf
                     FROM tk WHERE len(token) > 0 GROUP BY doc_id, token),
              dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
                     FROM tf GROUP BY doc_id),
              dft AS (SELECT token, COUNT(*) AS df_t FROM tf GROUP BY token),
              st AS (SELECT COUNT(*) AS n_docs,
                            CAST(SUM(dl) AS BIGINT) AS total_len FROM dl),
              qt AS (
                SELECT query_id, token, COUNT(*) AS qtf
                FROM (SELECT query_id,
                        unnest(string_split(trim(regexp_replace(lower(qtext), '\s+', ' ', 'g')), ' ')) AS token
                      FROM q)
                WHERE len(token) > 0 GROUP BY query_id, token
              ),
              c AS (
                SELECT qt.query_id, tf.doc_id,
                  CAST(qt.qtf AS DOUBLE)
                    * ((st.n_docs - dft.df_t + 0.5e0) / (dft.df_t + 0.5e0))
                    * ((tf.tf * (1.2e0 + 1e0)) /
                       (tf.tf + 1.2e0 * (1e0 - 0.75e0 + 0.75e0 *
                         (CAST(dl.dl * st.n_docs AS DOUBLE) / st.total_len))))
                    AS contrib
                FROM qt
                JOIN tf USING (token)
                JOIN dl USING (doc_id)
                JOIN dft USING (token)
                CROSS JOIN st
              ),
              sc AS (SELECT query_id, doc_id,
                            SUM(CAST(contrib AS DECIMAL(38,12))) AS sd
                     FROM c GROUP BY query_id, doc_id),
              recall AS (SELECT query_id, doc_id,
                      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY sd DESC, doc_id DESC) AS INTEGER)
                        AS bm25_rank
                    FROM sc QUALIFY bm25_rank <= 50),
              tr AS (
                SELECT DISTINCT CAST(e.vec_id AS INTEGER) AS query_id,
                  c2.vec_id AS doc_id
                FROM embeddings e JOIN embeddings c2 ON e.label = c2.label
                WHERE e.vec_id IN (1, 2, 3)
              ),
              negs AS (
                SELECT query_id, doc_id AS neg_doc_id, bm25_rank,
                  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY bm25_rank) AS INTEGER) AS neg_rank
                FROM recall r
                WHERE NOT EXISTS (SELECT 1 FROM tr
                  WHERE tr.query_id = r.query_id AND tr.doc_id = r.doc_id)
                QUALIFY neg_rank <= 3
              )
              SELECT tr.query_id, tr.doc_id AS pos_doc_id, n.neg_doc_id,
                n.neg_rank, n.bm25_rank
              FROM tr JOIN negs n USING (query_id)
              ORDER BY tr.query_id, pos_doc_id, n.neg_rank""")),

    // Distributed retrieval-quality evaluation: precision@k / recall@k /
    // MRR / AP per query, grading brute-force cosine retrieval against
    // label-sharing ground truth — exact-rational metrics, so the
    // evaluation itself hash-verifies (nDCG's log2 deliberately absent).
    QueryDef(
      "l_retrieval_metrics",
      (s, d) => {
        val vecs = t(s, d, "embeddings")
        val pred = Similarity.bruteForceTopK(
            vecs.filter(col("vec_id").isin(1L, 2L, 3L)), vecs,
            "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("rank"),
            col("neighbor_id").as("doc_id"))
        val truth = vecs.filter(col("vec_id").isin(1L, 2L, 3L))
          .select(col("vec_id").as("query_id"), col("label").as("qlabel"))
          .join(vecs.select(col("vec_id").as("doc_id"), col("label")),
            col("qlabel") === col("label") &&
              col("query_id") =!= col("doc_id"))
          .select(col("query_id"), col("doc_id"))
        Retrieval.retrievalMetrics(pred, truth, k = 10)
          .orderBy(col("query_id"))
      },
      Some(raw"""WITH v AS (
                SELECT vec_id, label,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
              ),
              pairs AS (
                SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
                  list_sum(list_transform(range(1, len(q.e) + 1),
                    i -> q.e[i] * c.e[i])) /
                  (SQRT(list_sum(list_transform(q.e, x -> x * x))) *
                   SQRT(list_sum(list_transform(c.e, x -> x * x)))) AS cosine
                FROM v q JOIN v c ON q.vec_id <> c.vec_id
                WHERE q.vec_id IN (1, 2, 3)
              ),
              pred AS (
                SELECT query_id, doc_id, rank FROM (
                  SELECT query_id, doc_id,
                    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC NULLS LAST, doc_id ASC NULLS LAST)
                      AS INTEGER) AS rank
                  FROM pairs
                ) WHERE rank <= 10
              ),
              tr AS (
                SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS doc_id
                FROM v q JOIN v c
                  ON q.label = c.label AND q.vec_id <> c.vec_id
                WHERE q.vec_id IN (1, 2, 3)
              ),
              nrel AS (SELECT query_id, COUNT(*) AS n_rel
                       FROM tr GROUP BY query_id),
              h AS (
                SELECT p.query_id, p.rank,
                  CAST(ROW_NUMBER() OVER (PARTITION BY p.query_id
                    ORDER BY p.rank) AS INTEGER) AS i
                FROM pred p JOIN tr USING (query_id, doc_id)
              ),
              perq AS (
                SELECT query_id, CAST(COUNT(*) AS BIGINT) AS hits,
                  MIN(rank) AS first_rank,
                  SUM(CAST(CAST(i AS DOUBLE) / rank AS DECIMAL(18,12)))
                    AS ap_num
                FROM h GROUP BY query_id
              ),
              qs AS (SELECT query_id FROM pred
                     UNION SELECT query_id FROM tr)
              SELECT qs.query_id,
                COALESCE(nrel.n_rel, 0) AS n_rel,
                COALESCE(perq.hits, 0) AS hits,
                CAST(COALESCE(perq.hits, 0) AS DOUBLE) / 10 AS precision_k,
                CASE WHEN nrel.n_rel IS NOT NULL AND nrel.n_rel > 0
                     THEN CAST(COALESCE(perq.hits, 0) AS DOUBLE) / nrel.n_rel
                     ELSE 0e0 END AS recall_k,
                CASE WHEN perq.first_rank IS NOT NULL
                     THEN 1e0 / perq.first_rank ELSE 0e0 END AS rr,
                CASE WHEN perq.ap_num IS NOT NULL
                          AND LEAST(nrel.n_rel, 10) > 0
                     THEN CAST(perq.ap_num AS DOUBLE) / LEAST(nrel.n_rel, 10)
                     ELSE 0e0 END AS ap
              FROM qs
              LEFT JOIN perq USING (query_id)
              LEFT JOIN nrel USING (query_id)
              ORDER BY qs.query_id""")),

    // Hybrid retrieval (the RAG-standard two-stage): BM25 recalls 50
    // lexical candidates per query, embedding cosine re-ranks exactly
    // that set, Reciprocal Rank Fusion fuses the orderings — RRF is
    // rank-based, so the fused score is IEEE division of exact integers
    // and hash-verifies where score-mixing would not.
    QueryDef(
      "l_hybrid_topk",
      (s, d) => {
        import s.implicits._
        val qs = Seq(
          (1, "spark table join"),
          (2, "fast key scan value"),
          (3, "slow vector group")).toDF("query_id", "qtext")
        val vecs = t(s, d, "embeddings")
        val (idx, st) = cachedIndex(s, d)
        Retrieval.hybridTopK(idx, st,
          qs, "query_id", "qtext",
          vecs.filter(col("vec_id").isin(1L, 2L, 3L)), "vec_id", "embedding",
          vecs, "vec_id", "embedding",
          k = 10, recallN = 50)
      },
      Some(raw"""WITH q AS (
                SELECT * FROM (VALUES
                  (1, 'spark table join'),
                  (2, 'fast key scan value'),
                  (3, 'slow vector group')) AS v(query_id, qtext)
              ),
              tk AS (
                SELECT doc_id,
                  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
                FROM documents
              ),
              tf AS (SELECT doc_id, token, COUNT(*) AS tf
                     FROM tk WHERE len(token) > 0 GROUP BY doc_id, token),
              dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
                     FROM tf GROUP BY doc_id),
              dft AS (SELECT token, COUNT(*) AS df_t FROM tf GROUP BY token),
              st AS (SELECT COUNT(*) AS n_docs,
                            CAST(SUM(dl) AS BIGINT) AS total_len FROM dl),
              qt AS (
                SELECT query_id, token, COUNT(*) AS qtf
                FROM (SELECT query_id,
                        unnest(string_split(trim(regexp_replace(lower(qtext), '\s+', ' ', 'g')), ' ')) AS token
                      FROM q)
                WHERE len(token) > 0 GROUP BY query_id, token
              ),
              c AS (
                SELECT qt.query_id, tf.doc_id,
                  CAST(qt.qtf AS DOUBLE)
                    * ((st.n_docs - dft.df_t + 0.5e0) / (dft.df_t + 0.5e0))
                    * ((tf.tf * (1.2e0 + 1e0)) /
                       (tf.tf + 1.2e0 * (1e0 - 0.75e0 + 0.75e0 *
                         (CAST(dl.dl * st.n_docs AS DOUBLE) / st.total_len))))
                    AS contrib
                FROM qt
                JOIN tf USING (token)
                JOIN dl USING (doc_id)
                JOIN dft USING (token)
                CROSS JOIN st
              ),
              sc AS (SELECT query_id, doc_id,
                            SUM(CAST(contrib AS DECIMAL(38,12))) AS sd
                     FROM c GROUP BY query_id, doc_id),
              recall AS (SELECT query_id, doc_id,
                      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY sd DESC, doc_id DESC) AS INTEGER)
                        AS bm25_rank
                    FROM sc QUALIFY bm25_rank <= 50),
              ve AS (
                SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
              ),
              cosd AS (
                SELECT r.query_id, r.bm25_rank, r.doc_id,
                  list_sum(list_transform(range(1, len(qe.e) + 1),
                    i -> qe.e[i] * de.e[i])) /
                  (SQRT(list_sum(list_transform(qe.e, x -> x * x))) *
                   SQRT(list_sum(list_transform(de.e, x -> x * x))))
                    AS cosine
                FROM recall r
                JOIN ve de ON de.vec_id = r.doc_id
                JOIN ve qe ON qe.vec_id = r.query_id
              ),
              cr AS (SELECT query_id, bm25_rank, doc_id,
                      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC NULLS LAST, doc_id ASC NULLS LAST)
                        AS INTEGER) AS cos_rank
                    FROM cosd),
              f AS (SELECT query_id, doc_id, bm25_rank, cos_rank,
                      1e0 / (60 + bm25_rank) + 1e0 / (60 + cos_rank)
                        AS rrf_score
                    FROM cr),
              fr AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY rrf_score DESC, doc_id ASC) AS INTEGER)
                        AS rank
                    FROM f)
              SELECT query_id, rank, doc_id, bm25_rank, cos_rank, rrf_score
              FROM fr WHERE rank <= 10 ORDER BY query_id, rank""")),

    // Exact phrase search over the positional inverted index: per-term
    // point lookups equi-joined on doc_id, consecutive-position test as
    // array arithmetic in codegen — work ∝ the phrase terms' posting
    // lists, never the corpus. The oracle is a DIFFERENT algorithm
    // (direct token-window scan per doc) agreeing on the answer.
    QueryDef(
      "l_phrase_search",
      (s, d) => {
        val idx = cachedPosIndex(s, d)
        Retrieval.phraseMatches(idx, Seq("fast", "table"))
          .withColumn("phrase", lit("fast table"))
          .unionByName(
            Retrieval.phraseMatches(idx, Seq("the", "value", "a"))
              .withColumn("phrase", lit("the value a")))
          .select(col("phrase"), col("doc_id"), col("match_count"))
          .orderBy(col("phrase"), col("doc_id"))
      },
      Some(raw"""WITH tk AS (
                SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
                FROM documents
              ),
              m AS (
                SELECT 'fast table' AS phrase, doc_id,
                  CAST(len(list_filter(generate_series(1, len(toks) - 1),
                    i -> toks[i] = 'fast' AND toks[i+1] = 'table')) AS INT)
                    AS match_count
                FROM tk
                UNION ALL
                SELECT 'the value a' AS phrase, doc_id,
                  CAST(len(list_filter(generate_series(1, len(toks) - 2),
                    i -> toks[i] = 'the' AND toks[i+1] = 'value'
                         AND toks[i+2] = 'a')) AS INT) AS match_count
                FROM tk
              )
              SELECT phrase, doc_id, match_count
              FROM m WHERE match_count > 0 ORDER BY phrase, doc_id""")),

    // Pair proximity search (the IR NEAR/n operator): two point lookups,
    // one doc_id equi-join, window test as array arithmetic in codegen.
    // The oracle is a direct token-window scan — a different algorithm
    // agreeing on the answer, the l_phrase_search discipline.
    QueryDef(
      "l_proximity_search",
      (s, d) => {
        val idx = cachedPosIndex(s, d)
        Retrieval.proximityMatches(idx, "fast", "table", window = 3)
          .withColumn("probe", lit("fast NEAR/3 table"))
          .unionByName(
            Retrieval.proximityMatches(idx, "spark", "join", window = 2)
              .withColumn("probe", lit("spark NEAR/2 join")))
          .select(col("probe"), col("doc_id"), col("match_count"))
          .orderBy(col("probe"), col("doc_id"))
      },
      Some(raw"""WITH tk AS (
                SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
                FROM documents
              ),
              m AS (
                SELECT 'fast NEAR/3 table' AS probe, doc_id,
                  CAST(len(list_filter(generate_series(1, len(toks)),
                    i -> toks[i] = 'fast' AND
                      len(list_filter(
                        generate_series(greatest(1, i - 3),
                                        least(len(toks), i + 3)),
                        j -> j <> i AND toks[j] = 'table')) > 0)) AS INT)
                    AS match_count
                FROM tk
                UNION ALL
                SELECT 'spark NEAR/2 join' AS probe, doc_id,
                  CAST(len(list_filter(generate_series(1, len(toks)),
                    i -> toks[i] = 'spark' AND
                      len(list_filter(
                        generate_series(greatest(1, i - 2),
                                        least(len(toks), i + 2)),
                        j -> j <> i AND toks[j] = 'join')) > 0)) AS INT)
                    AS match_count
                FROM tk
              )
              SELECT probe, doc_id, match_count
              FROM m WHERE match_count > 0 ORDER BY probe, doc_id""")),

    // Sequence packing spans (GPT-style concat-and-chunk): cumulative
    // token offsets over bucket-salted streams — the window is always
    // PARTITIONED (id % nBuckets), so packing scales without a global
    // token order. Pure arithmetic → engine-reproducible.
    QueryDef(
      "l_seq_packing",
      (s, d) => Packing.withSequenceSpans(t(s, d, "documents"), "doc_id", "text",
          seqLen = 512, nBuckets = 8)
        .orderBy(col("id")),
      Some("""WITH t AS (
                SELECT doc_id AS id, CAST(doc_id % 8 AS INTEGER) AS bucket,
                       CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
                FROM documents WHERE regexp_matches(text, '\S')
              ),
              o AS (SELECT id, bucket, n_tokens,
                      CAST(COALESCE(SUM(n_tokens) OVER (
                        PARTITION BY bucket ORDER BY id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS "offset"
                    FROM t)
              SELECT id, bucket, n_tokens, "offset",
                     CAST(FLOOR("offset" / 512) AS BIGINT) AS first_seq,
                     CAST(FLOOR(("offset" + n_tokens - 1) / 512) AS BIGINT) AS last_seq
              FROM o ORDER BY id""")),

    // Embedding int8 quantization stats (the compression step of an
    // embedding store) — one codegen kernel pass per vector; the oracle
    // recomputes scale/codes/error from the same explicit
    // floor(x/scale + 0.5) contract (round() half-case semantics differ
    // across engines, floor does not).
    QueryDef(
      "l_quantize_i8",
      (s, d) => t(s, d, "embeddings")
        .select(col("vec_id"),
          graft.functions.F.quantI8Stats(col("embedding")).as("q"))
        .select(col("vec_id"), col("q.scale").as("scale"),
          col("q.q_sum").as("q_sum"), col("q.max_err").as("max_err"))
        .orderBy(col("vec_id")),
      Some("""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
              ),
              s AS (SELECT vec_id, e,
                      list_max(list_transform(e, x -> abs(x))) / 127.0e0 AS scale
                    FROM v)
              SELECT vec_id, scale,
                CASE WHEN scale > 0e0
                  THEN CAST(list_sum(list_transform(e,
                    x -> CAST(floor(x / scale + 0.5e0) AS BIGINT))) AS BIGINT)
                  ELSE 0 END AS q_sum,
                CASE WHEN scale > 0e0
                  THEN list_max(list_transform(e,
                    x -> abs(floor(x / scale + 0.5e0) * scale - x)))
                  ELSE 0.0e0 END AS max_err
              FROM s ORDER BY vec_id""")),

    // Johnson–Lindenstrauss random projection 64→16 (the pre-ANN /
    // pre-clustering compression pass): a deterministic Achlioptas-
    // sparse matrix rides into whole-stage codegen as one shared
    // reference object and every row is one fused mat-vec — zero
    // shuffles, scales with the scan. The seeded matrix generator is
    // engine-specific (xxhash64 mixing), so the MATRIX is materialized
    // (outDim rows — trivially linear) and the oracle recomputes every
    // projection from it with the same strict left-to-right list_sum.
    // The gate emits SCALAR rows (vec_id, j, value) — the driver's
    // pandas canonicalizer cannot sort ARRAY cells — while the library
    // API (Similarity.randomProject) keeps its array-valued `proj`
    // column; the explode is gate-only projection, not a plan change
    // (posexplode fuses into the same map-only codegen stage).
    QueryDef(
      "l_random_projection",
      (s, d) => {
        import s.implicits._
        val m = Similarity.jlMatrix(inDim = 64, outDim = 16, seed = 2024L)
        materialize(
          m.zipWithIndex.map { case (w, j) => (j, w.toSeq) }.toSeq
            .toDF("j", "w"), "jl_matrix")
        Similarity.randomProject(
            t(s, d, "embeddings"), "vec_id", "embedding",
            inDim = 64, outDim = 16, seed = 2024L)
          .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "value")))
          .select(col("vec_id"), col("j"),
            (round(col("value"), 9) + lit(0d)).as("value"))
          .orderBy(col("vec_id"), col("j"))
      },
      Some(s"""WITH m AS (
                 SELECT j, w FROM read_parquet('$OracleScratch/jl_matrix/*.parquet')
               ),
               v AS (
                 SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                 FROM embeddings
               ),
               p AS (
                 SELECT v.vec_id, m.j,
                   list_sum(list_transform(range(1, len(v.e) + 1),
                     i -> m.w[i] * v.e[i])) AS y
                 FROM v CROSS JOIN m
               )
               SELECT vec_id, j, ROUND(y, 9) + 0e0 AS value
               FROM p ORDER BY vec_id, j""")),

    // Distributed PCA (the MLlib RowMatrix recipe): ONE dim²-key
    // distributed pass aggregates exact second-moment sums (decimal-
    // accumulated — bit-identical across engines and partitionings),
    // the 64×64 eigenproblem solves driver-side with deterministic
    // cyclic Jacobi, and the basis materializes as an artifact. The
    // eigensolver's float micro-steps are engine-specific, so the
    // oracle VERIFIES rather than re-derives: it recomputes the scatter
    // matrix from raw embeddings with the same exact arithmetic, then
    // checks from the materialized basis that S·b = λ·b (residual) and
    // the basis is orthonormal — every intermediate double identical by
    // construction (sequential list_sum mirrors the driver loops).
    QueryDef(
      "l_pca_variance",
      (s, d) => {
        import s.implicits._
        val dim = 64; val k = 8
        val sMat = Pca.scatterMatrix(t(s, d, "embeddings"), "embedding", dim)
        val (values, basis) = Pca.jacobiEigen(sMat)
        val (lam, b) = (values.take(k), basis.take(k))
        materialize(
          b.zipWithIndex.map { case (row, j) =>
            (j + 1, lam(j), row.toSeq) }.toSeq.toDF("j", "lambda", "b"),
          "pca_basis")
        var trace = 0.0
        for (i <- 0 until dim) trace += sMat(i)(i)
        def dotSeq(x: Array[Double], y: Array[Double]): Double = {
          var acc = 0.0; var i = 0
          while (i < x.length) { acc += x(i) * y(i); i += 1 }
          acc
        }
        val rows = (0 until k).map { j =>
          val resid = (0 until dim).map { i =>
            math.abs(dotSeq(sMat(i), b(j)) - lam(j) * b(j)(i))
          }.max
          val ortho = (0 until k).map { kk =>
            math.abs(dotSeq(b(j), b(kk)) - (if (j == kk) 1.0 else 0.0))
          }.max
          def r9(x: Double) = BigDecimal(x)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          (j + 1, r9(lam(j)), r9(lam(j) / trace),
            resid < 1e-6, ortho < 1e-9)
        }
        rows.toDF("component", "eigenvalue", "evr",
            "residual_ok", "ortho_ok")
          .orderBy(col("component"))
      },
      Some(s"""WITH v AS (
                 SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                 FROM embeddings
               ),
               nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
               pairs AS (
                 SELECT t1.range AS i, t2.range AS j,
                   CAST(SUM(CAST(e[t1.range] * e[t2.range]
                     AS DECIMAL(38,18))) AS DOUBLE) AS raw
                 FROM v, range(1, 65) t1, range(1, 65) t2
                 WHERE t2.range >= t1.range
                 GROUP BY t1.range, t2.range
               ),
               m AS (
                 SELECT t1.range AS i,
                   CAST(SUM(CAST(e[t1.range] AS DECIMAL(38,18))) AS DOUBLE)
                     / (SELECT n FROM nn) AS m
                 FROM v, range(1, 65) t1 GROUP BY t1.range
               ),
               s_up AS (
                 SELECT p.i, p.j,
                   p.raw - (SELECT n FROM nn) * mi.m * mj.m AS s
                 FROM pairs p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j
               ),
               s_full AS (
                 SELECT i, j, s FROM s_up
                 UNION ALL SELECT j, i, s FROM s_up WHERE i <> j
               ),
               srow AS (SELECT i, list(s ORDER BY j) AS sr FROM s_full GROUP BY i),
               tr AS (
                 SELECT list_sum(list(s ORDER BY i)) AS trace
                 FROM s_full WHERE i = j
               ),
               b AS (SELECT j, lambda, b
                     FROM read_parquet('$OracleScratch/pca_basis/*.parquet')),
               res AS (
                 SELECT b.j AS comp, MAX(ABS(
                   list_sum(list_transform(range(1, 65), k -> srow.sr[k] * b.b[k]))
                   - b.lambda * b.b[srow.i])) AS r
                 FROM b CROSS JOIN srow GROUP BY b.j
               ),
               o AS (
                 SELECT b1.j AS comp, MAX(ABS(
                   list_sum(list_transform(range(1, 65), k -> b1.b[k] * b2.b[k]))
                   - CASE WHEN b1.j = b2.j THEN 1e0 ELSE 0e0 END)) AS o
                 FROM b b1 CROSS JOIN b b2 GROUP BY b1.j
               )
               SELECT b.j AS component, ROUND(b.lambda, 9) + 0e0 AS eigenvalue,
                 ROUND(b.lambda / (SELECT trace FROM tr), 9) + 0e0 AS evr,
                 res.r < 1e-6 AS residual_ok, o.o < 1e-9 AS ortho_ok
               FROM b JOIN res ON res.comp = b.j JOIN o ON o.comp = b.j
               ORDER BY component""")),

    // Deterministic md5-bucket train/val/test split: assignment depends
    // only on the id (stable under re-runs, appends, engines — md5 is
    // portable where xxhash64 seeds are not). Row-local codegen, no
    // shuffle; the gate checks the per-split census.
    QueryDef(
      "l_train_split",
      (s, d) => Curation.withSplit(t(s, d, "documents"), "doc_id")
        .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("split")),
      Some("""WITH b AS (
                SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) / 65536.0e0 AS b
                FROM documents
              )
              SELECT CASE WHEN b < 0.9e0 THEN 'train'
                          WHEN b < 0.95e0 THEN 'val'
                          ELSE 'test' END AS split,
                     COUNT(*) AS n_docs
              FROM b GROUP BY 1 ORDER BY 1""")),

    // Deterministic epoch-shuffle into balanced shards: md5-bucketed
    // shard + in-shard rank = a reproducible pseudorandom permutation of
    // the corpus (the step before packing/writing training shards). The
    // rank window is partitioned BY SHARD — one keyed shuffle, each
    // shard sorts locally, never a single-partition global row_number.
    QueryDef(
      "l_shard_shuffle",
      (s, d) =>
        Curation.shardShuffle(t(s, d, "documents"), "doc_id", nShards = 8)
          .orderBy(col("shard"), col("pos")),
      Some("""WITH k AS (
                SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key FROM documents
              ),
              s AS (
                SELECT doc_id, key,
                  CAST(CAST(('0x' || substr(key, 1, 8)) AS BIGINT) % 8 AS INT) AS shard
                FROM k
              )
              SELECT doc_id, shard,
                CAST(ROW_NUMBER() OVER (
                  PARTITION BY shard ORDER BY key ASC, doc_id ASC) - 1 AS BIGINT) AS pos
              FROM s ORDER BY shard, pos""")),

    // Test-set decontamination scan: train docs sharing distinct word
    // trigrams with the eval slice (doc_id % 10 = 0). The eval copies
    // planted at +50000 guarantee full-containment hits. Posting-list ×
    // broadcast-set equi-join — never doc × doc.
    QueryDef(
      "l_decontaminate",
      (s, d) => {
        val docs = t(s, d, "documents")
        val evalDocs = docs.filter(col("doc_id") % 10 === 0)
        val train = docs.filter(col("doc_id") % 10 =!= 0)
          .unionByName(evalDocs.select((col("doc_id") + 50000).as("doc_id"),
            col("text"), col("lang"), col("source"), col("n_chars")))
        Curation.contamination(train, evalDocs, "doc_id", "text", n = 3)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH train AS (
                 SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
                 UNION ALL
                 SELECT doc_id + 50000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
               ),
               tg AS (SELECT doc_id, ${trigramSql("text")} AS grams FROM train),
               tsh AS (SELECT doc_id, len(grams) AS n_ngrams, unnest(grams) AS gram FROM tg),
               eg AS (SELECT ${trigramSql("text")} AS grams FROM documents WHERE doc_id % 10 = 0),
               ev AS (SELECT DISTINCT unnest(grams) AS gram FROM eg)
               SELECT t.doc_id,
                      COUNT(*) AS n_shared,
                      CAST(t.n_ngrams AS INTEGER) AS n_ngrams,
                      COUNT(*) / CAST(t.n_ngrams AS DOUBLE) AS contamination
               FROM tsh t JOIN ev ON t.gram = ev.gram
               GROUP BY t.doc_id, t.n_ngrams
               ORDER BY t.doc_id""")),

    // Bloom-prefiltered decontamination — the 100 TB plan for the same
    // answer: a per-row codegen Bloom probe (512 KB bitmap of the eval
    // set's n-grams, one reference object per task) estimates
    // contamination with NO explode/join/shuffle; only the suspect
    // superset pays the exact verification. The gate pins BOTH that the
    // cleaned set equals the oracle's exact semantics AND (in-process)
    // that it is row-identical to the exact decontaminate path.
    QueryDef(
      "l_decontaminate_bloom",
      (s, d) => {
        val docs = t(s, d, "documents")
        val evalDocs = docs.filter(col("doc_id") % 10 === 0)
        val train = docs.filter(col("doc_id") % 10 =!= 0)
          .unionByName(evalDocs.select((col("doc_id") + 50000).as("doc_id"),
            col("text"), col("lang"), col("source"), col("n_chars")))
        // The identity pin previously ran `clean.exceptAll(exact).isEmpty
        // && exact.exceptAll(clean).isEmpty` — each side is a full
        // decontamination pass (bloom probe resp. exact explode-join over
        // every training doc), and the idiom evaluates both plans twice,
        // plus `clean` a third time for the output: five corpus passes
        // for one answer. Round 11: localCheckpoint the (doc-grain, id-
        // only) clean set once, compare via the signed-union
        // multisetEqual (ONE evaluation of each side, ONE action), and
        // serve the output from the checkpoint — two passes total, same
        // boolean, same rows (guide §1.2).
        val cleanIds = Curation.decontaminateBloom(
            train, evalDocs, "doc_id", "text", n = 3)
          .select(col("doc_id")).localCheckpoint()
        val exact = Curation.decontaminate(
          train, evalDocs, "doc_id", "text", n = 3)
        val identical =
          QueryDef.multisetEqual(cleanIds, exact.select(col("doc_id")))
        cleanIds
          .withColumn("matches_exact_path", lit(identical))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH train AS (
                 SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
                 UNION ALL
                 SELECT doc_id + 50000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
               ),
               tg AS (SELECT doc_id, ${trigramSql("text")} AS grams FROM train),
               tsh AS (SELECT doc_id, len(grams) AS n_ngrams, unnest(grams) AS gram FROM tg),
               eg AS (SELECT ${trigramSql("text")} AS grams FROM documents WHERE doc_id % 10 = 0),
               ev AS (SELECT DISTINCT unnest(grams) AS gram FROM eg),
               flagged AS (
                 SELECT t.doc_id
                 FROM tsh t JOIN ev ON t.gram = ev.gram
                 GROUP BY t.doc_id, t.n_ngrams
                 HAVING COUNT(*) / CAST(t.n_ngrams AS DOUBLE) >= 0.2e0)
               SELECT doc_id, TRUE AS matches_exact_path
               FROM train
               WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
               ORDER BY doc_id""")),

    // Domain-mixing weights: per-source sampling rates realizing a target
    // composition, bounded by the scarcest domain (no upsampling). One
    // aggregation to domain grain + scalar math against a 1-row frame.
    QueryDef(
      "l_mix_weights",
      (s, d) => Curation.mixingWeights(t(s, d, "documents"), "source",
          Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .orderBy(col("source")),
      Some("""WITH tgt(source, target_frac) AS (
                VALUES ('src0', 0.5e0), ('src1', 0.3e0), ('src2', 0.2e0)
              ),
              c AS (SELECT d.source, COUNT(*) AS n_rows, t.target_frac
                    FROM documents d JOIN tgt t ON d.source = t.source
                    GROUP BY d.source, t.target_frac),
              m AS (SELECT MIN(n_rows / target_frac) AS total_out FROM c)
              SELECT c.source, c.n_rows, c.target_frac,
                     LEAST(1.0e0, m.total_out * c.target_frac / n_rows) AS rate,
                     CAST(FLOOR(m.total_out * c.target_frac) AS BIGINT) AS expected_rows
              FROM c, m ORDER BY c.source""")),

    // Temperature mixing (α-sampling): sampled share q ∝ p^0.5 from the
    // observed domain shares — α=0.5 rides sqrt (correctly rounded per
    // IEEE, unlike pow(x, .5)) and the normalizer sums DECIMAL-cast
    // weights, so the scores hash-match across engines exactly.
    QueryDef(
      "l_mix_temperature",
      (s, d) => Curation.temperatureWeights(t(s, d, "documents"), "source")
        .orderBy(col("source")),
      Some("""WITH c AS (
                SELECT source, COUNT(*) AS n_rows FROM documents GROUP BY source
              ),
              w AS (SELECT source, n_rows,
                      CAST(sqrt(CAST(n_rows AS DOUBLE)) AS DECIMAL(28,10)) AS wd
                    FROM c),
              t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS n_total,
                           SUM(wd) AS w_total FROM w)
              SELECT source, n_rows,
                     CAST(n_rows AS DOUBLE) / n_total AS p,
                     CAST(wd AS DOUBLE) / CAST(w_total AS DOUBLE) AS q
              FROM w, t ORDER BY source""")),

    // Exact shared-token-run detection (Lee et al. substring-dedup
    // semantics): posting-list join on positioned 8-gram hashes, aligned
    // diagonals, islands-trick run measurement. The near-dup copies share
    // their full original text, so every planted pair must surface with
    // a run ≥ its token count. Spark joins 64-bit gram hashes (fixed-
    // width shuffle keys); the oracle joins the gram strings — identical
    // semantics modulo ~n²/2⁶⁴ collision odds.
    QueryDef(
      "l_substring_runs",
      (s, d) =>
        // dfCap mirrors in the oracle below (HAVING COUNT(*) <= 500 per
        // gram): a boilerplate gram in f docs joins f² match rows — the
        // scale-stress hot phrase makes this explode without the guard.
        // No-op at gate scale; runs through a dropped gram split in two
        // (documented lower-bound semantics of sharedTokenRuns).
        // spreadIfNarrow: the positioned-8-gram generator is the one
        // dedup kernel heavy enough per row to buy back the exchange
        // (interleaved A/B 0.73×; no-op on multi-split corpora).
        Dedup.sharedTokenRuns(
            Tables.spreadIfNarrow(docsWithNearDups(s, d)), "doc_id", "text",
            gramSize = 8, minRunTokens = 16, dfCap = Some(500L))
          .orderBy(col("id_a"), col("id_b")),
      Some("""WITH docs AS (
                SELECT doc_id, text FROM documents
                UNION ALL SELECT doc_id + 20000, text || ' graftmarker' FROM documents
              ),
              tk AS (
                SELECT doc_id,
                string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
                FROM docs
              ),
              g0 AS (
                SELECT doc_id, UNNEST(list_transform(range(0, GREATEST(len(t) - 7, 0)),
                  i -> struct_pack(pos := CAST(i AS INTEGER),
                                   g := array_to_string(t[i+1:i+8], ' ')))) AS u
                FROM tk
              ),
              g_all AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM g0),
              rare AS (SELECT g FROM g_all GROUP BY g HAVING COUNT(*) <= 500),
              g AS (SELECT g_all.* FROM g_all JOIN rare USING (g)),
              m AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
                       a.pos - b.pos AS diag
                FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
              ),
              r AS (
                SELECT id_a, id_b, diag,
                pa - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, diag ORDER BY pa)
                  AS island
                FROM m
              ),
              runs AS (
                SELECT id_a, id_b, COUNT(*) + 7 AS run_tokens
                FROM r GROUP BY id_a, id_b, diag, island
                HAVING COUNT(*) + 7 >= 16
              )
              SELECT id_a, id_b, COUNT(*) AS n_runs,
              CAST(MAX(run_tokens) AS BIGINT) AS max_run_tokens
              FROM runs GROUP BY id_a, id_b ORDER BY id_a, id_b""")),

    // SemDeDup (cluster-then-dedup): fixed coarse quantizer (first 8
    // embeddings), within-cluster exact-cosine pairs >= 0.999, connected
    // components, min-id canonical labels. The injected identical copies
    // must collapse onto their originals; cluster assignment and cosine
    // are both index-order folds, so DuckDB reproduces them bit-for-bit.
    QueryDef(
      "l_semantic_dedup",
      (s, d) => {
        val vecs = vecsWithDups(s, d)
        val centroids = t(s, d, "embeddings").filter(col("vec_id") < 8)
          .orderBy(col("vec_id")).select(col("embedding")).collect()
          .map(_.getSeq[Float](0).map(_.toDouble).toArray)
        Similarity.semanticDedupLabels(vecs, "vec_id", "embedding", centroids, 0.999)
          .orderBy(col("id"))
      },
      Some("""WITH RECURSIVE v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
                UNION ALL
                SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE))
                FROM embeddings
              ),
              cents AS (SELECT list(e ORDER BY vec_id) AS cs FROM v WHERE vec_id < 8),
              a AS (
                SELECT vec_id, e,
                list_transform(cs, c -> list_sum(list_transform(range(1, len(e) + 1),
                  i -> (e[i] - c[i]) * (e[i] - c[i])))) AS dists
                FROM v, cents
              ),
              asn AS (SELECT vec_id, e, list_indexof(dists, list_min(dists)) AS l FROM a),
              pairs AS (
                SELECT x.vec_id AS id_a, y.vec_id AS id_b
                FROM asn x JOIN asn y ON x.l = y.l AND x.vec_id < y.vec_id
                WHERE list_sum(list_transform(range(1, len(x.e) + 1), i -> x.e[i] * y.e[i])) /
                      (SQRT(list_sum(list_transform(x.e, q -> q * q))) *
                       SQRT(list_sum(list_transform(y.e, q -> q * q)))) >= 0.999
              ),
              edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
              ),
              reach(id, r) AS (
                SELECT vec_id, vec_id FROM v
                UNION
                SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
              )
              SELECT id, MIN(r) AS canonical_id FROM reach
              GROUP BY id ORDER BY id""")),

    // SemDeDup with the quantizer sized to the corpus (the
    // semanticDedupPairsAuto formula: k = n / targetClusterSize, so mean
    // cluster size stays constant as the corpus grows — fixed k goes
    // quadratic). The k-means training is seed-deterministic but its
    // centroids are engine-specific, so the ASSIGNMENT is materialized
    // and the oracle recomputes the within-cluster exact-cosine pairs
    // from it — same split as the LSH gates (candidates engine-side,
    // verification oracle-side).
    QueryDef(
      "l_semantic_dedup_auto",
      (s, d) => {
        val vecs = vecsWithDups(s, d)
        val n = vecs.count()
        val k = math.max(8L, (n + 63) / 64).toInt
        val centroids = Similarity.trainIvfCentroids(vecs, "embedding", k)
        val assign = materialize(
          Similarity.withIvfList(
              vecs.select(col("vec_id").as("id"), col("embedding").as("v")),
              "v", centroids)
            .filter(col("__ivf_list") >= 0)
            .select(col("id"), col("__ivf_list").as("list")),
          "semauto_assign")
        val cands = assign.select(col("id").as("id_a"), col("list"))
          .join(assign.select(col("id").as("id_b"), col("list").as("l2")),
            col("list") === col("l2") && col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
        Similarity.verifyCosine(cands, vecs, "vec_id", "embedding", 0.999)
          .select(col("id_a"), col("id_b"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH v AS (
                 SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                 FROM embeddings
                 UNION ALL
                 SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE))
                 FROM embeddings
               ),
               a AS (SELECT id, list
                     FROM read_parquet('$OracleScratch/semauto_assign/*.parquet')),
               c AS (
                 SELECT a1.id AS id_a, a2.id AS id_b
                 FROM a a1 JOIN a a2 ON a1.list = a2.list AND a1.id < a2.id
               )
               SELECT c.id_a, c.id_b
               FROM c JOIN v va ON va.vec_id = c.id_a
                      JOIN v vb ON vb.vec_id = c.id_b
               WHERE list_sum(list_transform(range(1, len(va.e) + 1), i -> va.e[i] * vb.e[i])) /
                     (SQRT(list_sum(list_transform(va.e, x -> x * x))) *
                      SQRT(list_sum(list_transform(vb.e, x -> x * x)))) >= 0.999
               ORDER BY id_a, id_b""")),

    // One distributed Lloyd (k-means) assignment + aggregation step over
    // fixed centroids (the first 8 embeddings) — the per-iteration
    // contract of Similarity.trainIvfCentroidsDistributed. Assignment is
    // the real codegen nearest-centroid pass; the per-(list, dim) rollup
    // is pinned with floor-scaled INTEGER sums so no float accumulates in
    // engine-dependent order (the library's double means are spec-checked
    // instead). The oracle recomputes assignment by brute force — both
    // engines fold (e_i - c_i)² in index order, so distances are
    // bit-identical and ties break to the lowest centroid index.
    QueryDef(
      "l_kmeans_step",
      (s, d) => {
        val vecs = t(s, d, "embeddings")
        val centroids = vecs.filter(col("vec_id") < 8).orderBy(col("vec_id"))
          .select(col("embedding")).collect()
          .map(_.getSeq[Float](0).map(_.toDouble).toArray)
        Similarity.withIvfList(
            vecs.select(col("vec_id"), col("embedding").as("v")), "v", centroids)
          .select(col("__ivf_list").as("list_id"),
            posexplode(col("v")).as(Seq("pos", "val")))
          .groupBy(col("list_id"), col("pos"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("val").cast(DoubleType) * 1e6)).as("sum_scaled"))
          .orderBy(col("list_id"), col("pos"))
      },
      Some("""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
              ),
              cents AS (SELECT list(e ORDER BY vec_id) AS cs FROM v WHERE vec_id < 8),
              a AS (
                SELECT vec_id, e,
                list_transform(cs, c -> list_sum(list_transform(range(1, len(e) + 1),
                  i -> (e[i] - c[i]) * (e[i] - c[i])))) AS dists
                FROM v, cents
              ),
              asn AS (SELECT vec_id, e,
                        CAST(list_indexof(dists, list_min(dists)) - 1 AS INTEGER) AS list_id
                      FROM a),
              x AS (SELECT list_id,
                      CAST(unnest(range(0, len(e))) AS INTEGER) AS pos,
                      unnest(e) AS val
                    FROM asn)
              SELECT list_id, pos, COUNT(*) AS n,
              CAST(SUM(CAST(FLOOR(val * 1e6) AS BIGINT)) AS BIGINT) AS sum_scaled
              FROM x GROUP BY list_id, pos ORDER BY list_id, pos""")),

    // Exact per-group length quantiles (corpus length profiling): one
    // sort-based percentile pass per source. The oracle mirrors Spark's
    // interpolation formula term-for-term — the two-sided weighted form
    // (higher - pos)·lo + (pos - lower)·hi over pos = p·(n-1), NOT
    // quantile_cont's lo + (hi - lo)·frac, which differs in the last ulp
    // — so the doubles match bit-for-bit.
    QueryDef(
      "l_length_quantiles",
      (s, d) =>
        t(s, d, "documents")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            percentile(col("n_chars"), lit(0.5)).as("p50"),
            percentile(col("n_chars"), lit(0.9)).as("p90"),
            percentile(col("n_chars"), lit(0.99)).as("p99"))
          .orderBy(col("source")),
      Some("""WITH s AS (
                SELECT source, n_chars,
                ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) - 1 AS rn,
                COUNT(*) OVER (PARTITION BY source) AS n
                FROM documents
              ),
              q AS (
                SELECT s.source, p.p,
                ANY_VALUE(s.n) AS grp_n,
                ANY_VALUE(p.p * (n - 1)) AS pos,
                MAX(CASE WHEN rn = CAST(FLOOR(p.p * (n - 1)) AS BIGINT) THEN n_chars END) AS lo,
                MAX(CASE WHEN rn = CAST(CEIL(p.p * (n - 1)) AS BIGINT) THEN n_chars END) AS hi
                FROM s, (VALUES (0.5e0), (0.9e0), (0.99e0)) AS p(p)
                GROUP BY s.source, p.p
              ),
              i AS (
                SELECT source, p, grp_n,
                CASE WHEN FLOOR(pos) = CEIL(pos) THEN CAST(lo AS DOUBLE)
                     ELSE (CEIL(pos) - pos) * lo + (pos - FLOOR(pos)) * hi END AS v
                FROM q
              )
              SELECT source,
              CAST(ANY_VALUE(grp_n) AS BIGINT) AS n_docs,
              MAX(CASE WHEN p = 0.5e0 THEN v END) AS p50,
              MAX(CASE WHEN p = 0.9e0 THEN v END) AS p90,
              MAX(CASE WHEN p = 0.99e0 THEN v END) AS p99
              FROM i GROUP BY source ORDER BY source""")),

    // Deterministic weighted sampling (Efraimidis–Spirakis top-k by
    // u^(1/w), u from the md5 bucket): longer docs are proportionally
    // likelier. Only ids + weights are output (the key is an ordering
    // device; pow()'s last ulp is libm-specific, but the SELECTED SET
    // only flips if two keys collide within that ulp — which the 16-bit
    // u grid makes effectively impossible).
    QueryDef(
      "l_weighted_sample",
      (s, d) =>
        Curation.weightedSample(
            t(s, d, "documents").select(col("doc_id"), col("n_chars")),
            "doc_id", "n_chars", k = 100)
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, n_chars FROM (
                SELECT doc_id, n_chars,
                POW((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|wsample'), 1, 15)) AS BIGINT) + 1.0) / 1152921504606846976.0,
                    1.0 / CAST(n_chars AS DOUBLE)) AS wkey
                FROM documents
              )
              ORDER BY wkey DESC NULLS LAST, doc_id ASC LIMIT 100
              """)),

    // Stratified sampling with exact per-stratum quotas: up to 50 docs
    // per source, chosen by hashed-id order — deterministic and
    // append-stable like the split/mix operators. The oracle exploits
    // that ordering by the 15-hex-digit md5 prefix STRING equals
    // ordering by its numeric value (fixed-width lowercase hex is
    // lexicographically monotone), so no hex→int conversion is needed.
    QueryDef(
      "l_stratified_sample",
      (s, d) =>
        Curation.stratifiedSample(
            t(s, d, "documents").select(col("doc_id"), col("source")),
            "doc_id", "source", perStratum = 10)
          .orderBy(col("source"), col("doc_id")),
      Some("""SELECT doc_id, source FROM (
                SELECT doc_id, source,
                ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || '|strata'), 1, 15) ASC,
                           doc_id ASC) AS r
                FROM documents
              ) WHERE r <= 10
              ORDER BY source, doc_id""")),

    // Dataset-card profile: the per-source corpus summary a training-data
    // audit starts from — doc/token volumes, exact-dup rate (fingerprint
    // census), language composition — in ONE aggregation pass over the
    // corpus. All counts are integers; ratios come from one final
    // division, so nothing accumulates in engine-dependent order.
    QueryDef(
      "l_dataset_profile",
      (s, d) =>
        t(s, d, "documents")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(TextAnalysis.tokenCount(col("text")).cast(LongType))
              .as("total_tokens"),
            countDistinct(TextAnalysis.fingerprint(col("text")))
              .as("distinct_fps"),
            count(when(TextAnalysis.languageId(col("text")) === "en", 1))
              .as("n_en"))
          .withColumn("dup_rate",
            lit(1.0) - col("distinct_fps").cast(DoubleType) /
              col("n_docs").cast(DoubleType))
          .withColumn("en_frac",
            col("n_en").cast(DoubleType) / col("n_docs").cast(DoubleType))
          .orderBy(col("source")),
      Some("""WITH scored AS (
                SELECT source, text,
                CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS ws_tokens,
                md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
                CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['the','a','of','and','to','in','is','it','that','was'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_en,
                CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','zu'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_de,
                CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['le','la','les','et','est','un','une','pas','avec','pour'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_fr,
                CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['el','la','los','y','es','un','una','no','con','para'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_es
                FROM documents
              ),
              lang AS (
                SELECT source, ws_tokens, fp,
                CASE WHEN (s_en + s_de + s_fr + s_es) > 0 THEN
                  CASE WHEN s_es > GREATEST(s_en, s_de, s_fr) THEN 'es'
                       WHEN s_fr > GREATEST(s_en, s_de) THEN 'fr'
                       WHEN s_de > s_en THEN 'de'
                       ELSE 'en' END
                ELSE 'und' END AS detected
                FROM scored
              )
              SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(ws_tokens) AS BIGINT) AS total_tokens,
              COUNT(DISTINCT fp) AS distinct_fps,
              COUNT(CASE WHEN detected = 'en' THEN 1 END) AS n_en,
              1.0e0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_rate,
              CAST(COUNT(CASE WHEN detected = 'en' THEN 1 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS en_frac
              FROM lang GROUP BY source ORDER BY source""")),

    // Gopher/MassiveText document quality rules, one boolean per rule so
    // audits can report per-rule rejection rates; all row-local codegen.
    QueryDef(
      "l_gopher_filter",
      (s, d) => {
        val flags = Curation.gopherFlags(col("text"), minWords = 30)
        t(s, d, "documents").select(
          (col("doc_id") +: flags.map { case (n, c) => c.as(n) }) :+
            Curation.gopherKeep(col("text"), minWords = 30).as("keep"): _*)
      },
      Some("""WITH n AS (
                SELECT doc_id, text,
                       trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
                FROM documents
              ),
              t AS (SELECT doc_id, text, norm, string_split(norm, ' ') AS toks FROM n),
              f AS (SELECT doc_id,
                CAST(len(toks) AS BIGINT) AS n_words,
                len(toks) BETWEEN 30 AND 100000 AS ok_word_count,
                (length(replace(norm, ' ', '')) / CAST(len(toks) AS DOUBLE)) BETWEEN 3.0e0 AND 10.0e0 AS ok_mean_word_len,
                (len(regexp_extract_all(text, '#|\.\.\.|…')) / CAST(len(toks) AS DOUBLE)) < 0.1e0 AS ok_symbol_ratio,
                (len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) / CAST(len(toks) AS DOUBLE)) >= 0.8e0 AS ok_alpha_words,
                len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it','that','was'], x))) >= 2 AS ok_stopwords
                FROM t)
              SELECT doc_id, n_words, ok_word_count, ok_mean_word_len,
                     ok_symbol_ratio, ok_alpha_words, ok_stopwords,
                     (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
                      AND ok_alpha_words AND ok_stopwords) AS keep
              FROM f ORDER BY doc_id""")),

    // DSIR importance weights (Xie et al. 2023): per-doc mean
    // target/raw likelihood ratio over hashed-unigram buckets, target =
    // the English subcorpus. Exact-rational ratios (add-one smoothing)
    // so the doubles hash-match cross-engine; see
    // Curation.dsirTargetAffinity for the 100 TB shape (one census
    // pass, broadcast ratio table, one doc-grain shuffle).
    QueryDef(
      "l_dsir_weights",
      (s, d) =>
        Curation.dsirTargetAffinity(
          t(s, d, "documents"), "doc_id", "text", col("lang") === "en",
          buckets = 256)
          .orderBy(col("doc_id")),
      Some("""WITH tk AS (
                SELECT doc_id, lang,
                  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
                FROM documents
              ),
              tb AS (
                SELECT doc_id, lang,
                  CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) % 256 AS b
                FROM tk
              ),
              cen AS (
                SELECT b, COUNT(*) AS c_r,
                  COUNT(CASE WHEN lang = 'en' THEN 1 END) AS c_t
                FROM tb GROUP BY b
              ),
              tot AS (
                SELECT CAST(SUM(c_r) AS BIGINT) AS t_r,
                       CAST(SUM(c_t) AS BIGINT) AS t_t
                FROM cen
              ),
              r AS (
                SELECT b,
                  CAST((c_t + 1) * (t_r + 256) AS DOUBLE) /
                  CAST((c_r + 1) * (t_t + 256) AS DOUBLE) AS ratio
                FROM cen, tot
              )
              SELECT tb.doc_id,
                COUNT(*) AS n_tokens,
                CAST(SUM(CAST(ratio AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)
                  AS target_affinity,
                (CAST(SUM(CAST(ratio AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*))
                  > 1.0e0 AS keep
              FROM tb JOIN r USING (b)
              GROUP BY tb.doc_id ORDER BY tb.doc_id""")),

    // DSIR under INCREMENTAL census maintenance: the corpus splits into
    // two batches, each batch builds its own ≤256-row census in one
    // pass, the censuses MERGE (counts are additive — no history
    // re-tokenization), and scoring through the merged census must
    // EXACT-match the whole-corpus scores — the oracle is literally
    // l_dsir_weights' SQL. This is the 100 TB maintenance shape: a new
    // batch pays its own tokenization, the corpus census is a 256-row
    // fold.
    QueryDef(
      "l_dsir_incremental",
      (s, d) => {
        val docs = t(s, d, "documents")
        val target = col("lang") === "en"
        val merged = Curation.dsirCensusMerge(Seq(
          Curation.dsirCensus(docs.filter(col("doc_id") % 2 === 0),
            "text", target, buckets = 256),
          Curation.dsirCensus(docs.filter(col("doc_id") % 2 =!= 0),
            "text", target, buckets = 256)))
        Curation.dsirScoreWithCensus(docs, "doc_id", "text", merged,
            buckets = 256)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tk AS (
                SELECT doc_id, lang,
                  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
                FROM documents
              ),
              tb AS (
                SELECT doc_id, lang,
                  CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) % 256 AS b
                FROM tk
              ),
              cen AS (
                SELECT b, COUNT(*) AS c_r,
                  COUNT(CASE WHEN lang = 'en' THEN 1 END) AS c_t
                FROM tb GROUP BY b
              ),
              tot AS (
                SELECT CAST(SUM(c_r) AS BIGINT) AS t_r,
                       CAST(SUM(c_t) AS BIGINT) AS t_t
                FROM cen
              ),
              r AS (
                SELECT b,
                  CAST((c_t + 1) * (t_r + 256) AS DOUBLE) /
                  CAST((c_r + 1) * (t_t + 256) AS DOUBLE) AS ratio
                FROM cen, tot
              )
              SELECT tb.doc_id,
                COUNT(*) AS n_tokens,
                CAST(SUM(CAST(ratio AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)
                  AS target_affinity,
                (CAST(SUM(CAST(ratio AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*))
                  > 1.0e0 AS keep
              FROM tb JOIN r USING (b)
              GROUP BY tb.doc_id ORDER BY tb.doc_id""")),

    // CCNet head/middle/tail perplexity buckets: tercile cutoffs from a
    // FIXED deterministic sample (CCNet's own scale design — never a
    // global sort), bucket assignment a broadcast row-local compare.
    QueryDef(
      "l_ccnet_buckets",
      (s, d) =>
        TextAnalysis.perplexityBuckets(
          t(s, d, "documents"), "doc_id", "text",
          sampleMod = 5L, sampleCap = 1000)
          .orderBy(col("doc_id")),
      Some("""WITH tk AS (
                SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
                FROM documents
              ),
              bg AS (
                SELECT doc_id,
                  unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1])) AS bigram
                FROM tk WHERE len(toks) >= 2
              ),
              c2 AS (SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY bigram),
              c1 AS (SELECT split_part(bigram, ' ', 1) AS prefix,
                            CAST(SUM(c2) AS BIGINT) AS c1
                     FROM c2 GROUP BY 1),
              p AS (SELECT bigram, CAST(c2 AS DOUBLE) / c1 AS p
                    FROM c2 JOIN c1 ON split_part(c2.bigram, ' ', 1) = c1.prefix),
              scored AS (
                SELECT bg.doc_id,
                  CAST(SUM(CAST(p AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS fluency
                FROM bg JOIN p USING (bigram)
                GROUP BY bg.doc_id
              ),
              samp AS (
                SELECT doc_id, fluency FROM scored
                WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                      AS BIGINT) % 5 = 0
                ORDER BY doc_id LIMIT 1000
              ),
              rk AS (
                SELECT fluency,
                  ROW_NUMBER() OVER (ORDER BY fluency, doc_id) AS rn,
                  COUNT(*) OVER () AS k
                FROM samp
              ),
              th AS (
                SELECT
                  MIN(CASE WHEN rn = (k + 2) // 3 THEN fluency END) AS t1,
                  MIN(CASE WHEN rn = (2 * k + 2) // 3 THEN fluency END) AS t2
                FROM rk
              )
              SELECT d.doc_id, s.fluency,
                CASE WHEN s.fluency > th.t2 THEN 'head'
                     WHEN s.fluency > th.t1 THEN 'middle'
                     ELSE 'tail' END AS bucket
              FROM documents d LEFT JOIN scored s USING (doc_id)
              CROSS JOIN th ORDER BY d.doc_id""")),

    // Train/test split-leakage audit: near-dup pairs (MinHash candidates
    // + exact Jaccard verify) classified by each side's deterministic
    // split — the eval-contamination check every pretraining pipeline
    // runs before freezing a test set. The split is a pure function of
    // the id (Curation.splitOf), so the pair frame never joins back to
    // the corpus. The verified pair table LANDS (it is the audit
    // artifact) and the two distinct-doc counts decompose into keyed
    // pre-rollups over the landed file — never a countDistinct Expand
    // over the pair stream, which triples an already output-bound
    // shuffle (measured: the Expand form ran 1.5× the minhash gate at
    // ×100; this form adds two collapsing scans of the parquet).
    // Candidates are materialized too; the oracle re-verifies the
    // Jaccard from raw text and recomputes the split ladder
    // independently.
    QueryDef(
      "l_split_leakage",
      (s, d) => {
        val docs = docsWithNearDups(s, d)
        val cands = materialize(
          Dedup.minHashCandidates(docs, "doc_id", "text",
            n = 2, bands = 8, rowsPerBand = 8),
          "leak_cands")
        val pairs = materialize(
          Dedup.verifyJaccard(cands, docs, "doc_id", "text", n = 2,
              threshold = 0.7)
            .select(col("id_a"), col("id_b"),
              Curation.splitOf(col("id_a")).as("split_a"),
              Curation.splitOf(col("id_b")).as("split_b")),
          "leak_pairs")
        val gb = Seq(col("split_a"), col("split_b"))
        val da = pairs.groupBy(gb :+ col("id_a"): _*)
          .agg(count(lit(1)).as("__c"))
          .groupBy(gb: _*)
          .agg(sum(col("__c")).cast("long").as("n_pairs"),
            count(lit(1)).as("n_docs_a"))
        val db = pairs.groupBy(gb :+ col("id_b"): _*)
          .agg(count(lit(1)).as("__c"))
          .groupBy(gb: _*)
          .agg(count(lit(1)).as("n_docs_b"))
        da.join(db, Seq("split_a", "split_b"))
          .withColumn("leaky", col("split_a") =!= col("split_b"))
          .orderBy(col("split_a"), col("split_b"))
      },
      Some(s"""WITH docs AS (
                 SELECT doc_id, text FROM documents
                 UNION ALL SELECT doc_id + 20000, text || ' graftmarker' FROM documents
               ),
               sh AS (SELECT doc_id, ${bigramSql("text")} AS sh FROM docs),
               c AS (SELECT id_a, id_b
                     FROM read_parquet('$OracleScratch/leak_cands/*.parquet')),
               v AS (
                 SELECT c.id_a, c.id_b
                 FROM c JOIN sh a ON a.doc_id = c.id_a
                        JOIN sh b ON b.doc_id = c.id_b
                 WHERE CAST(LEN(LIST_INTERSECT(a.sh, b.sh)) AS DOUBLE) /
                   NULLIF(LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))), 0) >= 0.7
               ),
               sp AS (
                 SELECT id_a, id_b,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(id_a AS VARCHAR)), 1, 4)) AS INT) / 65536.0e0 < 0.9e0 THEN 'train'
                        WHEN CAST(('0x' || substr(md5(CAST(id_a AS VARCHAR)), 1, 4)) AS INT) / 65536.0e0 < 0.95e0 THEN 'val'
                        ELSE 'test' END AS split_a,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(id_b AS VARCHAR)), 1, 4)) AS INT) / 65536.0e0 < 0.9e0 THEN 'train'
                        WHEN CAST(('0x' || substr(md5(CAST(id_b AS VARCHAR)), 1, 4)) AS INT) / 65536.0e0 < 0.95e0 THEN 'val'
                        ELSE 'test' END AS split_b
                 FROM v
               )
               SELECT split_a, split_b, COUNT(*) AS n_pairs,
                 COUNT(DISTINCT id_a) AS n_docs_a,
                 COUNT(DISTINCT id_b) AS n_docs_b,
                 split_a != split_b AS leaky
               FROM sp GROUP BY split_a, split_b
               ORDER BY split_a, split_b""")),

    // Domain-rebalance plan (the Pile/Gopher mixture table): per-domain
    // token counts → sampling rate / epochs toward an equal per-domain
    // share of a half-corpus budget, epochs capped at 4 (the published
    // guardrail). One map-side-partial groupBy + a 1-row broadcast.
    QueryDef(
      "l_domain_balance",
      (s, d) =>
        Curation.domainBalance(
          t(s, d, "documents"), "source", "text",
          budgetDenom = 2L, maxEpochs = 4.0)
          .orderBy(col("source")),
      Some("""WITH d AS (
                SELECT source, COUNT(*) AS n_docs,
                  CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
                FROM documents GROUP BY source
              ),
              t AS (
                SELECT CAST(SUM(n_tokens) AS BIGINT) AS t_total,
                       COUNT(*) AS n_domains
                FROM d
              )
              SELECT source, n_docs, n_tokens,
                t_total // (2 * n_domains) AS target_tokens,
                LEAST(1.0e0, CAST(t_total // (2 * n_domains) AS DOUBLE)
                  / n_tokens) AS sample_rate,
                LEAST(4.0e0, CAST(t_total // (2 * n_domains) AS DOUBLE)
                  / n_tokens) AS epochs
              FROM d, t ORDER BY source""")),

    // Collocation mining: top-30 token pairs by lift (PMI's argument —
    // same ranking, no cross-engine transcendental), count-floored
    // before the vocab-grain joins. Phrase-vocabulary prep.
    QueryDef(
      "l_collocations",
      (s, d) =>
        TextAnalysis.collocations(t(s, d, "documents"), "text",
          topK = 30, minCount = 5L),
      Some("""WITH tk AS (
                SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
                FROM documents
              ),
              uni AS (SELECT unnest(toks) AS tok FROM tk),
              u AS (SELECT tok, COUNT(*) AS c1 FROM uni
                    WHERE len(tok) > 0 GROUP BY tok),
              bg AS (
                SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                  i -> toks[i] || ' ' || toks[i+1])) AS bigram
                FROM tk WHERE len(toks) >= 2
              ),
              c2 AS (
                SELECT bigram, COUNT(*) AS c2 FROM bg
                GROUP BY bigram HAVING COUNT(*) >= 5
              ),
              tot AS (
                SELECT (SELECT CAST(SUM(c1) AS BIGINT) FROM u) AS t_u,
                       (SELECT COUNT(*) FROM bg) AS t_b
              )
              SELECT c2.bigram, c2.c2 AS n_pair,
                (CAST(c2.c2 AS DOUBLE) / t_b) /
                ((CAST(a.c1 AS DOUBLE) / t_u) * (CAST(b.c1 AS DOUBLE) / t_u))
                  AS lift
              FROM c2 JOIN u a ON split_part(c2.bigram, ' ', 1) = a.tok
                      JOIN u b ON split_part(c2.bigram, ' ', 2) = b.tok, tot
              ORDER BY lift DESC NULLS LAST, bigram ASC LIMIT 30""")),

    // Domain-rebalance EXECUTION: materialize the l_domain_balance plan
    // — downsample heavy domains by salted id-hash, repeat light ones
    // for ⌊epochs⌋ passes + a deterministic fractional-pass subset —
    // and report the achieved per-domain mixture. Selection is a pure
    // function of the doc id, so the oracle re-derives the SAME corpus
    // and the achieved counts exact-match (no noise tolerance).
    QueryDef(
      "l_domain_resample",
      (s, d) => {
        val docs = t(s, d, "documents")
        val out = Curation.resampleToBalance(docs, "doc_id", "source", "text")
        out.groupBy(col("source"))
          .agg(count(lit(1)).as("n_rows_out"),
            sum(TextAnalysis.tokenCount(col("text")).cast(LongType))
              .cast(LongType).as("n_tokens_out"),
            max(col("epoch")).cast(LongType).as("max_epoch"))
          .join(broadcast(
            Curation.domainBalance(docs, "source", "text")
              .select(col("source"), col("target_tokens"))), Seq("source"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (
                SELECT source,
                  CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
                FROM documents GROUP BY source
              ),
              t AS (
                SELECT CAST(SUM(n_tokens) AS BIGINT) AS t_total,
                       COUNT(*) AS n_domains
                FROM d
              ),
              p AS (
                SELECT source, n_tokens,
                  t_total // (2 * n_domains) AS target,
                  LEAST(4.0e0, CAST(t_total // (2 * n_domains) AS DOUBLE)
                    / n_tokens) AS ep
                FROM d, t
              ),
              docs AS (
                SELECT doc_id, source,
                  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS tok
                FROM documents
              ),
              j AS (
                SELECT doc_id, source, tok,
                  CAST(FLOOR(ep) AS INT) +
                    CASE WHEN (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|resample'), 1, 15)) AS BIGINT) + 1.0) / 1152921504606846976.0
                              <= ep - FLOOR(ep) THEN 1 ELSE 0 END AS copies
                FROM docs JOIN p USING (source)
              ),
              e AS (
                SELECT source, tok,
                  unnest(generate_series(1, copies)) AS epoch
                FROM j WHERE copies > 0
              )
              SELECT e.source, COUNT(*) AS n_rows_out,
                CAST(SUM(tok) AS BIGINT) AS n_tokens_out,
                CAST(MAX(epoch) AS BIGINT) AS max_epoch,
                p.target AS target_tokens
              FROM e JOIN p ON e.source = p.source
              GROUP BY e.source, p.target ORDER BY e.source""")),

    // End-to-end curation funnel: the per-stage survivor counts of the
    // standard pretraining pipeline — exact dedup → language-ID →
    // Gopher quality rules → train split — computed in ONE pass with a
    // single shuffle (the fingerprint window); each stage is a boolean
    // conjunction over per-doc flags, so the funnel costs one scan no
    // matter how many stages it reports. The funnel is the audit
    // artifact every dataset release publishes (survivor counts per
    // filter), and it pins the COMPOSITION of the individually-gated
    // operators cross-engine.
    QueryDef(
      "l_pipeline_funnel",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__fp"))
        t(s, d, "documents")
          .withColumn("__fp", TextAnalysis.fingerprint(col("text")))
          .withColumn("__keep_dedup",
            col("doc_id") === min(col("doc_id")).over(w))
          .withColumn("__is_en",
            TextAnalysis.languageId(col("text")) === "en")
          .withColumn("__ok_quality",
            Curation.gopherKeep(col("text"), minWords = 30))
          .withColumn("__is_train",
            Curation.splitOf(col("doc_id")) === "train")
          .agg(
            count(lit(1)).as("raw"),
            sum(when(col("__keep_dedup"), 1L).otherwise(0L)).as("s1"),
            sum(when(col("__keep_dedup") && col("__is_en"), 1L)
              .otherwise(0L)).as("s2"),
            sum(when(col("__keep_dedup") && col("__is_en") &&
              col("__ok_quality"), 1L).otherwise(0L)).as("s3"),
            sum(when(col("__keep_dedup") && col("__is_en") &&
              col("__ok_quality") && col("__is_train"), 1L)
              .otherwise(0L)).as("s4"))
          .select(expr(
            """stack(5,
               1, 'raw',         raw,
               2, 'exact_dedup', s1,
               3, 'lang_en',     s2,
               4, 'quality',     s3,
               5, 'train_split', s4) AS (stage_order, stage, n_docs)"""))
          .orderBy(col("stage_order"))
      },
      Some("""WITH n AS (
                SELECT doc_id, text, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
                FROM documents
              ),
              f AS (
                SELECT doc_id, text, norm, md5(norm) AS fp,
                  string_split(norm, ' ') AS toks,
                  CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['the','a','of','and','to','in','is','it','that','was'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_en,
                  CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','zu'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_de,
                  CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['le','la','les','et','est','un','une','pas','avec','pour'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_fr,
                  CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['el','la','los','y','es','un','una','no','con','para'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_es
                FROM n
              ),
              g AS (
                SELECT doc_id, fp,
                  doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS keep_dedup,
                  (CASE WHEN (s_en + s_de + s_fr + s_es) > 0 THEN
                     CASE WHEN s_es > GREATEST(s_en, s_de, s_fr) THEN 'es'
                          WHEN s_fr > GREATEST(s_en, s_de) THEN 'fr'
                          WHEN s_de > s_en THEN 'de'
                          ELSE 'en' END
                   ELSE 'und' END) = 'en' AS is_en,
                  (len(toks) BETWEEN 30 AND 100000
                   AND (length(replace(norm, ' ', '')) / CAST(len(toks) AS DOUBLE)) BETWEEN 3.0e0 AND 10.0e0
                   AND (len(regexp_extract_all(text, '#|\.\.\.|…')) / CAST(len(toks) AS DOUBLE)) < 0.1e0
                   AND (len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) / CAST(len(toks) AS DOUBLE)) > 0.8e0
                   AND len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it','that','was'], x))) >= 2
                  ) AS ok_quality,
                  (CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) / 65536.0e0 < 0.9e0 THEN 'train'
                        WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) / 65536.0e0 < 0.95e0 THEN 'val'
                        ELSE 'test' END) = 'train' AS is_train
                FROM f
              ),
              c AS (
                SELECT COUNT(*) AS raw,
                  SUM(CASE WHEN keep_dedup THEN 1 ELSE 0 END) AS s1,
                  SUM(CASE WHEN keep_dedup AND is_en THEN 1 ELSE 0 END) AS s2,
                  SUM(CASE WHEN keep_dedup AND is_en AND ok_quality THEN 1 ELSE 0 END) AS s3,
                  SUM(CASE WHEN keep_dedup AND is_en AND ok_quality AND is_train THEN 1 ELSE 0 END) AS s4
                FROM g
              )
              SELECT CAST(1 AS INT) AS stage_order, 'raw' AS stage, CAST(raw AS BIGINT) AS n_docs FROM c
              UNION ALL SELECT 2, 'exact_dedup', CAST(s1 AS BIGINT) FROM c
              UNION ALL SELECT 3, 'lang_en', CAST(s2 AS BIGINT) FROM c
              UNION ALL SELECT 4, 'quality', CAST(s3 AS BIGINT) FROM c
              UNION ALL SELECT 5, 'train_split', CAST(s4 AS BIGINT) FROM c
              ORDER BY stage_order""")),

    // C4-style boilerplate REMOVAL (the rewrite on top of
    // l_passage_dedup's detector): hot lines (planted into ~1/3 of docs
    // at the end and ~1/5 at the front — order preservation is under
    // test) are stripped and each doc's remaining lines reassemble in
    // original order; the cleaned text is hash-pinned per doc.
    QueryDef(
      "l_boilerplate_strip",
      (s, d) => {
        val planted = t(s, d, "documents")
          .withColumn("text",
            when(col("doc_id") % 3 === 0,
              concat(col("text"),
                lit("\nsubscribe to our newsletter for updates today")))
              .otherwise(col("text")))
          .withColumn("text",
            when(col("doc_id") % 5 === 0,
              concat(lit("follow us on social media for more content\n"),
                col("text")))
              .otherwise(col("text")))
        Dedup.stripBoilerplate(planted, "doc_id", "text",
            minChars = 20, minDocs = 2)
          .orderBy(col("doc_id"))
      },
      Some("""WITH docs AS (
                SELECT doc_id,
                CASE WHEN doc_id % 5 = 0
                     THEN 'follow us on social media for more content' || chr(10) ||
                          (CASE WHEN doc_id % 3 = 0
                                THEN text || chr(10) || 'subscribe to our newsletter for updates today'
                                ELSE text END)
                     WHEN doc_id % 3 = 0
                     THEN text || chr(10) || 'subscribe to our newsletter for updates today'
                     ELSE text END AS text
                FROM documents
              ),
              parts AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs),
              lines AS (
                SELECT doc_id, unnest(ls) AS line,
                generate_subscripts(ls, 1) AS pos FROM parts
              ),
              norm AS (
                SELECT doc_id, pos, line,
                trim(regexp_replace(lower(line), '\s+', ' ', 'g')) AS nline
                FROM lines
              ),
              hot AS (
                SELECT md5(nline) AS fp FROM norm WHERE length(nline) >= 20
                GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
              ),
              kept AS (
                SELECT n.doc_id, n.pos, n.line FROM norm n
                LEFT JOIN hot h
                ON (CASE WHEN length(n.nline) >= 20 THEN md5(n.nline) END) = h.fp
                WHERE h.fp IS NULL
              ),
              recon AS (
                SELECT doc_id, COUNT(*) AS n_kept,
                string_agg(line, chr(10) ORDER BY pos) AS cleaned
                FROM kept GROUP BY doc_id
              ),
              base AS (
                SELECT doc_id,
                CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines
                FROM docs
              )
              SELECT b.doc_id, b.n_lines,
              b.n_lines - COALESCE(r.n_kept, 0) AS n_removed,
              md5(COALESCE(r.cleaned, '')) AS cleaned_md5
              FROM base b LEFT JOIN recon r USING (doc_id)
              ORDER BY b.doc_id""")),

    // Corpus snapshot diff: old = documents; new = documents minus the
    // %7 slice (removed), with the %5 slice edited (changed) and a %11
    // shadow slice appended under shifted ids (added). The per-doc
    // status table is the primer for incremental reprocessing.
    QueryDef(
      "l_corpus_diff",
      (s, d) => {
        val docs = t(s, d, "documents")
        val newDocs = docs.filter(col("doc_id") % 7 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
          .unionByName(docs.filter(col("doc_id") % 11 === 0)
            .select((col("doc_id") + 30000).as("doc_id"), col("text"),
              col("lang"), col("source"), col("n_chars")))
        Curation.corpusDiff(docs, newDocs, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""WITH o AS (
                SELECT doc_id, md5(COALESCE(text, '')) AS old_md5 FROM documents
              ),
              nw AS (
                SELECT doc_id,
                md5(COALESCE(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END, '')) AS new_md5
                FROM documents WHERE doc_id % 7 <> 0
                UNION ALL
                SELECT doc_id + 30000, md5(COALESCE(text, '')) FROM documents WHERE doc_id % 11 = 0
              )
              SELECT COALESCE(o.doc_id, nw.doc_id) AS doc_id,
              old_md5, new_md5,
              CASE WHEN old_md5 IS NULL THEN 'added'
                   WHEN new_md5 IS NULL THEN 'removed'
                   WHEN old_md5 = new_md5 THEN 'unchanged'
                   ELSE 'changed' END AS status
              FROM o FULL JOIN nw ON o.doc_id = nw.doc_id
              ORDER BY doc_id""")),

    // Tokenizer fertility per detected language: BPE-ish tokens per
    // whitespace word and characters per token — the per-language
    // tokenizer-evaluation table behind vocab budgeting.
    QueryDef(
      "l_fertility",
      (s, d) =>
        TextAnalysis.tokenizerFertility(t(s, d, "documents"), "text")
          .orderBy(col("lang")),
      Some("""WITH scored AS (
                SELECT text,
                CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['the','a','of','and','to','in','is','it','that','was'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_en,
                CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','zu'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_de,
                CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['le','la','les','et','est','un','une','pas','avec','pour'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_fr,
                CAST(len(list_filter(string_split(trim(lower(text)), ' '), t -> list_contains(['el','la','los','y','es','un','una','no','con','para'], t))) AS DOUBLE) / NULLIF(len(string_split(trim(lower(text)), ' ')), 0) AS s_es
                FROM documents
              ),
              tagged AS (
                SELECT
                CASE WHEN (s_en + s_de + s_fr + s_es) > 0 THEN
                  CASE WHEN s_es > GREATEST(s_en, s_de, s_fr) THEN 'es'
                       WHEN s_fr > GREATEST(s_en, s_de) THEN 'fr'
                       WHEN s_de > s_en THEN 'de'
                       ELSE 'en' END
                ELSE 'und' END AS lang,
                CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS ws,
                CAST(len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]')) AS BIGINT) AS bpe,
                CAST(length(text) AS BIGINT) AS chars
                FROM scored
              )
              SELECT lang, COUNT(*) AS n_docs,
              CAST(SUM(ws) AS BIGINT) AS ws_tokens,
              CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
              CAST(SUM(chars) AS BIGINT) AS n_chars,
              CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE) AS fertility,
              CAST(SUM(chars) AS DOUBLE) / CAST(SUM(bpe) AS DOUBLE) AS chars_per_token
              FROM tagged GROUP BY lang ORDER BY lang""")),

    // Epoch plan for a published mixture under a global token budget:
    // exactly-representable target fractions (.5/.25/.125/.125) so the
    // plan's doubles reproduce cross-engine; the 8000-token budget puts
    // the four sources in three different regimes (repeat, partial
    // repeat, downsample).
    QueryDef(
      "l_epoch_plan",
      (s, d) =>
        Curation.epochPlan(t(s, d, "documents"), "source", "text",
            Map("src0" -> 0.5, "src1" -> 0.25,
              "src2" -> 0.125, "src3" -> 0.125),
            budgetTokens = 8000L, maxEpochs = 4.0)
          .orderBy(col("source")),
      Some("""WITH t(source, target_frac) AS (
                VALUES ('src0', 0.5e0), ('src1', 0.25e0),
                       ('src2', 0.125e0), ('src3', 0.125e0)
              ),
              agg AS (
                SELECT source, COUNT(*) AS n_docs,
                CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
                FROM documents GROUP BY source
              )
              SELECT a.source, a.n_docs, a.n_tokens, t.target_frac,
              CAST(FLOOR(CAST(8000 AS DOUBLE) * t.target_frac) AS BIGINT) AS target_tokens,
              LEAST(1.0e0, CAST(FLOOR(CAST(8000 AS DOUBLE) * t.target_frac) AS DOUBLE) / CAST(a.n_tokens AS DOUBLE)) AS sample_rate,
              LEAST(4.0e0, CAST(FLOOR(CAST(8000 AS DOUBLE) * t.target_frac) AS DOUBLE) / CAST(a.n_tokens AS DOUBLE)) AS epochs,
              CAST(FLOOR(LEAST(CAST(FLOOR(CAST(8000 AS DOUBLE) * t.target_frac) AS DOUBLE), CAST(a.n_tokens AS DOUBLE) * 4.0e0)) AS BIGINT) AS planned_tokens
              FROM agg a JOIN t USING (source) ORDER BY a.source"""))
  )
}
