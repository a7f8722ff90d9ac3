package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.TextAnalysis.{normalize, tokens}

/** Full-text retrieval over the corpus: inverted index + BM25 top-k
  * (Robertson & Spärck Jones; the BM25 form in Robertson & Zaragoza
  * 2009, "The Probabilistic Relevance Framework"). The data-curation
  * uses: mining documents relevant to a target domain (DSIR-style
  * seeding), building retrieval training pairs, and RAG-corpus serving.
  *
  * Scale design — the classic search-engine layout, expressed as Spark
  * tables:
  *
  *   - The INDEX is built once (three keyed shuffles over the corpus:
  *     doc-grain term frequencies, doc lengths, term document
  *     frequencies) and materialized; queries never re-scan the corpus.
  *     `dl` and `df_t` are DENORMALIZED into the posting rows exactly so
  *     query-time scoring touches ONE table.
  *   - A query batch broadcasts its (query, term) pairs into the
  *     postings scan, so the corpus-sized side is filtered to the query
  *     vocabulary's postings before anything else happens. Per-term
  *     posting lists are the unit of work — never doc × query.
  *   - `dfCap` is the skew lever: a stopword-like term whose posting
  *     list is a large fraction of the corpus contributes near-zero BM25
  *     (idf → 0) but costs a corpus-sized candidate set; capping df
  *     drops those terms BEFORE their postings are read (the filter
  *     pushes into the index scan).
  *   - Scores per (query, doc) sum with map-side partials, and the
  *     top-k cut is [[graft.functions.TopKStructs]] — a bounded heap per
  *     (query, partition), never a per-query window sort.
  */
object Retrieval {

  /** Build the inverted index: one row per (token, doc) with the term
    * frequency, the doc's token length `dl`, and the term's document
    * frequency `df_t` denormalized in (the dictionary folded into the
    * postings — query-time scoring reads one table). Docs with no
    * tokens don't index (they can never match). Build cost: one
    * doc-grain census + two keyed joins, paid ONCE; materialize the
    * result (partitioned/bucketed by token for posting-list locality)
    * and serve query batches from the parquet. */
  def invertedIndex(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFrequencies(df, idCol, textCol)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dft = tf.groupBy(col("token")).agg(count(lit(1)).as("df_t"))
    tf.join(dl, "doc_id").join(dft, "token")
      .select(col("token"), col("doc_id"), col("tf"), col("dl"),
        col("df_t"))
  }

  /** (doc_id, token, tf) term frequencies — THE index-side
    * tokenization, shared by the batch index build and the streaming
    * segment maintenance ([[graft.streaming.StreamingCorpus
    * .applyIndexBatch]]) so the two can never drift; [[queryTerms]]
    * mirrors it on the query side. */
  private[graft] def termFrequencies(
      df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(tokens(normalize(col(textCol)))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** One-row corpus statistics for BM25: document count and total token
    * length (avgdl stays a RATIO of these exact integers — the score
    * expression divides once, so every engine reproduces it bit for
    * bit). Computed from the index's doc grain; materialize alongside
    * the index. */
  def corpusStats(postings: DataFrame): DataFrame =
    postings.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))

  /** BM25 top-k retrieval for a query batch against a built index.
    *
    * Score per (query, doc): Σ_terms qtf · idf(t) · tf-norm(t, d) with
    * the standard tf saturation tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    * `idf` defaults to the RAW Robertson ratio (N − df + ½)/(df + ½) —
    * the same exact-rational discipline as tf-idf here (a transcendental
    * log would not hash-match across engines; the log is monotone in the
    * ratio, so single-term rankings agree and multi-term rankings are
    * the documented trade). `logIdf = true` applies ln(1 + ratio) —
    * textbook BM25+, for in-engine use where cross-engine bit-parity
    * doesn't gate. Per-(query, doc) contributions decimal-accumulate
    * (order-independent), ranking compares the EXACT decimal score with
    * doc_id as the deterministic tie-break, and the emitted `score` is
    * the decimal cast to double.
    *
    * Plan: broadcast the (query, term, qtf) table into the postings
    * scan (`df_t <= dfCap` pushes down first), one (query, doc)-grain
    * shuffle with map-side partial sums, one bounded-heap top-k
    * aggregate per query. Nothing sorts more than k rows per group. */
  def bm25TopK(
      postings: DataFrame, stats: DataFrame, queries: DataFrame,
      qidCol: String, qtextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      dfCap: Long = Long.MaxValue, logIdf: Boolean = false): DataFrame = {
    val cands = postings
      .filter(col("df_t") <= dfCap)
      .join(broadcast(queryTerms(queries, qidCol, qtextCol)), "token")
      .crossJoin(broadcast(stats))
    scoreAndTopK(cands, k, k1, b, logIdf)
  }

  /** BM25 top-k against a SEGMENTED live index — postings WITHOUT the
    * denormalized `df_t`, plus a separate (token, df_t) dictionary. This
    * is the continuously-maintained layout ([[graft.streaming
    * .StreamingCorpus.startIndexMaintenance]]): posting segments are
    * immutable per ingest batch while `df_t` churns with EVERY batch, so
    * the dictionary lives apart exactly as search engines keep it (df
    * summed across segments). The query terms join the dictionary FIRST
    * (vocab-grain, query side tiny) and `dfCap` filters there — a
    * stopword-grade term is dropped before its posting lists are ever
    * read, the same property the denormalized layout gets from
    * pushdown. */
  def bm25TopKWithDict(
      postings: DataFrame, dict: DataFrame, stats: DataFrame,
      queries: DataFrame, qidCol: String, qtextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      dfCap: Long = Long.MaxValue, logIdf: Boolean = false): DataFrame = {
    // the query-term table broadcasts INTO the vocab-sized dictionary
    // scan (mirroring bm25TopK's broadcast into postings) — never a
    // dictionary shuffle per query batch
    val qdf = dict
      .join(broadcast(queryTerms(queries, qidCol, qtextCol)), "token")
      .filter(col("df_t") <= dfCap)
    val cands = postings
      .join(broadcast(qdf), "token")
      .crossJoin(broadcast(stats))
    scoreAndTopK(cands, k, k1, b, logIdf)
  }

  /** (query_id, token, qtf) for a query batch — same tokenization as the
    * index side. */
  private def queryTerms(
      queries: DataFrame, qidCol: String, qtextCol: String): DataFrame =
    queries
      .select(col(qidCol).as("query_id"),
        explode(tokens(normalize(col(qtextCol)))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("query_id"), col("token"))
      .agg(count(lit(1)).as("qtf"))

  /** Shared scoring tail: candidates carrying (query_id, doc_id, qtf,
    * tf, dl, df_t, n_docs, total_len) → decimal-accumulated (query, doc)
    * scores → bounded-heap top-k. */
  private def scoreAndTopK(
      cands: DataFrame, k: Int, k1: Double, b: Double,
      logIdf: Boolean): DataFrame = {
    require(k >= 1, s"top-k needs k >= 1, got $k")
    val ratio = (col("n_docs") - col("df_t") + lit(0.5)) /
      (col("df_t") + lit(0.5))
    val idf = if (logIdf) log1p(ratio) else ratio
    val tfNorm = (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * ((col("dl") * col("n_docs")).cast(DoubleType) /
          col("total_len"))))
    val scores = cands
      .select(col("query_id"), col("doc_id"),
        (col("qtf").cast(DoubleType) * idf * tfNorm).as("contrib"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib").cast(DecimalType(38, 12))).as("sd"))
    scores
      .groupBy(col("query_id"))
      .agg(graft.functions.F.topKStructs(
        struct(col("sd"), col("doc_id")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "r")))
      .select(col("query_id"), (col("i") + 1).cast(IntegerType).as("rank"),
        col("r.doc_id").as("doc_id"),
        col("r.sd").cast(DoubleType).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** POSITIONAL inverted index: (token, doc_id, positions) with 1-based
    * token positions sorted ascending — the layout phrase/proximity
    * search needs. Same one doc-grain shuffle as [[invertedIndex]]
    * (positions collect within the (token, doc) group, bounded by the
    * doc's own length). Materialize partitioned or bucketed by token so
    * a phrase query's per-term lookups prune to their posting files. */
  def positionalIndex(
      df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(tokens(normalize(col(textCol)))).as(Seq("pos0", "token")))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos0") + 1)).as("positions"))

  /** Exact phrase search over a positional index: docs containing the
    * terms CONSECUTIVELY, with the match count. Each term's postings are
    * a point token lookup (partition-pruned on a materialized index);
    * the per-term posting sets then equi-join on doc_id — a doc survives
    * only if it holds every term, so the join chain shrinks
    * monotonically — and the consecutive test is pure array arithmetic
    * inside codegen: a start position p matches when term i's list
    * contains p + i for every i. Nothing ever rescans text, and the
    * work is proportional to the PHRASE TERMS' posting lists, not the
    * corpus. */
  def phraseMatches(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase needs at least one term")
    val parts = phrase.map(normTerm).zipWithIndex.map { case (term, i) =>
      index.filter(col("token") === lit(term))
        .select(col("doc_id"), col("positions").as(s"p$i"))
    }
    val joined = parts.reduce((a, b) => a.join(b, "doc_id"))
    val matchStarts = (1 until phrase.length).foldLeft(col("p0")) {
      (acc, i) => filter(acc, p => array_contains(col(s"p$i"), p + lit(i)))
    }
    joined
      .select(col("doc_id"), size(matchStarts).as("match_count"))
      .filter(col("match_count") > 0)
  }

  /** Driver-side mirror of the index tokenization for single terms —
    * the index stores `tokens(normalize(text))` (lowercased, trimmed),
    * so raw caller terms must normalize the same way or a cased term
    * would silently match nothing. */
  private def normTerm(t: String): String = {
    val n = t.trim.toLowerCase
    require(n.nonEmpty && !n.exists(_.isWhitespace),
      s"a search term must be one non-empty token, got '$t'")
    n
  }

  /** Pair proximity search (the IR `NEAR/n` operator) over a positional
    * index: docs where `termA` occurs within `window` tokens of `termB`
    * (either order), with the count of such anchor positions of
    * `termA`. Same plan as [[phraseMatches]] — two point lookups, one
    * doc_id equi-join, and the window test is array arithmetic in
    * codegen (for each position of A, does B hold a position within
    * ±window) — work ∝ the two terms' posting lists. */
  def proximityMatches(
      index: DataFrame, termA: String, termB: String,
      window: Int): DataFrame = {
    require(window >= 1, s"NEAR window must be >= 1, got $window")
    val a = index.filter(col("token") === lit(normTerm(termA)))
      .select(col("doc_id"), col("positions").as("pa"))
    val b = index.filter(col("token") === lit(normTerm(termB)))
      .select(col("doc_id"), col("positions").as("pb"))
    a.join(b, "doc_id")
      .select(col("doc_id"),
        size(filter(col("pa"), p =>
          exists(col("pb"), q =>
            abs(q - p) <= window && q =!= p))).as("match_count"))
      .filter(col("match_count") > 0)
  }

  /** HYBRID retrieval — the RAG-standard two-stage pipeline: BM25 over
    * the inverted index recalls `recallN` lexical candidates per query,
    * an embedding cosine re-ranks EXACTLY that candidate set, and
    * Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009 — public)
    * fuses the two orderings: rrf = 1/(rrfK + bm25_rank) +
    * 1/(rrfK + cos_rank). RRF is rank-based, so the fused score is IEEE
    * division of exact integers — bit-reproducible cross-engine where a
    * score-mixing fusion would not be.
    *
    * Scale shape: stage 1 is [[bm25TopK]] (bounded-heap top-recallN);
    * stage 2 joins the ≤ queries×recallN candidate table to the vector
    * table on doc_id (keyed equi-join — the corpus-sized side is
    * touched only for candidate ids) and broadcasts the query vectors;
    * the re-rank windows partition per query over ≤ recallN rows, so no
    * executor ever sorts more than one query's candidates. Candidates
    * without a doc vector drop (inner join) — re-ranking needs the
    * vector by construction — and a QUERY missing from `qvecs` drops
    * entirely (its BM25 results included): a fused ranking cannot be
    * computed without the query embedding, and emitting stage-1-only
    * rows would silently mix ranking semantics per query. Run
    * [[bm25TopK]] directly for lexical-only queries. */
  def hybridTopK(
      postings: DataFrame, stats: DataFrame,
      queries: DataFrame, qidCol: String, qtextCol: String,
      qvecs: DataFrame, qvecIdCol: String, qvecCol: String,
      docVecs: DataFrame, dvecIdCol: String, dvecCol: String,
      k: Int, recallN: Int = 50, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75,
      dfCap: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && recallN >= k,
      s"need recallN >= k >= 1, got k=$k recallN=$recallN")
    val recall = bm25TopK(postings, stats, queries, qidCol, qtextCol,
        recallN, k1, b, dfCap)
      .select(col("query_id"), col("rank").as("bm25_rank"), col("doc_id"))
    // the recall table is ≤ queries × recallN rows by construction but
    // carries no stats — hint the broadcast so the corpus-sized vector
    // table is probed for candidate ids, never shuffled
    val withCos = broadcast(recall)
      .join(docVecs.select(col(dvecIdCol).as("doc_id"),
        col(dvecCol).as("__dv")), "doc_id")
      .join(broadcast(qvecs.select(col(qvecIdCol).as("query_id"),
        col(qvecCol).as("__qv"))), "query_id")
      .withColumn("cosine",
        graft.functions.F.cosineSim(col("__qv"), col("__dv")))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(desc_nulls_last("cosine"), asc_nulls_last("doc_id"))
    val fused = withCos
      .withColumn("cos_rank", row_number().over(wc))
      .withColumn("rrf_score",
        lit(1.0) / (lit(rrfK) + col("bm25_rank")) +
          lit(1.0) / (lit(rrfK) + col("cos_rank")))
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(desc("rrf_score"), asc("doc_id"))
    fused
      .withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(IntegerType).as("rank"),
        col("doc_id"), col("bm25_rank"), col("cos_rank").cast(IntegerType)
          .as("cos_rank"), col("rrf_score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Materialize a posting table (from [[invertedIndex]] or
    * [[positionalIndex]]) hash-bucketed by token into hive partitions,
    * so a query's per-term lookups PRUNE to ≤ |distinct terms| posting
    * directories instead of scanning the index — the same
    * partition-pruned point-lookup discipline as the IVF probe
    * ([[Similarity.materializeIvf]]). Bucketing hashes rather than
    * partitioning by raw token because a web-scale vocabulary would
    * mean millions of tiny directories; `tokenBuckets` bounds the
    * directory count while a lookup still reads only its terms'
    * buckets. */
  def materializePostings(
      postings: DataFrame, path: String, tokenBuckets: Int = 64): Unit = {
    postings
      .withColumn("__tb", pmod(xxhash64(col("token")), lit(tokenBuckets)))
      .write.mode("overwrite").partitionBy("__tb").parquet(path)
    // the bucket count is part of the store's identity: a reader
    // hashing mod a DIFFERENT count would prune to the wrong
    // directories and silently find nothing — persist it alongside
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_token_buckets"),
      tokenBuckets.toString): Unit
  }

  /** Read only the posting buckets holding `terms` from a
    * [[materializePostings]] store. The bucket count comes from the
    * store's own `_token_buckets` marker (never a caller guess), the
    * `__tb IN (...)` filter is a partition filter — `.explain` shows
    * the scan pruned to the terms' directories (PlanSpec pins it) —
    * and the residual token equality re-applies on the read rows, so
    * bucket hashing is never a correctness dependency. Terms normalize
    * like the index side (lowercase/trim). */
  def readPostingsForTerms(
      spark: org.apache.spark.sql.SparkSession, path: String,
      terms: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64
    import org.apache.spark.sql.catalyst.expressions.Literal
    val tokenBuckets = java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "_token_buckets")).trim.toInt
    val bucketOf: String => Long = t => {
      // seed 42 = the default of the `xxhash64` SQL function used on
      // the write side
      val h = XxHash64(Seq(Literal.create(t,
        org.apache.spark.sql.types.StringType)), 42L).eval(null)
        .asInstanceOf[Long]
      ((h % tokenBuckets) + tokenBuckets) % tokenBuckets
    }
    val normed = terms.map(normTerm)
    val buckets = normed.map(bucketOf).distinct
    spark.read.parquet(path)
      .filter(col("__tb").isin(buckets: _*))
      .filter(col("token").isin(normed: _*))
      .drop("__tb")
  }

  /** Retriever-training triples from the lexical index — the standard
    * construction (Karpukhin et al. 2020, "Dense Passage Retrieval",
    * public): for each (query, positive) pair, the top BM25 candidates
    * that are NOT relevant become the hard negatives — lexically
    * confusable, semantically wrong, exactly the negatives that carry
    * gradient for a dense retriever ([[Similarity.hardNegatives]] is
    * the embedding-space analogue; this one needs no embeddings yet).
    *
    * Shapes: one [[bm25TopK]] recall (bounded heap), one anti-join
    * against the truth table (keyed), a per-query re-rank window over
    * ≤ recallN surviving rows, then positives × negatives per query —
    * bounded by n_pos · negPerQuery, the output's own size. */
  def trainingTriples(
      postings: DataFrame, stats: DataFrame,
      queries: DataFrame, qidCol: String, qtextCol: String,
      truth: DataFrame, negPerQuery: Int, recallN: Int = 50,
      k1: Double = 1.2, b: Double = 0.75,
      dfCap: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(negPerQuery >= 1 && recallN >= negPerQuery,
      s"need recallN >= negPerQuery >= 1, got $negPerQuery/$recallN")
    val tr = truth.select(col("query_id"), col("doc_id")).distinct()
    val recall = bm25TopK(postings, stats, queries, qidCol, qtextCol,
        recallN, k1, b, dfCap)
      .select(col("query_id"), col("rank").as("bm25_rank"), col("doc_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("bm25_rank"))
    val negs = recall
      .join(tr, Seq("query_id", "doc_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= negPerQuery)
      .select(col("query_id"), col("doc_id").as("neg_doc_id"),
        col("neg_rank"), col("bm25_rank"))
    tr.select(col("query_id"), col("doc_id").as("pos_doc_id"))
      .join(negs, "query_id")
      .select(col("query_id"), col("pos_doc_id"), col("neg_doc_id"),
        col("neg_rank").cast(IntegerType).as("neg_rank"),
        col("bm25_rank"))
      .orderBy(col("query_id"), col("pos_doc_id"), col("neg_rank"))
  }

  /** Distributed retrieval-quality evaluation: per query, precision@k,
    * recall@k, reciprocal rank, and average precision, from a predicted
    * ranking table and a relevance-truth table — the harness that
    * grades a retriever (BM25, ANN, hybrid) against ground truth AT
    * SCALE, instead of collecting rankings to a driver loop. All four
    * metrics are exact-rational (divisions of exact integers; AP's sum
    * decimal-accumulates), so the evaluation itself hash-verifies
    * cross-engine — nDCG is deliberately absent (its log2 discount is
    * a transcendental that wouldn't).
    *
    * Shapes: one keyed equi-join (predicted ∩ truth), a per-query
    * window over ≤ k hit rows, one query-grain aggregate. The output
    * anchors on predicted ∪ truth query ids, so BOTH failure shapes
    * keep a zeroed row: a query with predictions but no hits, AND a
    * query with truth the retriever never answered at all — silent
    * disappearance of either would read as "all queries scored". */
  def retrievalMetrics(
      predicted: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"metrics@k needs k >= 1, got $k")
    val p = predicted.filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"))
    val tr = truth.select(col("query_id"), col("doc_id")).distinct()
    val nrel = tr.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    val perQ = p.join(tr, Seq("query_id", "doc_id"))
      .withColumn("i", row_number().over(w))
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("hits"),
        min(col("rank")).as("first_rank"),
        sum((col("i").cast(DoubleType) / col("rank"))
          .cast(DecimalType(18, 12))).as("ap_num"))
    p.select(col("query_id"))
      .unionByName(tr.select(col("query_id"))).distinct()
      .join(perQ, Seq("query_id"), "left")
      .join(nrel, Seq("query_id"), "left")
      .select(
        col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast(DoubleType) / k)
          .as("precision_k"),
        when(col("n_rel").isNotNull && col("n_rel") > 0,
          coalesce(col("hits"), lit(0L)).cast(DoubleType) / col("n_rel"))
          .otherwise(lit(0.0)).as("recall_k"),
        when(col("first_rank").isNotNull, lit(1.0) / col("first_rank"))
          .otherwise(lit(0.0)).as("rr"),
        when(col("ap_num").isNotNull &&
            least(col("n_rel"), lit(k.toLong)) > 0,
          col("ap_num").cast(DoubleType) /
            least(col("n_rel"), lit(k.toLong)))
          .otherwise(lit(0.0)).as("ap"))
  }

  /** Convenience end-to-end form: build the index inline and retrieve.
    * For repeated query batches, build once with [[invertedIndex]] /
    * [[corpusStats]], materialize, and call [[bm25TopK]]. */
  def bm25TopKDirect(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      dfCap: Long = Long.MaxValue, logIdf: Boolean = false): DataFrame = {
    val idx = invertedIndex(docs, idCol, textCol)
    bm25TopK(idx, corpusStats(idx), queries, qidCol, qtextCol, k,
      k1, b, dfCap, logIdf)
  }
}
