package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Streaming ingest for the training-data pipeline (beyond-reference,
  * same spirit as [[StreamingTelemetry]]): documents arrive continuously,
  * get exact-deduped within a watermark horizon, quality/language gated,
  * and rolled up per source.
  *
  *   - exact dedup → `dropDuplicatesWithinWatermark` on the md5 text
  *     fingerprint: the batch hash-groupBy becomes a TTL'd state store,
  *     bounded by the watermark instead of corpus size;
  *   - quality gate → stateless column predicates (the same codegen
  *     kernels as batch — language-ID, quality score, repetition), so
  *     the filter rides inside the stream's whole-stage codegen;
  *   - per-source stats → watermarked tumbling windows, bounded state.
  */
object StreamingCorpus {

  /** Schema-locked file-source read of landed document JSON (streaming
    * sources must not infer schemas). */
  def readDocStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, ingest_ts TIMESTAMP")
      .json(dir)

  /** Exact streaming dedup: first arrival of a fingerprint within the
    * watermark horizon wins; replays and cross-source copies collapse. */
  def dedupDocStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Stateless quality gate: keep docs clearing the score threshold with
    * a detected language and tolerable repetition. All three signals are
    * codegen column expressions — no state, no shuffle. */
  def qualityGateStream(
      docs: DataFrame,
      minScore: Double = 50.0,
      maxDominantTokenFrac: Double = 0.3,
      stopwords: Seq[String] = TextAnalysis.StopwordProfiles.flatMap(_._2)): DataFrame =
    docs
      .withColumn("quality_score", TextAnalysis.qualityScore(col("text"), stopwords))
      .withColumn("detected_lang", TextAnalysis.languageId(col("text")))
      .withColumn("dominant_token_frac", TextAnalysis.maxTokenFreqRatio(col("text")))
      .filter(
        col("quality_score") >= minScore &&
          col("detected_lang") =!= "und" &&
          (col("dominant_token_frac").isNull ||
            col("dominant_token_frac") <= maxDominantTokenFrac))

  /** Windowed per-source ingest stats (docs, tokens, mean quality). */
  def sourceStats(
      docs: DataFrame,
      watermark: String = "1 hour",
      windowLength: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ingest_ts", watermark)
      .groupBy(col("source"), window(col("ingest_ts"), windowLength))
      .agg(
        count(lit(1)).as("docs"),
        // guard split-of-empty's [""] artifact: an empty/whitespace doc
        // must count 0 tokens, not 1
        sum(when(length(trim(col("text"))) > 0,
          TextAnalysis.tokenCount(col("text")).cast("long"))
          .otherwise(0L)).as("tokens"),
        avg(TextAnalysis.qualityScore(
          col("text"), TextAnalysis.StopwordProfiles.flatMap(_._2))).as("avg_quality"))
      .select(
        col("source"), col("window.start").as("window_start"),
        col("docs"), col("tokens"), col("avg_quality"))

  /** Continuously-maintained tokenizer word census — the streaming form
    * of the additive merge path (`l_census_incremental`'s contract):
    * each micro-batch is censused at O(batch) and the STANDING (w, c)
    * census advances by one vocab-grain merge
    * ([[TextAnalysis.mergeWordCensus]]), committed as a new version of
    * an [[graft.tables.IncrementalTable]] (atomic manifest commit, so
    * readers never see a half-written census). The raw text is never
    * retained — only the ~10⁶-row census, which any tokenizer family
    * retrains from without a corpus rescan.
    *
    * Exactly-once under foreachBatch replay: EVERY batch commits one
    * version (an empty batch re-commits the current census), so the
    * applied-version count always equals the applied-batch count; a
    * re-delivered batch whose commit already landed
    * (versions.size > batchId) is skipped instead of re-merged —
    * re-merging would double its counts. */
  def startCensusMaintenance(
      docs: DataFrame, textCol: String, censusPath: String,
      checkpointDir: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.{Dataset, Row}
    val w = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyCensusBatch(batch.toDF(), textCol, censusPath, batchId)
      }
    trigger.foreach(w.trigger)
    w.start()
  }

  /** One census-maintenance step (the [[startCensusMaintenance]]
    * foreachBatch body, exposed for the replay-idempotence spec). */
  private[graft] def applyCensusBatch(
      batch: DataFrame, textCol: String, censusPath: String,
      batchId: Long): Unit = {
    import graft.tables.IncrementalTable
    // the applied-batch ledger is the version NUMBER, not the version
    // COUNT: numbers are never reused (mintNext is max+1), so the guard
    // survives a vacuum that drops old manifests — a size-based guard
    // would re-merge the last batch after vacuum and double its counts.
    // (A restore/rollback on this table rewrites the ledger by design —
    // reset the stream checkpoint with it.)
    val applied = IncrementalTable.currentVersion(censusPath).getOrElse(0)
    // Contract: before batch b the table is at version b (every prior
    // batch committed exactly one version), or b+1 when b itself already
    // committed but the checkpoint didn't record it (at-least-once
    // replay). applied > b+1 is unreachable except via a checkpoint /
    // table MISMATCH — typically a fresh checkpoint (batch ids restart
    // at 0) pointed at an existing census — under which the old silent
    // skip would freeze the table forever with no error.
    require(applied <= batchId + 1,
      s"census at $censusPath is at version $applied but the stream " +
        s"delivered batch $batchId: the checkpoint and the table " +
        "disagree (fresh checkpoint against an existing table?) — " +
        "reset the table with the checkpoint, or point one elsewhere")
    if (applied > batchId) () // replay of an already-committed batch
    else {
      val delta = TextAnalysis.wordCensus(batch, textCol)
      val merged =
        if (applied == 0) delta
        else TextAnalysis.mergeWordCensus(Seq(
          IncrementalTable.read(batch.sparkSession, censusPath), delta))
      IncrementalTable.commitFull(merged, censusPath): Unit
    }
  }

  /** Continuously-maintained inverted index — the live form of
    * [[graft.llm.Retrieval.invertedIndex]], laid out the way search
    * engines actually maintain one: immutable posting SEGMENTS plus a
    * churning dictionary.
    *
    *   - `<indexDir>/postings` (token, doc_id, tf, dl, shard):
    *     each micro-batch's postings land as hive partition
    *     `shard=<batchId>` via `IncrementalTable.refreshPartitions` —
    *     O(batch) data cost, every other segment carries by reference,
    *     and a replayed batch REWRITES its own shard (content-
    *     idempotent by construction, no guard needed). Docs are
    *     append-only/immutable, the inverted-index contract.
    *   - `<indexDir>/dict` (token, df_t): additive vocab-grain merge
    *     per batch (df sums across segments because each doc lives in
    *     exactly one), guarded by the census discipline — one committed
    *     version per applied batch; the current version NUMBER (never
    *     reused, vacuum-proof) marks an already-applied redelivery
    *     whose re-merge would double-count.
    *   - `<indexDir>/stats` (n_docs, total_len): the same additive
    *     merge at 1-row grain, independently guarded — a crash between
    *     the three commits self-heals on replay because each table
    *     checks its own applied-version count.
    *
    * Query batches read the index with [[readIndex]] and score with
    * [[graft.llm.Retrieval.bm25TopKWithDict]] — retrieval over a corpus
    * that was never batch-indexed, always current to the last landed
    * micro-batch. */
  def startIndexMaintenance(
      docs: DataFrame, idCol: String, textCol: String, indexDir: String,
      checkpointDir: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.{Dataset, Row}
    val w = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyIndexBatch(batch.toDF(), idCol, textCol, indexDir, batchId)
      }
    trigger.foreach(w.trigger)
    w.start()
  }

  /** One index-maintenance step (the [[startIndexMaintenance]]
    * foreachBatch body, exposed for the replay-idempotence spec). */
  private[graft] def applyIndexBatch(
      batch: DataFrame, idCol: String, textCol: String, indexDir: String,
      batchId: Long): Unit = {
    import graft.tables.IncrementalTable
    val postingsPath = s"$indexDir/postings"
    val dictPath = s"$indexDir/dict"
    val statsPath = s"$indexDir/stats"
    // three commits consume the batch census — persist it once instead
    // of re-running the explode per action. The tokenization is THE
    // shared index-side one (Retrieval.termFrequencies), so the live
    // segments can never drift from the batch index or the query side.
    val tf = graft.llm.Retrieval.termFrequencies(batch, idCol, textCol)
      .persist()
    try {
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      // a batch already folded into shard=-1 by a compaction must NOT
      // rewrite its shard on replay — its rows would then exist twice
      // (once merged, once fresh) and every BM25 score would double
      if (batchId > compactedThrough(postingsPath)) {
        val segment = tf.join(dl, "doc_id")
          .select(col("token"), col("doc_id"), col("tf"), col("dl"),
            lit(batchId).as("shard"))
        IncrementalTable.refreshPartitions(
          segment, postingsPath, Seq("shard")): Unit
      }
      // applied-batch guards key on the version NUMBER (never reused —
      // mintNext is max+1), not the version count, so they survive a
      // vacuum of old manifests; each listing is taken once per table
      val dictApplied =
        IncrementalTable.currentVersion(dictPath).getOrElse(0)
      // same checkpoint/table-mismatch tripwire as applyCensusBatch:
      // applied can only ever be batchId or batchId + 1
      require(dictApplied <= batchId + 1,
        s"dict at $dictPath is at version $dictApplied but the stream " +
          s"delivered batch $batchId: checkpoint/table mismatch")
      if (dictApplied <= batchId) {
        val delta = tf.groupBy(col("token")).agg(count(lit(1)).as("df_t"))
        val merged =
          if (dictApplied == 0) delta
          else IncrementalTable.read(batch.sparkSession, dictPath)
            .unionByName(delta)
            .groupBy(col("token")).agg(sum(col("df_t")).as("df_t"))
        IncrementalTable.commitFull(merged, dictPath): Unit
      }
      val statsApplied =
        IncrementalTable.currentVersion(statsPath).getOrElse(0)
      require(statsApplied <= batchId + 1,
        s"stats at $statsPath is at version $statsApplied but the stream " +
          s"delivered batch $batchId: checkpoint/table mismatch")
      if (statsApplied <= batchId) {
        val delta = dl.agg(
          count(lit(1)).as("n_docs"),
          coalesce(sum(col("dl")), lit(0L)).as("total_len"))
        val merged =
          if (statsApplied == 0) delta
          else IncrementalTable.read(batch.sparkSession, statsPath)
            .unionByName(delta)
            .agg(sum(col("n_docs")).as("n_docs"),
              sum(col("total_len")).as("total_len"))
        IncrementalTable.commitFull(merged, statsPath): Unit
      }
    } finally { tf.unpersist(): Unit }
  }

  /** Highest batch id folded into the merged shard by [[compactIndex]]
    * (-1 when never compacted) — the replay fence. */
  private def compactedThrough(postingsPath: String): Long = {
    val p = java.nio.file.Paths.get(postingsPath, "_compacted_through")
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.readString(p).trim.toLong
    else -1L
  }

  /** Continuous embedding-drift monitoring — the live form of
    * [[graft.llm.Similarity.embeddingDrift]]: every micro-batch of
    * vectors compares against a FIXED reference snapshot (the corpus a
    * model was trained/validated on) and lands one drift row
    * (batch_id, n_dims, n_a, n_b, cosine_of_means, l2_of_means) as its
    * own hive partition of an IncrementalTable — O(batch + dims) per
    * batch, no streaming state at all, and a replayed batch REWRITES
    * its own partition (content-idempotent). An alerting job tails the
    * table for cosine dips / L2 spikes — the "new crawl moved" signal
    * before anything trains on it. */
  def startDriftMonitor(
      reference: DataFrame, vecs: DataFrame, vecCol: String,
      outPath: String, checkpointDir: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.{Dataset, Row}
    // the reference snapshot is FIXED — reduce it to its dims-sized
    // mean table ONCE and persist; recomputing it inside foreachBatch
    // would rescan the whole reference every trigger and the monitor's
    // cost would be the reference's size, not the batch's
    val refMeans = graft.llm.Similarity
      .dimMeans(reference, vecCol, "a").persist()
    refMeans.count(): Unit // materialize before the stream starts
    val w = vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val row = graft.llm.Similarity
          .embeddingDriftAgainstMeans(refMeans, batch.toDF(), vecCol)
          .withColumn("batch_id", lit(batchId))
        graft.tables.IncrementalTable
          .refreshPartitions(row, outPath, Seq("batch_id")): Unit
      }
    trigger.foreach(w.trigger)
    w.start()
  }

  /** Lucene-style segment merge for the live index: fold every posting
    * shard into one (`shard = -1`), committed as a new version of the
    * postings table — reads of the merged index list one directory
    * instead of one per ingest batch, and older versions still
    * time-travel to the pre-merge segment layout. Cost is O(index), the
    * defining cost of compaction; dict and stats are untouched (they
    * are already single tables). Run while the maintenance stream is
    * STOPPED (it rewrites the whole postings table), and the
    * `_compacted_through` fence it records makes even the
    * restart-replay of an un-checkpointed folded batch safe:
    * [[applyIndexBatch]] skips the segment rewrite for batch ids at or
    * below the fence. Returns the new version. */
  def compactIndex(spark: SparkSession, indexDir: String): Int = {
    import graft.tables.IncrementalTable
    val path = s"$indexDir/postings"
    val cur = IncrementalTable.read(spark, path)
    // the replay fence: a restart can re-deliver the last batch whose
    // checkpoint commit didn't land (foreachBatch is at-least-once);
    // if compaction folded that batch's shard, the replayed
    // refreshPartitions would ADD its rows next to the merged copy and
    // double every BM25 contribution. Record the highest folded batch
    // id; applyIndexBatch skips the segment rewrite at or below it.
    val maxShard = cur.agg(max(col("shard"))).collect()(0) match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }
    // The fence lands BEFORE the merged commit, atomically (temp file +
    // rename). Ordering proof: if we crash after the fence but before
    // the commit, the per-shard layout is still live, and a replayed
    // batch at-or-below the fence merely SKIPS rewriting a shard whose
    // identical rows already exist (refreshPartitions is content-
    // idempotent) — nothing is lost or doubled. The old order (commit,
    // then fence) had the fatal window: merged layout live + stale
    // fence, so a replayed folded batch landed its shard NEXT TO the
    // merged copy and doubled every BM25 contribution.
    // max() with the previous fence: re-compacting an already-merged
    // table sees only shard = -1 and would otherwise REGRESS the fence,
    // reopening the same window.
    val fence = math.max(maxShard, compactedThrough(path))
    val tmp = java.nio.file.Paths.get(
      path, s"._compacted_through.tmp-${java.util.UUID.randomUUID()}")
    java.nio.file.Files.writeString(tmp, fence.toString)
    java.nio.file.Files.move(
      tmp, java.nio.file.Paths.get(path, "_compacted_through"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    val merged = cur.withColumn("shard", lit(-1L))
    IncrementalTable.commitFull(merged, path, partitionCols = Seq("shard"))
  }

  /** Read the live index: (postings, dict, stats) as of the latest
    * committed versions. */
  def readIndex(
      spark: SparkSession, indexDir: String): (DataFrame, DataFrame, DataFrame) = {
    import graft.tables.IncrementalTable
    (IncrementalTable.read(spark, s"$indexDir/postings").drop("shard"),
      IncrementalTable.read(spark, s"$indexDir/dict"),
      IncrementalTable.read(spark, s"$indexDir/stats"))
  }

  /** Stateless streaming prep: PII scrub then token-window chunking —
    * one output row per training sequence, with the chunk columns
    * flattened. Both steps are pure column expressions (regex replace +
    * sequence/transform/slice), so the whole map stays inside the
    * stream's whole-stage codegen with zero state. */
  def prepStream(
      docs: DataFrame, chunkSize: Int = 512, stride: Int = 384): DataFrame =
    docs
      .withColumn("clean_text",
        TextAnalysis.scrubPii(TextAnalysis.cleanLines(col("text"), minWords = 3)))
      .withColumn("chunk",
        explode(TextAnalysis.tokenChunks(col("clean_text"), chunkSize, stride)))
      .select(
        col("doc_id"), col("source"), col("ingest_ts"),
        col("chunk.chunk_idx").as("chunk_idx"),
        col("chunk.n_tokens").as("n_tokens"),
        col("chunk.chunk_text").as("chunk_text"))
}
