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
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("tokens"),
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
    val applied = IncrementalTable.versions(censusPath).size
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
