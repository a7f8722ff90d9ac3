package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for pretraining: concatenate documents in a
  * deterministic order and cut every `seqLen` tokens (the GPT-style
  * concat-and-chunk recipe), so every training sequence is exactly full
  * and no token is dropped or duplicated.
  *
  * Scale shape: documents are first salted into `nBuckets` independent
  * streams by `id % nBuckets`, so the cumulative-offset window runs
  * PARTITIONED (never a single-partition global window), each bucket
  * packs its own sequence space, and the whole operator is one shuffle.
  * Sequence ids are (bucket, seq_in_bucket) pairs — globally unique
  * without any cross-bucket coordination, which is what lets 1000
  * executors pack 100 TB without agreeing on a global token order. The
  * assignment is pure arithmetic on ids and token counts — deterministic
  * across runs, engines, and partitionings. */
object Packing {

  /** Per-document packing spans: the half-open token interval the doc
    * occupies in its bucket's concatenated stream, and the first/last
    * sequence indices it lands in (a doc crossing a cut boundary spans
    * multiple sequences). Returns (id, bucket, n_tokens, offset,
    * first_seq, last_seq). */
  def withSequenceSpans(
      df: DataFrame, idCol: String, textCol: String,
      seqLen: Int, nBuckets: Int = 1024): DataFrame = {
    require(seqLen >= 1 && nBuckets >= 1)
    val w = Window.partitionBy(col("bucket")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(
        col(idCol).cast(LongType).as("id"),
        (col(idCol) % nBuckets).cast(IntegerType).as("bucket"),
        // split-of-empty yields [""], which would fabricate a phantom
        // 1-token span per empty doc (same guard as tokenChunks); the
        // rlike catches whitespace-only too (trim only strips spaces)
        when(col(textCol).rlike("\\S"),
            TextAnalysis.tokenCount(col(textCol)).cast(LongType))
          .otherwise(lit(0L))
          .as("n_tokens"))
      // zero-token docs occupy no span: they'd emit last_seq < first_seq
      .filter(col("n_tokens") > 0)
      .withColumn("offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("first_seq", floor(col("offset") / seqLen))
      .withColumn("last_seq",
        floor((col("offset") + col("n_tokens") - 1) / seqLen))
  }

  /** Explode spans into per-(doc, sequence) pieces: for each sequence a
    * doc touches, the token range it contributes and where that range
    * sits inside the sequence. Sum of piece lengths = doc token count;
    * each sequence position is covered exactly once — the invariants
    * PackingSpec pins. Returns (id, bucket, seq_id, doc_tok_start,
    * seq_tok_start, piece_len). */
  def packedPieces(
      df: DataFrame, idCol: String, textCol: String,
      seqLen: Int, nBuckets: Int = 1024): DataFrame =
    withSequenceSpans(df, idCol, textCol, seqLen, nBuckets)
      .withColumn("seq_id", explode(sequence(col("first_seq"), col("last_seq"))))
      .select(
        col("id"), col("bucket"), col("seq_id"),
        // tokens of this doc that land in seq_id: the overlap of
        // [offset, offset + n_tokens) with [seq_id*seqLen, (seq_id+1)*seqLen)
        (greatest(col("seq_id") * seqLen, col("offset")) - col("offset"))
          .as("doc_tok_start"),
        (greatest(col("seq_id") * seqLen, col("offset")) - col("seq_id") * seqLen)
          .as("seq_tok_start"),
        (least((col("seq_id") + 1) * seqLen, col("offset") + col("n_tokens")) -
          greatest(col("seq_id") * seqLen, col("offset"))).as("piece_len"))
}
