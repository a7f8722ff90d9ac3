package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece model) —
  * the second tokenizer-training family next to BPE, completing the
  * tokenizer menu: BPE grows a vocabulary bottom-up by merging; the
  * unigram model starts from a LARGE seed vocabulary and prunes it down
  * under a piece-probability model, segmenting each word by Viterbi.
  * Reference tokenizer-prep role: the same pipeline seat the repo's BPE
  * path fills (see TextAnalysis.trainBpeMerges) — this class exists so a
  * corpus team can train/apply either family without leaving the engine.
  *
  * Spark-first scale shape (identical to the BPE discipline):
  *   - the corpus is read ONCE into its word-frequency census (one
  *     map-side-combined shuffle); everything after runs at VOCAB grain
  *     (~10⁶ distinct words), never corpus grain;
  *   - the seed-piece census explodes substrings of CENSUS words
  *     weighted by word frequency — vocab-sized work, one shuffle, and
  *     (being pure relational algebra) DuckDB-oracle-able end to end;
  *   - EM iterations broadcast the current piece table (a trained
  *     tokenizer is ~50k pieces — KBs) and run the per-word Viterbi DP
  *     behind a typed mapPartitions boundary — the same justified
  *     escape as the BPE merge loop: a per-row iterative DP Catalyst
  *     cannot express. Expected counts re-aggregate at PIECE grain.
  *
  * Determinism discipline (the repo's log-free rule): segmentations are
  * scored by exact integer arithmetic, never by summing float
  * log-probs. A segmentation's probability under add-one-smoothed piece
  * counts is Π(cᵢ+1) / T^k (k pieces, T = Σ(c+1)); two candidates
  * compare as pA·T^kB vs pB·T^kA over BigInt — no rounding, so the
  * chosen segmentation (and therefore every trained count and every
  * encoded piece) is bit-identical across runs, partitionings, and
  * engines. EM here is hard-EM (Viterbi-EM): the E-step assigns each
  * census word its single best segmentation, keeping all counts exact
  * integers; soft-EM's fractional expected counts would reintroduce
  * order-dependent float sums for a negligible quality delta at this
  * seat.
  */
object Unigram {

  /** One trained piece: surface form + add-one-smoothed census count. */
  final case class Piece(piece: String, count: Long)

  /** Seed-piece census: every substring of length 1..maxPieceLen of
    * every census word, weighted by word frequency (each occurrence
    * position counts). Pure relational algebra — corpus shuffles once
    * into the word census; the substring explosion is vocab-sized.
    * Returns (piece, cnt) for the top `seedSize` by (cnt desc, piece) —
    * single-character pieces are ALWAYS retained (they are the
    * segmentation fallback: with them, every word is segmentable). */
  def seedCensus(
      df: DataFrame, textCol: String,
      maxPieceLen: Int = 4, seedSize: Int = 20000): DataFrame = {
    val words = df
      .select(explode(TextAnalysis.tokens(
        TextAnalysis.normalize(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val pieces = words
      .select(explode(expr(
        s"""flatten(transform(sequence(1, $maxPieceLen, 1),
            l -> CASE WHEN length(w) >= l THEN
                   transform(sequence(1, length(w) - l + 1, 1),
                     i -> substring(w, i, l))
                 ELSE array() END))"""))
        .as("piece"), col("c"))
      .groupBy(col("piece")).agg(sum(col("c")).as("cnt"))
    val top = pieces
      .orderBy(desc("cnt"), asc("piece"))
      .limit(seedSize)
    // union-back single chars that fell below the cut, then dedup
    top.unionByName(pieces.filter(length(col("piece")) === 1))
      .groupBy(col("piece")).agg(max(col("cnt")).as("cnt"))
  }

  /** Best segmentation of `word` under the piece table, by exact-integer
    * Viterbi. `counts` maps piece → smoothed count (c+1); `total` is
    * Σ(c+1). Ties break to FEWER pieces, then to the longer last piece
    * (smaller back-pointer), recursively — a total order, so the result
    * is deterministic. Returns null when no path exists (cannot happen
    * when all single chars of the word are in the table). */
  def viterbiSegment(
      word: String, counts: scala.collection.Map[String, Long],
      total: BigInt, maxPieceLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    // best path to position i (exclusive): product of smoothed counts,
    // piece count k, and the start index of the last piece
    val prod = new Array[BigInt](n + 1)
    val k = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    prod(0) = BigInt(1); k(0) = 0; back(0) = -1
    var i = 1
    while (i <= n) {
      var bestProd: BigInt = null
      var bestK = 0
      var bestBack = -1
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (prod(j) != null) {
          counts.get(word.substring(j, i)) match {
            case Some(c) =>
              val p = prod(j) * BigInt(c)
              val kk = k(j) + 1
              // score = p / total^kk; compare exactly via cross-multiply
              val better =
                if (bestProd == null) true
                else {
                  val cmp = (p * total.pow(bestK)).compare(bestProd * total.pow(kk))
                  if (cmp != 0) cmp > 0
                  else if (kk != bestK) kk < bestK
                  else j < bestBack // longer last piece wins ties
                }
              if (better) { bestProd = p; bestK = kk; bestBack = j }
            case None => ()
          }
        }
        j += 1
      }
      prod(i) = bestProd; k(i) = bestK; back(i) = bestBack
      i += 1
    }
    if (prod(n) == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) { out += word.substring(back(pos), pos); pos = back(pos) }
    out.reverseIterator.toArray
  }

  /** Train a unigram-LM piece table by Viterbi-EM over the word census.
    *
    * Each iteration: broadcast the current (piece → count) table,
    * Viterbi-segment every census word (mapPartitions at vocab grain),
    * re-census the used pieces weighted by word frequency (one
    * piece-grain shuffle), then prune to `vocabSize` by (count desc,
    * piece asc) keeping all single characters. The corpus itself is
    * read exactly once (for the word census, inside [[seedCensus]]).
    * Returns the final piece table, sorted (count desc, piece asc). */
  def train(
      df: DataFrame, textCol: String,
      vocabSize: Int = 8000, maxPieceLen: Int = 4,
      iterations: Int = 2, seedSize: Int = 20000): Array[Piece] = {
    val spark = df.sparkSession
    import spark.implicits._
    val wordCensus: DataFrame = df
      .select(explode(TextAnalysis.tokens(
        TextAnalysis.normalize(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    wordCensus.persist()
    try {
      var table: Array[Piece] = seedCensus(df, textCol, maxPieceLen, seedSize)
        .as[(String, Long)].collect().map { case (p, c) => Piece(p, c) }
      var iter = 0
      while (iter < iterations) {
        val counts = table.map(p => p.piece -> (p.count + 1L)).toMap
        val total: BigInt = counts.valuesIterator.map(BigInt(_)).sum
        val bcCounts = spark.sparkContext.broadcast(counts)
        val used = wordCensus.as[(String, Long)].mapPartitions { rows =>
          val m = bcCounts.value
          rows.flatMap { case (w, c) =>
            val seg = viterbiSegment(w, m, total, maxPieceLen)
            if (seg == null) Iterator.empty
            else seg.iterator.map(p => (p, c))
          }
        }.toDF("piece", "c")
          .groupBy(col("piece")).agg(sum(col("c")).as("cnt"))
        val pruned = used
          .orderBy(desc("cnt"), asc("piece"))
          .limit(vocabSize)
          .unionByName(used.filter(length(col("piece")) === 1))
          .groupBy(col("piece")).agg(max(col("cnt")).as("cnt"))
        table = pruned.as[(String, Long)].collect()
          .map { case (p, c) => Piece(p, c) }
        bcCounts.destroy()
        iter += 1
      }
      table.sortBy(p => (-p.count, p.piece))
    } finally wordCensus.unpersist()
  }

  /** Encode every document with a trained piece table: per word, the
    * exact-integer Viterbi of [[viterbiSegment]]. The piece table
    * broadcasts in the task closure; tokenization stays codegen and the
    * per-word DP runs behind the same justified mapPartitions boundary
    * as BPE inference. Output `outCol` is Array[Array[String]] (pieces
    * per word), so word boundaries survive for packing/reconstruction —
    * and concatenating each word's pieces reconstructs the word exactly
    * (Viterbi segmentation is lossless by construction; the losslessness
    * gate pins it cross-engine). */
  def encode(
      df: DataFrame, idCol: String, textCol: String,
      pieces: Array[Piece], maxPieceLen: Int = 4,
      outCol: String = "unigram_tokens"): DataFrame = {
    val counts = pieces.map(p => p.piece -> (p.count + 1L)).toMap
    val total: BigInt = counts.valuesIterator.map(BigInt(_)).sum
    val worded = df.select(col(idCol),
      TextAnalysis.tokens(TextAnalysis.normalize(col(textCol))).as("__words"))
    val wIdx = worded.schema.fieldIndex("__words")
    val outSchema = StructType(
      worded.schema.fields.patch(wIdx, Nil, 1) :+
        StructField(outCol, ArrayType(ArrayType(StringType))))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    worded.mapPartitions { rows =>
      rows.map { r =>
        val ws = r.getSeq[String](wIdx)
        val ps: Seq[Seq[String]] =
          if (ws == null) null
          else ws.map { w =>
            if (w.isEmpty) Seq.empty[String]
            else {
              val seg = viterbiSegment(w, counts, total, maxPieceLen)
              // single chars always in the table → seg never null for
              // words drawn from the training corpus's alphabet; fall
              // back to characters for out-of-alphabet words
              if (seg == null) w.map(_.toString) else seg.toSeq
            }
          }
        Row.fromSeq(r.toSeq.patch(wIdx, Nil, 1) :+ ps)
      }
    }(enc)
  }
}
