package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
      maxPieceLen: Int = 4, seedSize: Int = 20000): DataFrame =
    seedCensusFromWords(TextAnalysis.wordCensus(df, textCol),
      maxPieceLen, seedSize)

  /** [[seedCensus]] from an existing (w, c) word census — the
    * incremental-retrain entry point: a standing corpus census (or a
    * [[TextAnalysis.mergeWordCensus]] of shard censuses) derives the
    * seed pieces without touching the corpus. */
  def seedCensusFromWords(
      words: DataFrame, maxPieceLen: Int, seedSize: Int): DataFrame =
    // plan-pin + top-K + singles union-back shared with WordPiece
    // (see [[TextAnalysis.pinnedTopKUnionSingles]] for why the pin)
    TextAnalysis.pinnedTopKUnionSingles(
      seedPieceCensus(words, maxPieceLen),
      order = Seq(desc("cnt"), asc("piece")),
      singles = length(col("piece")) === 1,
      topK = seedSize)

  /** The substring census over a (w, c) word census — the piece
    * explosion happens ABOVE the word-census aggregate (vocab grain,
    * never corpus grain); PlanSpec pins that shape on this plan
    * directly, since [[seedCensus]] hides it behind the LogicalRDD pin. */
  private[graft] def seedPieceCensus(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(explode(expr(
        s"""flatten(transform(sequence(1, $maxPieceLen, 1),
            l -> CASE WHEN length(w) >= l THEN
                   transform(sequence(1, length(w) - l + 1, 1),
                     i -> substring(w, i, l))
                 ELSE array() END))"""))
        .as("piece"), col("c"))
      .groupBy(col("piece")).agg(sum(col("c")).as("cnt"))

  /** Best segmentation of `word` under the piece table, by exact-integer
    * Viterbi. `counts` maps piece → smoothed count (c+1); `total` is
    * Σ(c+1). Ties break to FEWER pieces, then to the longer last piece
    * (smaller back-pointer), recursively — a total order, so the result
    * is deterministic. Returns null when no path exists (cannot happen
    * when all single chars of the word are in the table). */
  /** Words longer than this segment in independent chunks: a 100k-char
    * unbroken token (base64 blob, minified JS) would otherwise give the
    * DP corpus-scale BigInt products — SentencePiece caps unbroken
    * input the same way. Chunk-local segmentation stays lossless (each
    * chunk's pieces concatenate back exactly); only optimality across
    * the chunk boundary is given up, on pathological tokens only. */
  val DpChunkChars = 512

  def viterbiSegment(
      word: String, counts: scala.collection.Map[String, Long],
      total: BigInt, maxPieceLen: Int): Array[String] = {
    if (word.length <= DpChunkChars) viterbiChunk(word, counts, total, maxPieceLen)
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var off = 0
      while (off < word.length) {
        var end = math.min(off + DpChunkChars, word.length)
        // never split a surrogate pair across the chunk boundary: a lone
        // high surrogate ends no census piece, so the chunk would be
        // unsegmentable even over the full alphabet
        if (end < word.length && Character.isHighSurrogate(word.charAt(end - 1)))
          end -= 1
        val seg = viterbiChunk(word.substring(off, end), counts, total, maxPieceLen)
        if (seg == null) return null
        out ++= seg
        off = end
      }
      out.toArray
    }
  }

  /** Guard band for the log-domain filter: double rounding error over a
    * ≤[[DpChunkChars]]-piece chunk accumulates to ~1e-12 in the log, so
    * any pair whose true log-score gap exceeds 1e-9 is decided correctly
    * by doubles; pairs inside the band (in practice: exact ties from
    * reordered equal piece multisets) are re-compared exactly. */
  private val LogEps = 1e-9

  /** Exact path product along finalized back-pointers (guard-band
    * fallback only): multiply the smoothed counts of the pieces on the
    * best path ending at `end`. */
  private def pathProd(
      end: Int, back: Array[Int], word: String,
      counts: scala.collection.Map[String, Long]): BigInt = {
    var i = end
    var p = BigInt(1)
    while (i > 0) {
      val j = back(i)
      p *= BigInt(counts(word.substring(j, i)))
      i = j
    }
    p
  }

  private def viterbiChunk(
      word: String, counts: scala.collection.Map[String, Long],
      total: BigInt, maxPieceLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    // Filter-then-verify scoring: the DP compares candidates in double
    // log domain (score = Σ log c − k·log T), which is corpus-size-
    // independent; only candidates inside the [[LogEps]] guard band are
    // re-compared with exact integers (path-product reconstruction +
    // exponent-delta cross-multiply) — so the chosen segmentation is
    // bit-identical to pure exact-integer scoring, without BigInt
    // arithmetic on the hot path (whose bit-length grew with
    // log(corpus) and made per-word cost rise with scale).
    val logT = math.log(total.toDouble)
    val logProd = new Array[Double](n + 1)
    val k = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    val reach = new Array[Boolean](n + 1)
    reach(0) = true; back(0) = -1
    var i = 1
    while (i <= n) {
      var bestLogProd = 0.0
      var bestK = 0
      var bestBack = -1
      // look back maxPieceLen CODE POINTS (the census's piece length is
      // code points, so a piece with non-BMP chars spans up to
      // 2·maxPieceLen UTF-16 units — a raw `i - maxPieceLen` window
      // would make such pieces unreachable). ASCII cost is identical.
      var j = i
      var cpBack = 0
      while (j > 0 && cpBack < maxPieceLen) {
        j -= 1
        if (j > 0 && Character.isLowSurrogate(word.charAt(j)) &&
          Character.isHighSurrogate(word.charAt(j - 1))) j -= 1
        cpBack += 1
      }
      while (j < i) {
        if (reach(j)) {
          counts.get(word.substring(j, i)) match {
            case Some(c) =>
              val lp = logProd(j) + math.log(c.toDouble)
              val kk = k(j) + 1
              val better =
                if (bestBack < 0) true
                else {
                  val diff = (lp - kk * logT) - (bestLogProd - bestK * logT)
                  if (diff > LogEps) true
                  else if (diff < -LogEps) false
                  else {
                    // guard band: exact compare. Both j and bestBack are
                    // finalized (< i), so their path products reconstruct
                    // from back-pointers; raise only the SHORTER path by
                    // the exponent DELTA (total^k over a long word is a
                    // multi-megabit product; the delta stays small).
                    val p = pathProd(j, back, word, counts) * BigInt(c)
                    val bp = pathProd(bestBack, back, word, counts) *
                      BigInt(counts(word.substring(bestBack, i)))
                    val cmp =
                      if (kk >= bestK) p.compare(bp * total.pow(kk - bestK))
                      else (p * total.pow(bestK - kk)).compare(bp)
                    if (cmp != 0) cmp > 0
                    else if (kk != bestK) kk < bestK
                    else j < bestBack // longer last piece wins ties
                  }
                }
              if (better) { bestLogProd = lp; bestK = kk; bestBack = j }
            case None => ()
          }
        }
        j += 1
      }
      if (bestBack >= 0) {
        reach(i) = true
        logProd(i) = bestLogProd; k(i) = bestK; back(i) = bestBack
      }
      i += 1
    }
    if (!reach(n)) return null
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
    * read exactly once (into the word census the whole loop runs on).
    * Returns the final piece table, sorted (count desc, piece asc). */
  def train(
      df: DataFrame, textCol: String,
      vocabSize: Int = 8000, maxPieceLen: Int = 4,
      iterations: Int = 2, seedSize: Int = 20000): Array[Piece] =
    trainFromWords(TextAnalysis.wordCensus(df, textCol),
      vocabSize, maxPieceLen, iterations, seedSize)

  /** [[train]] from an existing (w, c) word census — the
    * incremental-retrain entry point: a standing corpus census (or a
    * [[TextAnalysis.mergeWordCensus]] of shard censuses) drives the
    * full Viterbi-EM loop without ever touching the corpus. */
  def trainFromWords(
      words: DataFrame,
      vocabSize: Int, maxPieceLen: Int,
      iterations: Int, seedSize: Int): Array[Piece] = {
    val spark = words.sparkSession
    import spark.implicits._
    val wordCensus: DataFrame = words
    wordCensus.persist()
    try {
      var table: Array[Piece] =
        seedCensusFromWords(wordCensus, maxPieceLen, seedSize)
          .as[(String, Long)].collect().map { case (p, c) => Piece(p, c) }
      // the training ALPHABET: every single-char piece of the seed.
      // These survive every prune — with count 0 if an iteration never
      // used them — so every word over the alphabet stays segmentable;
      // pruning singles that happened to be unused one iteration would
      // strand words whose multi-char pieces fall below a later cut
      // (and silently drop them from the EM census).
      // single = one CODE POINT (the census's length() counts code
      // points; a JVM p.length == 1 would drop non-BMP singles from the
      // alphabet and strand every word containing them)
      val alphabet: Array[String] =
        table.collect {
          case Piece(p, _) if p.codePointCount(0, p.length) == 1 => p
        }
      var iter = 0
      while (iter < iterations) {
        val counts = table.map(p => p.piece -> (p.count + 1L)).toMap
        val total: BigInt = counts.valuesIterator.map(BigInt(_)).sum
        val bcCounts = spark.sparkContext.broadcast(counts)
        // the EM census is bounded by the CURRENT table (only pieces in
        // the table can be used), so one collect suffices; pruning
        // driver-side also keeps the Viterbi mapPartitions job from
        // being planned twice (a dataframe-side top-K ∪ singles union
        // re-plans the census — the grouping-key filter pushes below
        // the aggregate and breaks exchange reuse)
        val used: Array[(String, Long)] =
          wordCensus.as[(String, Long)].mapPartitions { rows =>
            val m = bcCounts.value
            rows.flatMap { case (w, c) =>
              val seg = viterbiSegment(w, m, total, maxPieceLen)
              if (seg == null) Iterator.empty
              else seg.iterator.map(p => (p, c))
            }
          }.toDF("piece", "c")
            .groupBy(col("piece")).agg(sum(col("c")).as("cnt"))
            .as[(String, Long)].collect()
        val usedMap = used.toMap
        val top = used.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
        table = (top.iterator.map { case (p, c) => Piece(p, c) } ++
          alphabet.iterator.map(ch => Piece(ch, usedMap.getOrElse(ch, 0L))))
          .toArray.distinctBy(_.piece)
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
    TextAnalysis.encodeWords(df, idCol, textCol, outCol) { w =>
      if (w.isEmpty) Seq.empty[String]
      else {
        val seg = viterbiSegment(w, counts, total, maxPieceLen)
        // the training alphabet's single chars survive every prune →
        // seg is never null for words over that alphabet; fall back to
        // CODE POINTS (not Chars — a Char split would cut a non-BMP
        // code point into two lone surrogates, which are invalid
        // strings and would break the losslessness hash) for
        // out-of-alphabet words
        if (seg == null)
          w.codePoints().toArray
            .map(cp => new String(Character.toChars(cp))).toSeq
        else seg.toSeq
      }
    }
  }
}
