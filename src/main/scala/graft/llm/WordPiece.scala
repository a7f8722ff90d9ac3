package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece subword tokenizer (Schuster & Nakajima 2012; the BERT
  * tokenizer family) — the third tokenizer-inference family next to BPE
  * (greedy merge replay) and unigram-LM (Viterbi DP), completing the
  * production menu. WordPiece's signature is the ENCODER: greedy
  * longest-match-first against a vocabulary whose continuation pieces
  * carry a `##` prefix, so `unaffable` → `un ##aff ##able`.
  *
  * Vocabulary construction here is frequency-ranked over a POSITIONAL
  * substring census (word-initial surface forms vs `##`-prefixed
  * continuation forms are censused separately, because they are distinct
  * vocab entries with distinct distributions) — the same vocab-grain
  * discipline as [[Unigram.seedCensus]] and
  * [[TextAnalysis.bpePairCensus]]: the corpus collapses to its word
  * census in ONE map-side-combined shuffle, and the substring explosion
  * runs at vocabulary grain (~10⁶ distinct words at 100 TB), never at
  * corpus grain. Production WordPiece training scores candidates by
  * likelihood-gain rather than raw frequency; the census/prune/encode
  * plumbing — the part that must scale — is identical, and the ranking
  * is one aggregate swap.
  *
  * Every single-code-point piece observed in the corpus is retained in
  * BOTH forms (initial and continuation) regardless of rank, so every
  * training-corpus word is segmentable and the encode is lossless — the
  * same stranded-word guarantee the unigram trainer's alphabet carries.
  *
  * Reference surface: the reference repo has no tokenizer; this extends
  * the LLM-curation menu (driver brief) alongside BPE/unigram.
  */
object WordPiece {

  /** Positional substring census at vocab grain: for each census word
    * (w, c), every substring of length 1..maxPieceLen contributes its
    * SURFACE form when it starts the word and its `##`-prefixed form
    * otherwise, weighted by c. Exposed for PlanSpec to pin the
    * census-above-aggregate shape (the vocab-grain contract). */
  private[graft] def pieceCensus(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(explode(expr(
        s"""flatten(transform(sequence(1, $maxPieceLen, 1),
            l -> CASE WHEN length(w) >= l THEN
                   transform(sequence(1, length(w) - l + 1, 1),
                     s -> CASE WHEN s = 1 THEN substring(w, s, l)
                          ELSE '##' || substring(w, s, l) END)
                 ELSE array() END))"""))
        .as("piece"), col("c"))
      .groupBy(col("piece")).agg(sum(col("c")).as("cnt"))

  /** Build the vocabulary: top `vocabSize` pieces by (cnt desc, piece
    * asc — deterministic), with every single-code-point form (initial
    * AND `##`-continuation) force-retained below the cut. Returns the
    * (piece, cnt) DataFrame; [[vocabSet]] collects just the surface set
    * for the encoder broadcast. */
  def buildVocab(
      df: DataFrame, textCol: String,
      vocabSize: Int = 8000, maxPieceLen: Int = 8): DataFrame = {
    val words = df
      .select(explode(TextAnalysis.tokens(
        TextAnalysis.normalize(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val censusPlan = pieceCensus(words, maxPieceLen)
    // pin the census to ONE physical plan (LogicalRDD): the top-K and
    // the singles filter both read the same shuffle output — left as
    // two Catalyst branches the grouping-key filter pushes below the
    // aggregate and the corpus scan + census shuffle run twice
    // (the [[Unigram.seedCensus]] fix, same reasoning)
    val census = df.sparkSession.createDataFrame(censusPlan.rdd, censusPlan.schema)
    val top = census
      .orderBy(desc("cnt"), asc("piece"))
      .limit(vocabSize)
    // single-code-point forms: initial = 1 char; continuation = '##'
    // followed by exactly 1 char. length() counts code points, so
    // non-BMP singles are retained too.
    val singles = census.filter(
      length(col("piece")) === 1 ||
        (col("piece").startsWith("##") && length(col("piece")) === 3))
    top.unionByName(singles)
      .groupBy(col("piece")).agg(max(col("cnt")).as("cnt"))
  }

  /** Greedy longest-match-first segmentation of one word against the
    * vocab set, by CODE POINT (the census's `length`/`substring` count
    * code points, so the encoder must too — a UTF-16 index would match
    * different slices on non-BMP text). Returns the pieces in emission
    * form (continuations `##`-prefixed). Falls back to per-code-point
    * emission for the whole word when any position has no match (the
    * out-of-alphabet case — cannot happen on the training corpus, where
    * all single forms are in the vocab); the fallback keeps the `##`
    * convention so reconstruction stays uniform and lossless. */
  def greedySegment(
      word: String, vocab: Set[String], maxPieceLen: Int): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val cps: Array[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    val n = cps.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      var l = math.min(maxPieceLen, n - i)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val surface = cps.slice(i, i + l).mkString
        val form = if (i == 0) surface else "##" + surface
        if (vocab.contains(form)) hit = form else l -= 1
      }
      if (hit == null)
        return cps.zipWithIndex.map { case (cp, j) =>
          if (j == 0) cp else "##" + cp
        }.toSeq
      out += hit
      i += l
    }
    out.toSeq
  }

  /** Encode every document: whitespace words (codegen tokenization) →
    * greedy max-munch per word behind the shared
    * [[TextAnalysis.encodeWords]] mapPartitions boundary, vocab set in
    * the task closure (a trained vocab is ~10⁴–10⁵ strings — MBs at
    * most). Output is Array[Array[String]]: pieces per word, word
    * boundaries preserved, continuations `##`-prefixed. */
  def encode(
      df: DataFrame, idCol: String, textCol: String,
      vocab: Set[String], maxPieceLen: Int,
      outCol: String = "wp_tokens"): DataFrame =
    TextAnalysis.encodeWords(df, idCol, textCol, outCol)(
      w => greedySegment(w, vocab, maxPieceLen))
}
