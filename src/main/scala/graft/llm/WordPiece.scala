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
  * The census and vocabulary key every piece by (display form, is_cont):
  * a flat string key would conflate the word-INITIAL surface form
  * `##a` (from a corpus word literally starting with `##`) with the
  * CONTINUATION form of `a` — normalize() passes `#` through, so such
  * words are legal. BERT's flat vocab files dodge this only because the
  * BERT pre-tokenizer splits punctuation; this engine keeps arbitrary
  * words, so the flag is part of the key. The display convention
  * (`##`-prefixed continuations) is unchanged, and reconstruction is
  * POSITIONAL (strip `##` from every non-first piece of a word), which
  * is lossless regardless of literal `#`s in the text.
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

  /** Trained vocabulary for the encoder: word-initial surfaces and
    * continuation pieces in display form (`##`-prefixed), kept as two
    * sets because the two namespaces are distinct (see class doc). */
  final case class Vocab(initial: Set[String], continuation: Set[String])

  object Vocab {
    /** Split a FLAT piece list on the `##` prefix — the BERT vocab-file
      * loading convention. Inherently conflates the two namespaces for
      * pieces that start with a literal `##` (a flat file carries no
      * flag); use the (piece, is_cont) rows of [[buildVocab]] when
      * round-tripping a vocabulary trained here. */
    def fromFlat(pieces: Iterable[String]): Vocab = {
      val (cont, init) = pieces.partition(_.startsWith("##"))
      Vocab(init.toSet, cont.toSet)
    }

    /** Rebuild from [[buildVocab]] rows: (display piece, is_cont). */
    def fromRows(rows: Iterable[(String, Boolean)]): Vocab =
      Vocab(
        rows.collect { case (p, false) => p }.toSet,
        rows.collect { case (p, true) => p }.toSet)
  }

  /** Positional substring census at vocab grain: for each census word
    * (w, c), every substring of length 1..maxPieceLen contributes its
    * SURFACE form (is_cont=false) when it starts the word and its
    * `##`-prefixed display form (is_cont=true) otherwise, weighted by c.
    * Keyed by (piece, is_cont) — the display string alone is ambiguous
    * when words contain literal `#`s. Exposed for PlanSpec to pin the
    * census-above-aggregate shape (the vocab-grain contract). */
  private[graft] def pieceCensus(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(explode(expr(
        s"""flatten(transform(sequence(1, $maxPieceLen, 1),
            l -> CASE WHEN length(w) >= l THEN
                   transform(sequence(1, length(w) - l + 1, 1),
                     s -> named_struct(
                       'piece', CASE WHEN s = 1 THEN substring(w, s, l)
                                ELSE '##' || substring(w, s, l) END,
                       'is_cont', s <> 1))
                 ELSE array() END))"""))
        .as("u"), col("c"))
      .select(col("u.piece").as("piece"), col("u.is_cont").as("is_cont"),
        col("c"))
      .groupBy(col("piece"), col("is_cont")).agg(sum(col("c")).as("cnt"))

  /** Build the vocabulary: top `vocabSize` pieces by (cnt desc, piece
    * asc, is_cont asc — deterministic), with every single-code-point
    * form (initial AND `##`-continuation) force-retained below the cut.
    * Returns the (piece, is_cont, cnt) DataFrame; [[Vocab.fromRows]]
    * collects the encoder's two sets from it. */
  def buildVocab(
      df: DataFrame, textCol: String,
      vocabSize: Int = 8000, maxPieceLen: Int = 8): DataFrame =
    buildVocabFromWords(TextAnalysis.wordCensus(df, textCol),
      vocabSize, maxPieceLen)

  /** [[buildVocab]] from an existing (w, c) word census — the
    * incremental-retrain entry point (see
    * [[TextAnalysis.mergeWordCensus]]). */
  def buildVocabFromWords(
      words: DataFrame, vocabSize: Int, maxPieceLen: Int): DataFrame = {
    // single-code-point forms: initial = 1 char; continuation = '##'
    // followed by exactly 1 char (length() counts code points, so
    // non-BMP singles are retained too)
    TextAnalysis.pinnedTopKUnionSingles(
      pieceCensus(words, maxPieceLen),
      order = Seq(desc("cnt"), asc("piece"), asc("is_cont")),
      singles = (!col("is_cont") && length(col("piece")) === 1) ||
        (col("is_cont") && length(col("piece")) === 3),
      topK = vocabSize)
  }

  /** Greedy longest-match-first segmentation of one word against the
    * vocab, by CODE POINT (the census's `length`/`substring` count
    * code points, so the encoder must too — a UTF-16 index would match
    * different slices on non-BMP text). Position 0 probes
    * `vocab.initial` by surface; later positions probe
    * `vocab.continuation` by display form. Returns the pieces in
    * emission form (continuations `##`-prefixed). Falls back to
    * per-code-point emission for the whole word when any position has no
    * match (the out-of-alphabet case — cannot happen on the training
    * corpus, where all single forms are in the vocab); the fallback
    * keeps the `##` convention so reconstruction stays uniform and
    * lossless. */
  def greedySegment(
      word: String, vocab: Vocab, maxPieceLen: Int): Seq[String] = {
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
        val in =
          if (i == 0) vocab.initial.contains(form)
          else vocab.continuation.contains(form)
        if (in) hit = form else l -= 1
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
    * [[TextAnalysis.encodeWords]] mapPartitions boundary, vocab sets in
    * the task closure (a trained vocab is ~10⁴–10⁵ strings — MBs at
    * most). Output is Array[Array[String]]: pieces per word, word
    * boundaries preserved, continuations `##`-prefixed. */
  def encode(
      df: DataFrame, idCol: String, textCol: String,
      vocab: Vocab, maxPieceLen: Int,
      outCol: String = "wp_tokens"): DataFrame =
    TextAnalysis.encodeWords(df, idCol, textCol, outCol)(
      w => greedySegment(w, vocab, maxPieceLen))
}
