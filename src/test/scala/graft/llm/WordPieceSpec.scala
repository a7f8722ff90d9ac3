package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.WordPiece.Vocab

/** WordPiece tokenizer semantics: the positional vocab census
  * hand-count, single-form retention below the cut, greedy
  * longest-match-first behavior (the BERT `un ##aff ##able` shape),
  * losslessness of the ## reconstruction, code-point fallback,
  * vocab-build determinism, and the (piece, is_cont) disambiguation for
  * corpus words containing literal `#`s. */
class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def vocabRows(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Boolean, Long)].collect()

  // -- vocab census ----------------------------------------------------

  test("vocab census hand-count: positional forms weighted by word frequency") {
    // "ab ab ba" → word census ab:2, ba:1
    // 'ab' (w=2): a(initial), ##b, ab(initial) ; 'ba': b, ##a, ba
    val out = vocabRows(WordPiece.buildVocab(docs("ab ab ba"), "text",
      vocabSize = 100, maxPieceLen = 2))
      .map { case (p, ic, c) => (p, ic) -> c }.toMap
    assert(out == Map(
      ("a", false) -> 2L, ("##b", true) -> 2L, ("ab", false) -> 2L,
      ("b", false) -> 1L, ("##a", true) -> 1L, ("ba", false) -> 1L))
  }

  test("single forms (initial AND continuation) survive the top-K cut") {
    val out = vocabRows(WordPiece.buildVocab(docs("aa aa aa ab"), "text",
      vocabSize = 1, maxPieceLen = 2))
      .map { case (p, ic, _) => (p, ic) }.toSet
    // vocabSize=1 keeps only the top piece, but every 1-code-point form
    // unions back — including the continuation form of the rare 'b'
    assert(Set(("a", false), ("##a", true), ("##b", true)).subsetOf(out),
      s"got $out")
  }

  test("vocab build is deterministic") {
    val d = docs("the cat sat on the mat", "a bat and a cat")
    val v1 = vocabRows(
      WordPiece.buildVocab(d, "text", vocabSize = 10, maxPieceLen = 3))
      .sortBy(r => (r._1, r._2)).toSeq
    val v2 = vocabRows(
      WordPiece.buildVocab(d, "text", vocabSize = 10, maxPieceLen = 3))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(v1 == v2)
  }

  test("literal-# words: initial '##…' surface stays distinct from continuation forms") {
    // word '##ab' (freq 1) + word 'zab' (freq 1): the continuation form
    // of 'a' (from both words) must NOT absorb the word-INITIAL '##a'
    // surface of '##ab' — they are different vocab entries
    val out = vocabRows(WordPiece.buildVocab(docs("##ab zab"), "text",
      vocabSize = 100, maxPieceLen = 3))
      .map { case (p, ic, c) => (p, ic) -> c }.toMap
    // initial surface '##a' occurs once (word '##ab' positions 1..3)
    assert(out(("##a", false)) == 1L, s"got $out")
    // continuation 'a': '##ab' has no bare 'a' continuation at len 1?
    //   '##ab': continuations ##, #a, ab → singles #, a, b at pos>0
    //   'zab':  continuations a, b, ab
    // → continuation-'a' display '##a' occurs 1 (from ##ab) + 1 (zab) = 2
    assert(out(("##a", true)) == 2L, s"got $out")
  }

  // -- greedy segment --------------------------------------------------

  test("greedy longest-match-first picks the longest piece at each position") {
    val vocab = Vocab.fromFlat(Set("un", "##aff", "##able", "##a", "##f",
      "##b", "##l", "##e", "u", "##n", "una"))
    // 'una' is in vocab and longer than 'un' → greedy takes it first,
    // then continues with continuation forms
    val seg = WordPiece.greedySegment("unaffable", vocab, maxPieceLen = 6)
    assert(seg.head == "una", s"got $seg")
    // with 'una' removed, the textbook segmentation appears
    val seg2 = WordPiece.greedySegment("unaffable",
      vocab.copy(initial = vocab.initial - "una"), 6)
    assert(seg2 == Seq("un", "##aff", "##able"), s"got $seg2")
  }

  test("initial vs continuation forms are distinct vocab entries") {
    // 'ab' in vocab only as continuation → position 0 cannot use it
    val vocab = Vocab(initial = Set("a", "b"),
      continuation = Set("##b", "##ab"))
    val seg = WordPiece.greedySegment("aab", vocab, maxPieceLen = 2)
    assert(seg == Seq("a", "##ab"), s"got $seg")
    val seg2 = WordPiece.greedySegment("ab", vocab, maxPieceLen = 2)
    assert(seg2 == Seq("a", "##b"), s"got $seg2")
  }

  test("a word-initial '##x' surface needs the INITIAL entry, not the continuation") {
    // vocab has continuation-'a' (display '##a') but no initial form
    // that covers '##a…' — the flat-string conflation would wrongly
    // match '##a' at position 0
    val contOnly = Vocab(initial = Set("z"), continuation = Set("##a"))
    val seg = WordPiece.greedySegment("##a", contOnly, maxPieceLen = 3)
    // no initial match at position 0 → whole-word code-point fallback
    assert(seg == Seq("#", "###", "##a"), s"got $seg")
    // with the true initial surface present, it matches at position 0
    val withInit = Vocab(initial = Set("##a"), continuation = Set.empty)
    val seg2 = WordPiece.greedySegment("##a", withInit, maxPieceLen = 3)
    assert(seg2 == Seq("##a"), s"got $seg2")
  }

  test("out-of-alphabet word falls back to code points, keeping ## convention") {
    val vocab = Vocab.fromFlat(Set("a", "##a"))
    val emoji = new String(Character.toChars(0x1F600))
    val seg = WordPiece.greedySegment(s"a${emoji}a", vocab, maxPieceLen = 2)
    assert(seg == Seq("a", "##" + emoji, "##a"), s"got $seg")
  }

  // -- encode ----------------------------------------------------------

  test("encode reconstructs every word exactly after stripping ## prefixes") {
    val d = docs("the cat sat on the mat", "unaffable bat", "")
    val vocab = Vocab.fromRows(
      vocabRows(WordPiece.buildVocab(d, "text",
        vocabSize = 20, maxPieceLen = 3)).map { case (p, ic, _) => (p, ic) })
    val out = WordPiece.encode(d, "doc_id", "text", vocab, maxPieceLen = 3)
      .select(col("doc_id"), col("wp_tokens"))
      .as[(Long, Seq[Seq[String]])].collect().toMap
    val norm = Seq("the cat sat on the mat", "unaffable bat", "")
    norm.zipWithIndex.foreach { case (t, i) =>
      val rec = out(i.toLong).map { pieces =>
        pieces.zipWithIndex.map { case (p, j) =>
          if (j == 0) p else p.stripPrefix("##")
        }.mkString
      }.mkString(" ")
      assert(rec == t, s"doc $i: '$rec' != '$t'")
      // every continuation piece carries the prefix, no initial does
      // (no '#' appears in this corpus, so the check is unambiguous)
      out(i.toLong).foreach { pieces =>
        pieces.zipWithIndex.foreach { case (p, j) =>
          assert((j > 0) == p.startsWith("##"),
            s"prefix convention broken in $pieces")
        }
      }
    }
  }

  test("encode stays lossless on words containing literal '#'s") {
    val d = docs("##ab a#b c##", "#")
    val vocab = Vocab.fromRows(
      vocabRows(WordPiece.buildVocab(d, "text",
        vocabSize = 50, maxPieceLen = 3)).map { case (p, ic, _) => (p, ic) })
    val out = WordPiece.encode(d, "doc_id", "text", vocab, maxPieceLen = 3)
      .select(col("doc_id"), col("wp_tokens"))
      .as[(Long, Seq[Seq[String]])].collect().toMap
    Seq("##ab a#b c##", "#").zipWithIndex.foreach { case (t, i) =>
      val rec = out(i.toLong).map { pieces =>
        pieces.zipWithIndex.map { case (p, j) =>
          if (j == 0) p else p.stripPrefix("##")
        }.mkString
      }.mkString(" ")
      assert(rec == t, s"doc $i: '$rec' != '$t'")
    }
  }

  test("encoding the training corpus never leaves the vocabulary") {
    val d = docs("some words repeat some words", "others do not")
    val rows = vocabRows(WordPiece.buildVocab(d, "text",
      vocabSize = 10, maxPieceLen = 4)).map { case (p, ic, _) => (p, ic) }
    val vocab = Vocab.fromRows(rows)
    val words = WordPiece.encode(d, "doc_id", "text", vocab, maxPieceLen = 4)
      .select(explode(col("wp_tokens")).as("w"))
      .as[Seq[String]].collect()
    words.foreach { pieces =>
      pieces.zipWithIndex.foreach { case (p, j) =>
        val ok = if (j == 0) vocab.initial.contains(p)
                 else vocab.continuation.contains(p)
        assert(ok, s"out-of-vocab piece '$p' at $j in $pieces")
      }
    }
  }
}
