package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WordPiece tokenizer semantics: the positional vocab census
  * hand-count, single-form retention below the cut, greedy
  * longest-match-first behavior (the BERT `un ##aff ##able` shape),
  * losslessness of the ## reconstruction, code-point fallback, and
  * vocab-build determinism. */
class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  // -- vocab census ----------------------------------------------------

  test("vocab census hand-count: positional forms weighted by word frequency") {
    // "ab ab ba" → word census ab:2, ba:1
    // 'ab' (w=2): a(initial), ##b, ab(initial) ; 'ba': b, ##a, ba
    val out = WordPiece.buildVocab(docs("ab ab ba"), "text",
      vocabSize = 100, maxPieceLen = 2)
      .as[(String, Long)].collect().toMap
    assert(out == Map(
      "a" -> 2L, "##b" -> 2L, "ab" -> 2L,
      "b" -> 1L, "##a" -> 1L, "ba" -> 1L))
  }

  test("single forms (initial AND continuation) survive the top-K cut") {
    val out = WordPiece.buildVocab(docs("aa aa aa ab"), "text",
      vocabSize = 1, maxPieceLen = 2)
      .as[(String, Long)].collect().toMap
    // vocabSize=1 keeps only the top piece, but every 1-code-point form
    // unions back — including the continuation form of the rare 'b'
    assert(Set("a", "##a", "##b").subsetOf(out.keySet), s"got $out")
  }

  test("vocab build is deterministic") {
    val d = docs("the cat sat on the mat", "a bat and a cat")
    val v1 = WordPiece.buildVocab(d, "text", vocabSize = 10, maxPieceLen = 3)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val v2 = WordPiece.buildVocab(d, "text", vocabSize = 10, maxPieceLen = 3)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(v1 == v2)
  }

  // -- greedy segment --------------------------------------------------

  test("greedy longest-match-first picks the longest piece at each position") {
    val vocab = Set("un", "##aff", "##able", "##a", "##f", "##b", "##l",
      "##e", "u", "##n", "una")
    // 'una' is in vocab and longer than 'un' → greedy takes it first,
    // then continues with continuation forms
    val seg = WordPiece.greedySegment("unaffable", vocab, maxPieceLen = 6)
    assert(seg.head == "una", s"got $seg")
    // with 'una' removed, the textbook segmentation appears
    val seg2 = WordPiece.greedySegment("unaffable", vocab - "una", 6)
    assert(seg2 == Seq("un", "##aff", "##able"), s"got $seg2")
  }

  test("initial vs continuation forms are distinct vocab entries") {
    // 'ab' in vocab only as continuation → position 0 cannot use it
    val vocab = Set("a", "##b", "##ab", "b")
    val seg = WordPiece.greedySegment("aab", vocab, maxPieceLen = 2)
    assert(seg == Seq("a", "##ab"), s"got $seg")
    val seg2 = WordPiece.greedySegment("ab", vocab, maxPieceLen = 2)
    assert(seg2 == Seq("a", "##b"), s"got $seg2")
  }

  test("out-of-alphabet word falls back to code points, keeping ## convention") {
    val vocab = Set("a", "##a")
    val emoji = new String(Character.toChars(0x1F600))
    val seg = WordPiece.greedySegment(s"a${emoji}a", vocab, maxPieceLen = 2)
    assert(seg == Seq("a", "##" + emoji, "##a"), s"got $seg")
  }

  // -- encode ----------------------------------------------------------

  test("encode reconstructs every word exactly after stripping ## prefixes") {
    val d = docs("the cat sat on the mat", "unaffable bat", "")
    val vocab: Set[String] = WordPiece.buildVocab(d, "text",
      vocabSize = 20, maxPieceLen = 3)
      .as[(String, Long)].collect().map(_._1).toSet
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

  test("encoding the training corpus never leaves the vocabulary") {
    val d = docs("some words repeat some words", "others do not")
    val vocab: Set[String] = WordPiece.buildVocab(d, "text",
      vocabSize = 10, maxPieceLen = 4)
      .as[(String, Long)].collect().map(_._1).toSet
    val pieces = WordPiece.encode(d, "doc_id", "text", vocab, maxPieceLen = 4)
      .select(explode(flatten(col("wp_tokens"))).as("p"))
      .as[String].collect()
    assert(pieces.forall(vocab.contains),
      s"out-of-vocab pieces: ${pieces.filterNot(vocab.contains).toSeq}")
  }
}
