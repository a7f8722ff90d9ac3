package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram-LM tokenizer semantics: exact-integer Viterbi vs brute-force
  * enumeration, losslessness, training determinism, monotone objective,
  * single-char fallback, and the seed-census hand-count. */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  // -- seed census -----------------------------------------------------

  test("seed census hand-count: substrings weighted by word frequency") {
    // "ab ab ba" → census ab:2, ba:1
    // pieces of 'ab' (w=2): a,b,ab ; of 'ba' (w=1): b,a,ba
    val out = Unigram.seedCensus(docs("ab ab ba"), "text",
      maxPieceLen = 2, seedSize = 100)
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 3L, "b" -> 3L, "ab" -> 2L, "ba" -> 1L))
  }

  test("seed census always retains single chars below the top-K cut") {
    // seedSize=1 keeps only the top piece, but 1-char pieces union back
    val out = Unigram.seedCensus(docs("aa aa aa ab"), "text",
      maxPieceLen = 2, seedSize = 1)
      .as[(String, Long)].collect().toMap
    assert(out.contains("a") && out.contains("b"))
  }

  // -- Viterbi ---------------------------------------------------------

  /** Brute-force best segmentation by enumerating all 2^(n-1) splits
    * with exact rational comparison (cross-multiplied BigInt). */
  private def bruteBest(word: String, counts: Map[String, Long],
      total: BigInt, maxLen: Int): Seq[Seq[String]] = {
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(maxLen, w.length)).flatMap { l =>
        val h = w.substring(0, l)
        if (!counts.contains(h)) Nil
        else segs(w.substring(l)).map(h +: _)
      }
    val all = segs(word)
    if (all.isEmpty) return Nil
    def score(s: Seq[String]) =
      (s.map(p => BigInt(counts(p))).product, s.length)
    // max by p/T^k: a >= b iff pA*T^kB >= pB*T^kA
    val best = all.reduceLeft { (a, b) =>
      val (pa, ka) = score(a); val (pb, kb) = score(b)
      val cmp = (pa * total.pow(kb)).compare(pb * total.pow(ka))
      if (cmp > 0) a else if (cmp < 0) b
      else if (ka != kb) { if (ka < kb) a else b }
      else a
    }
    all.filter { s =>
      val (ps, ks) = score(s); val (pb, kb) = score(best)
      (ps * total.pow(kb)) == (pb * total.pow(ks))
    }
  }

  test("viterbi matches brute-force enumeration on every short word") {
    val counts = Map("a" -> 5L, "b" -> 3L, "c" -> 2L, "ab" -> 7L,
      "bc" -> 6L, "abc" -> 4L, "ca" -> 1L)
    val total: BigInt = counts.values.map(BigInt(_)).sum
    val words = Seq("a", "ab", "abc", "abca", "cabc", "abcabc", "cccc", "bca")
    words.foreach { w =>
      val v = Unigram.viterbiSegment(w, counts, total, 3)
      val bests = bruteBest(w, counts, total, 3)
      assert(v != null, s"no path for $w")
      assert(v.mkString("") == w, s"lossy segmentation of $w")
      assert(bests.exists(_ == v.toSeq),
        s"$w: viterbi ${v.toSeq} not among optimal $bests")
    }
  }

  test("viterbi prefers the higher-probability piece over chars") {
    // 'ab' has huge count → one piece beats two chars
    val counts = Map("a" -> 1L, "b" -> 1L, "ab" -> 1000L)
    val total: BigInt = counts.values.map(BigInt(_)).sum
    assert(Unigram.viterbiSegment("ab", counts, total, 2).toSeq == Seq("ab"))
    // with a rare 'xy' piece, two common chars win: (1000*1000)/T² vs 2/T
    val c2 = Map("x" -> 1000L, "y" -> 1000L, "xy" -> 2L)
    val t2: BigInt = c2.values.map(BigInt(_)).sum
    val pick = Unigram.viterbiSegment("xy", c2, t2, 2).toSeq
    assert(pick == Seq("x", "y") ||
      (BigInt(2) * t2) > (BigInt(1000L) * BigInt(1000L)))
  }

  test("viterbi returns null when the word is not segmentable") {
    val counts = Map("a" -> 1L)
    assert(Unigram.viterbiSegment("ax", counts, BigInt(2), 2) == null)
  }

  // -- training --------------------------------------------------------

  test("training is deterministic and keeps the table within bounds") {
    val d = docs("the cat sat on the mat", "the bat sat on the hat",
      "a cat and a bat", "mat hat bat cat")
    val t1 = Unigram.train(d, "text", vocabSize = 12, maxPieceLen = 3,
      iterations = 2, seedSize = 50)
    val t2 = Unigram.train(d, "text", vocabSize = 12, maxPieceLen = 3,
      iterations = 2, seedSize = 50)
    assert(t1.toSeq == t2.toSeq)
    val singles = t1.count(_.piece.length == 1)
    assert(t1.length <= 12 + singles,
      "pruned table exceeds vocabSize + retained single chars")
    // multi-char pieces only exist because the EM census used them;
    // alphabet singles survive every prune even at count 0 (the
    // stranded-word guarantee), so only the multi-char bound holds
    assert(t1.filter(_.piece.length > 1).forall(_.count > 0))
  }

  test("viterbi-EM objective is non-decreasing across iterations") {
    val d = docs("banana bandana", "banana banana cabana", "nab ban ana")
    def corpusLogScore(pieces: Array[Unigram.Piece]): Double = {
      val counts = pieces.map(p => p.piece -> (p.count + 1L)).toMap
      val total: BigInt = counts.valuesIterator.map(BigInt(_)).sum
      val logT = math.log(total.toDouble)
      val words = d.select(explode(TextAnalysis.tokens(
        TextAnalysis.normalize(col("text")))).as("w"))
        .as[String].collect()
      words.map { w =>
        val seg = Unigram.viterbiSegment(w, counts, total, 3)
        assert(seg != null)
        seg.map(p => math.log(counts(p).toDouble) - logT).sum
      }.sum
    }
    // score iteration i's table on the SAME corpus: each EM step may
    // only improve (or keep) the Viterbi objective
    val scores = (1 to 3).map { it =>
      corpusLogScore(Unigram.train(d, "text", vocabSize = 30,
        maxPieceLen = 3, iterations = it, seedSize = 100))
    }
    assert(scores.sliding(2).forall { case Seq(a, b) => b >= a - 1e-9 },
      s"objective regressed: $scores")
  }

  // -- encode ----------------------------------------------------------

  test("encode reconstructs every word exactly and stays in-vocab") {
    val d = docs("hello world", "worldly hello", "low lowly hell")
    val pieces = Unigram.train(d, "text", vocabSize = 20, maxPieceLen = 3,
      iterations = 2, seedSize = 100)
    val vocab = pieces.map(_.piece).toSet
    val out = Unigram.encode(d, "doc_id", "text", pieces, maxPieceLen = 3)
      .select(col("doc_id"), col("unigram_tokens"))
      .as[(Long, Seq[Seq[String]])].collect().toMap
    val texts = d.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    texts.foreach { case (id, t) =>
      val norm = t.toLowerCase.trim.replaceAll("\\s+", " ")
      val rec = out(id).map(_.mkString("")).mkString(" ")
      assert(rec == norm, s"doc $id: $rec != $norm")
      assert(out(id).flatten.forall(vocab.contains),
        s"doc $id emitted out-of-vocab pieces")
    }
  }

  test("aggressive pruning never strands a word: seed singles survive training") {
    // 'q' appears only inside 'qatar'; with vocabSize=1 every multi-char
    // piece is cut and most singles are unused in the final segmentation
    // round — the seed ALPHABET must still survive so 'qatar' stays
    // segmentable (and in-vocab) after training
    val d = docs("aaa aaa aaa qatar")
    val pieces = Unigram.train(d, "text", vocabSize = 1, maxPieceLen = 3,
      iterations = 2, seedSize = 100)
    val vocab = pieces.map(_.piece).toSet
    assert(Set("q", "a", "t", "r").subsetOf(vocab),
      s"seed singles pruned away: $vocab")
    val counts = pieces.map(p => p.piece -> (p.count + 1L)).toMap
    val total: BigInt = counts.values.map(BigInt(_)).sum
    val seg = Unigram.viterbiSegment("qatar", counts, total, 3)
    assert(seg != null && seg.mkString("") == "qatar")
    assert(seg.forall(vocab.contains))
  }

  test("out-of-alphabet fallback splits by CODE POINT, not UTF-16 char") {
    // U+1F600 is a surrogate pair; a Char split would emit two invalid
    // lone-surrogate pieces and break reconstruction
    val emoji = new String(Character.toChars(0x1F600))
    val pieces = Array(Unigram.Piece("a", 5L))
    val out = Unigram.encode(docs(s"a $emoji$emoji"), "doc_id", "text",
      pieces, maxPieceLen = 2)
      .select(col("unigram_tokens")).as[Seq[Seq[String]]].collect().head
    assert(out.map(_.mkString("")) == Seq("a", emoji + emoji))
    assert(out(1) == Seq(emoji, emoji), s"surrogate split: ${out(1)}")
  }

  test("pathological unbroken tokens segment chunk-wise, losslessly") {
    val long = "ab" * 2000 // 4000 chars, > DpChunkChars
    val counts = Map("a" -> 5L, "b" -> 3L, "ab" -> 100L)
    val total: BigInt = counts.values.map(BigInt(_)).sum
    val seg = Unigram.viterbiSegment(long, counts, total, 2)
    assert(seg != null && seg.mkString("") == long)
    assert(seg.forall(counts.contains))
  }

  // -- non-BMP (surrogate pair) handling -------------------------------

  test("DP look-back window counts CODE POINTS: non-BMP singles are reachable") {
    // '😀' is 2 UTF-16 chars; with maxPieceLen=1 a UTF-16 look-back of 1
    // would probe only the lone low surrogate and report unsegmentable
    val emoji = new String(Character.toChars(0x1F600))
    val counts = Map(emoji -> 3L)
    val seg = Unigram.viterbiSegment(emoji, counts, BigInt(3), 1)
    assert(seg != null && seg.toSeq == Seq(emoji), s"got $seg")
    // a 2-code-point piece containing a non-BMP char (3 UTF-16 units)
    // must be reachable under maxPieceLen=2
    val c2 = Map(emoji + "a" -> 100L, emoji -> 1L, "a" -> 1L)
    val t2: BigInt = c2.values.map(BigInt(_)).sum
    val seg2 = Unigram.viterbiSegment(emoji + "a", c2, t2, 2)
    assert(seg2 != null && seg2.toSeq == Seq(emoji + "a"), s"got $seg2")
  }

  test("chunk boundaries never split a surrogate pair") {
    // place a surrogate pair straddling the DpChunkChars offset: chars
    // 0..510 are 'a', then '😀' occupies UTF-16 indices 511-512
    val emoji = new String(Character.toChars(0x1F600))
    val word = ("a" * (Unigram.DpChunkChars - 1)) + emoji +
      ("a" * Unigram.DpChunkChars)
    val counts = Map("a" -> 5L, emoji -> 3L)
    val total: BigInt = counts.values.map(BigInt(_)).sum
    val seg = Unigram.viterbiSegment(word, counts, total, 2)
    assert(seg != null, "boundary split a surrogate pair")
    assert(seg.mkString("") == word)
    assert(seg.forall(counts.contains), s"lone surrogate piece emitted")
  }

  test("training alphabet retains non-BMP single code points across prunes") {
    val emoji = new String(Character.toChars(0x1F600))
    // the emoji is rare (one word) — a vocabSize=3 prune would drop it
    // without the alphabet guarantee, stranding its word from the census
    val d = docs(s"aa aa aa ab x$emoji")
    val pieces = Unigram.train(d, "text",
      vocabSize = 3, maxPieceLen = 2, iterations = 2, seedSize = 50)
    assert(pieces.exists(_.piece == emoji),
      s"non-BMP single dropped from alphabet: ${pieces.map(_.piece).toSeq}")
    // and encode of the training corpus stays in-vocab (no fallback)
    val vocab = pieces.map(_.piece).toSet
    val out = Unigram.encode(d, "doc_id", "text", pieces, maxPieceLen = 2)
      .select(col("unigram_tokens")).as[Seq[Seq[String]]].collect().head
    assert(out.flatten.forall(vocab.contains),
      s"out-of-vocab pieces: ${out.flatten.filterNot(vocab.contains)}")
  }

  test("encode falls back to characters for out-of-alphabet words") {
    val pieces = Array(Unigram.Piece("a", 5L), Unigram.Piece("b", 3L))
    val out = Unigram.encode(docs("ab zq"), "doc_id", "text", pieces,
      maxPieceLen = 2)
      .select(col("unigram_tokens")).as[Seq[Seq[String]]].collect().head
    assert(out.map(_.mkString("")) == Seq("ab", "zq"))
  }
}
