package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Value-level checks for the corpus-curation operators: deterministic
  * splitting, decontamination, mixing weights, Gopher quality rules. */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents").persist()

  test("withSplit is deterministic and append-stable") {
    val a = Curation.withSplit(docs, "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // identical on re-run
    val b = Curation.withSplit(docs, "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    // appending new rows never reassigns existing ids
    val appended = docs.unionByName(docs.select(
      (col("doc_id") + 90000).as("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars")))
    val c = Curation.withSplit(appended, "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    a.foreach { case (id, s) => assert(c(id) === s) }
    // every label present and fractions roughly honored (md5 uniformity)
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size)
    assert(frac("train") > 0.8 && frac("train") < 0.97)
    assert(frac.getOrElse("val", 0.0) < 0.15 && frac.getOrElse("test", 0.0) < 0.15)
  }

  test("withSplit rejects fractions that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Curation.withSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("contamination finds planted eval copies at 1.0 and decontaminate drops them") {
    val evalDocs = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
      .unionByName(evalDocs.select((col("doc_id") + 50000).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars")))
    val res = Curation.contamination(train, evalDocs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val planted = evalDocs.select(col("doc_id") + 50000).collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      assert(res.contains(id) && res(id) === 1.0, s"planted $id not fully flagged")
    }
    val cleaned = Curation.decontaminate(
      train, evalDocs, "doc_id", "text", n = 3, maxContamination = 0.9)
    val keptIds = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    planted.foreach(id => assert(!keptIds.contains(id)))
    // docs with zero shared trigrams survive
    assert(keptIds.nonEmpty)
  }

  test("hashed Bloom prefilter: suspects cover every truly contaminated doc; bloom == exact output") {
    val evalDocs = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
      .unionByName(evalDocs.select((col("doc_id") + 50000).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars")))
    val thresh = 0.2
    // the suspect set (bloom estimate ≥ thresh, hashed-gram kernels) is
    // a SUPERSET of the truly-flagged set — the property the whole
    // prefilter design rides on
    val bits = Curation.evalBloom(evalDocs, "text", 3)
    val suspects = Curation.bloomSuspects(train, bits, "text", 3, thresh)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val trulyFlagged = Curation.contamination(train, evalDocs, "doc_id", "text", n = 3)
      .filter(col("contamination") >= thresh)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trulyFlagged.nonEmpty)
    assert(trulyFlagged.subsetOf(suspects),
      s"missed suspects: ${(trulyFlagged -- suspects).take(5)}")
    // end to end, the bloom plan returns EXACTLY the exact plan's rows
    val viaBloom = Curation.decontaminateBloom(
      train, evalDocs, "doc_id", "text", n = 3, maxContamination = thresh)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaExact = Curation.decontaminate(
      train, evalDocs, "doc_id", "text", n = 3, maxContamination = thresh)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaBloom === viaExact)
  }

  test("temperatureWeights: α=0.5 upweights scarce domains and q sums to 1") {
    val df = (Seq.fill(90)("web") ++ Seq.fill(10)("code")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "source")
    val w = Curation.temperatureWeights(df, "source")
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val (pWeb, qWeb) = w("web")
    val (pCode, qCode) = w("code")
    assert(math.abs(qWeb + qCode - 1.0) < 1e-12)
    // α < 1 compresses the share gap: scarce up, dominant down
    assert(qCode > pCode && qWeb < pWeb)
    // exact: q_code = sqrt(10) / (sqrt(90) + sqrt(10)) = 0.25
    assert(math.abs(qCode - 0.25) < 1e-9)
  }

  test("mixingWeights: scarcest domain caps the total, rates stay ≤ 1") {
    val df = Seq.tabulate(100)(i =>
      (i.toLong, if (i < 60) "web" else if (i < 90) "books" else "code"))
      .toDF("id", "source")
    val w = Curation.mixingWeights(df, "source",
        Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getLong(4))).toMap
    // code is scarcest: 10 rows / 0.25 = 40 achievable total
    assert(w("code") === ((10L, 1.0, 10L)))
    assert(w("web") === ((60L, 40 * 0.5 / 60.0, 20L)))
    assert(w("books") === ((30L, 40 * 0.25 / 30.0, 10L)))
  }

  test("sampleToMix realizes the target composition approximately") {
    val df = Seq.tabulate(2000)(i =>
      (i.toLong, if (i % 2 == 0) "web" else "code")).toDF("id", "source")
    val out = Curation.sampleToMix(df, "id", "source",
        Map("web" -> 0.8, "code" -> 0.2))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // achievable total = min(1000/0.8, 1000/0.2) = 1250 → 1000 web, 250 code
    assert(out("web") > 900 && out("web") <= 1000)
    assert(math.abs(out("code") - 250L) < 60)
    // deterministic: identical on re-run
    val again = Curation.sampleToMix(df, "id", "source",
        Map("web" -> 0.8, "code" -> 0.2))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === again)
  }

  test("sampleToMix composes with withSplit without hash correlation") {
    val docs = (0L until 3000L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val mixed = Curation.sampleToMix(docs, "doc_id", "source",
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
    val splits = Curation.withSplit(mixed, "doc_id")
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // on the UNSALTED stream every sampled survivor had bucket < rate ≤
    // 0.9 → 100% train; salted streams must keep val/test populated
    assert(splits.getOrElse("val", 0L) > 0L, s"val empty: $splits")
    assert(splits.getOrElse("test", 0L) > 0L, s"test empty: $splits")
  }

  test("blocklist filter drops only docs linking to blocked domains") {
    val df = Seq(
      (1L, "read https://good.org/a and https://evil.com/b"),
      (2L, "only https://good.org/c here"),
      (3L, "no links at all"),
      (4L, "tricky https://evil.com.safe.org/x is not evil.com")).toDF("id", "text")
    val kept = Curation.blocklistFilter(df, "text", Seq("evil.com"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L, 4L))
    val counts = df.select(col("id"), TextAnalysis.urlCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts === Map(1L -> 2, 2L -> 1, 3L -> 0, 4L -> 1))
  }

  test("sentence count handles terminal runs and end-of-text") {
    val df = Seq(
      (1L, "One. Two! Three?"),
      (2L, "Ellipsis... still one stop here. Done"),
      (3L, "no terminal punctuation")).toDF("id", "text")
    val n = df.select(col("id"), TextAnalysis.sentenceCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(n === Map(1L -> 3, 2L -> 2, 3L -> 0))
  }

  test("gopher rules fire individually on crafted documents") {
    val longProse =
      ("the quick brown foxes jumped over several lazy dogs near that barn " * 5).trim
    val rows = Seq(
      (1L, longProse),                                  // passes all
      (2L, "short text only"),                          // word count
      (3L, ("a " * 60).trim),                           // mean word len < 3
      (4L, (("the supercalifragilistic " * 30)).trim),  // mean len > 10
      (5L, ("the cat # ... # ... # ... # ... sat " * 10).trim), // symbols
      (6L, ("12 34 56 78 90 11 22 33 44 55 " * 6).trim),// alpha words
      (7L, ("zebra quartz vivid jump " * 15).trim))     // no stopwords
      .toDF("doc_id", "text")
    val flags = Curation.gopherFlags(col("text"), minWords = 30)
    val out = rows.select(
        (col("doc_id") +: flags.map { case (n, c) => c.as(n) }) :+
          Curation.gopherKeep(col("text"), minWords = 30).as("keep"): _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(7), "healthy prose must pass")
    assert(!out(2L).getBoolean(2), "word-count rule")
    assert(!out(3L).getBoolean(3), "mean-word-length low rule")
    assert(!out(4L).getBoolean(3), "mean-word-length high rule")
    assert(!out(5L).getBoolean(4), "symbol-ratio rule")
    assert(!out(6L).getBoolean(5), "alpha-words rule")
    assert(!out(7L).getBoolean(6), "stopword rule")
    Seq(2L, 3L, 4L, 5L, 6L, 7L).foreach(id =>
      assert(!out(id).getBoolean(7), s"doc $id must be rejected"))
  }

  test("stratifiedSample: exact quotas, deterministic, append-stable") {
    val df = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val s1 = Curation.stratifiedSample(df, "id", "src", perStratum = 10)
    val counts = s1.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("src0" -> 10L, "src1" -> 10L, "src2" -> 10L))
    // deterministic across runs
    val ids1 = s1.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Curation.stratifiedSample(df, "id", "src", perStratum = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    // a stratum under quota keeps everything
    val tiny = (0L until 4L).map(i => (i, "only")).toDF("id", "src")
    assert(Curation.stratifiedSample(tiny, "id", "src", 10).count() === 4)
    // append stability: a kept id can only be displaced by NEW ids that
    // hash below it, never resampled arbitrarily — growing the corpus
    // keeps the sample a subset of (old sample ∪ new rows)
    val grown = df.unionByName(
      (300L until 600L).map(i => (i, s"src${i % 3}")).toDF("id", "src"))
    val ids3 = Curation.stratifiedSample(grown, "id", "src", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids3.subsetOf(ids1 ++ (300L until 600L)))
  }

  test("linearTextScore: exact hand score, null on empty, zero-shuffle plan") {
    val w = Curation.standInWeightsMilli(256)
    // hand-compute: score("a b") = (w[h(a)] + w[h(b)]) / 2000
    def idx(t: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
      Integer.parseInt(hex, 16) % 256
    }
    val expected = (w(idx("a")) + w(idx("b"))).toDouble / 2000.0
    val df = Seq((1L, "a b"), (2L, "   ")).toDF("doc_id", "text")
      .select(col("doc_id"), Curation.linearTextScore(col("text"), w).as("s"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L) === Some(expected))
    assert(rows(2L) === None, "token-less doc scores NULL")
    // inference is row-local: the scoring plan contains no Exchange
    val plan = docs.select(Curation.linearTextScore(col("text"), w))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classifier inference shuffled:\n$plan")
  }

  test("canonicalizeUrl: case, fragments, utm params, param order all normalize") {
    val urls = Seq(
      "HTTPS://Example.COM/p/1?b=2&utm_source=x&a=1#frag",
      "https://example.com/p/1?a=1&b=2",
      "https://example.com/p/1?utm_campaign=y&a=1&b=2",
      "http://other.org",
      "http://other.org/#top").toDF("url")
    val canon = urls.select(Curation.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(canon.take(3).toSet === Set("https://example.com/p/1?a=1&b=2"))
    assert(canon(3) === "http://other.org/" && canon(4) === "http://other.org/")
    // a '?' INSIDE the fragment is fragment content, not a query — it
    // must not be resurrected as parameters
    val fragQ = Seq("http://a.com/page#sec?b=1", "http://a.com/page")
      .toDF("url").select(Curation.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(fragQ(0) === "http://a.com/page" && fragQ(1) === "http://a.com/page")
  }

  test("codeSignals: crafted code flags, prose does not, ratios hand-check") {
    val code = "def f():\n    return (x = 1);\n    import y\nclass Z:"
    val prose = "the quick brown fox jumps over the lazy dog again today"
    val out = Seq((1L, code), (2L, prose)).toDF("id", "text")
      .select(col("id"), Curation.codeSignals(col("text")).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(out(1L).getBoolean(3) === true, "code must flag")
    assert(out(2L).getBoolean(3) === false, "prose must not flag")
    assert(out(2L).getDouble(0) === 0.0 && out(2L).getDouble(1) === 0.0)
    // code doc: 4 lines, 2 indented with >= 2 spaces
    assert(out(1L).getDouble(1) === 0.5)
    assert(out(1L).getInt(2) >= 3) // def, return, import, class
  }

  test("shardShuffle: permutation, balance, determinism, shard-local ranks") {
    val n = 1000L
    val df = (0L until n).map(i => Tuple1(i)).toDF("id")
    val out = Curation.shardShuffle(df, "id", nShards = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every row exactly once, (shard, pos) unique and dense per shard
    assert(out.map(_._1).toSet === (0L until n).toSet)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq)
    }
    // md5 uniformity: no shard more than 2x the mean
    val sizes = out.groupBy(_._2).view.mapValues(_.size)
    assert(sizes.size === 8 && sizes.values.max < 2 * n / 8)
    // deterministic re-run
    val again = Curation.shardShuffle(df, "id", 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // actually shuffled: shard-0 order is not id order
    val s0 = out.filter(_._2 == 0).sortBy(_._3).map(_._1).toSeq
    assert(s0 !== s0.sorted)
  }

  test("splitOf is withSplit's column: pair frames recover splits join-free") {
    val viaDf = Curation.withSplit(docs, "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaCol = docs.select(col("doc_id"),
        Curation.splitOf(col("doc_id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaDf === viaCol)
  }

  test("dsirTargetAffinity: exact smoothed ratios, target vocab kept, rest dropped") {
    // disjoint vocabularies with hand-verified distinct md5%256 buckets
    // (apple 56, banana 179, cherry 164 / dog 216, elephant 180, fox 149)
    val target = (0L until 10L).map(i => (i, "apple banana cherry", "t"))
    val back = (100L until 110L).map(i => (i, "dog elephant fox", "r"))
    val corpus = (target ++ back).toDF("doc_id", "text", "lang")
    val out = Curation.dsirTargetAffinity(
        corpus, "doc_id", "text", col("lang") === "t", buckets = 256)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.length === 20)
    // golden model: per-bucket c_t=10,c_r=10 (target vocab) / c_t=0,c_r=10
    // (background vocab); T_t=30, T_r=60, B=256
    val ratioA = ((10.0 + 1) * (60 + 256)) / ((10 + 1) * (30 + 256))
    val ratioB = (1.0 * (60 + 256)) / ((10 + 1) * (30 + 256))
    out.foreach { case (id, n, aff, keep) =>
      assert(n === 3)
      val expected = if (id < 100) ratioA else ratioB
      assert(math.abs(aff - expected) < 1e-9, s"doc $id: $aff != $expected")
      assert(keep === (id < 100))
    }
  }

  test("domainBalance flattens the mixture: downsample big, cap epochs on tiny") {
    val mk = (dom: String, n: Int, toks: Int) =>
      (0 until n).map(i => (s"$dom-$i", dom, Seq.fill(toks)("w").mkString(" ")))
    val corpus = (mk("x", 100, 10) ++ mk("y", 10, 5) ++ mk("z", 1, 1))
      .toDF("id", "source", "text")
    val out = Curation.domainBalance(corpus, "source", "text")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // t_total = 1051, target = 1051 div 6 = 175
    assert(out("x") === ((100L, 1000L, 175L, 0.175, 0.175)))
    assert(out("y") === ((10L, 50L, 175L, 1.0, 3.5)))
    assert(out("z") === ((1L, 1L, 175L, 1.0, 4.0)))
  }

  test("evalContaminationReport: planted copies fully leak, clean docs get zero ROWS") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("id", "text")
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"), // exact copy
      (101L, "alpha beta gamma nine ten eleven twelve thirteen"), // partial
      (102L, "zzz yyy xxx www vvv uuu ttt sss")) // no overlap
      .toDF("id", "text")
    val out = Curation.evalContaminationReport(train, eval, "id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5))).toMap
    // exact copy: every trigram covered by exactly one train doc
    assert(out(100L) === ((6, 6L, 1L, 1.0, true)))
    // partial: exactly the "alpha beta gamma" trigram is shared
    val (n101, c101, t101, cov101, leak101) = out(101L)
    assert(n101 === 6 && c101 === 1L && t101 === 1L && !leak101)
    assert(math.abs(cov101 - 1.0 / 6.0) < 1e-12)
    // clean doc: PRESENT with zeros — absence of evidence is a row
    assert(out(102L) === ((6, 0L, 0L, 0.0, false)))
  }

  test("evalContaminationReport hot-gram cap: exact equality with the naive plan") {
    // a boilerplate phrase shared by most of train AND several eval
    // docs — the input shape that makes the naive gram join quadratic
    // (its hot-gram pair stream filled the disk in the ×100 campaign).
    // The capped plan must produce BYTE-IDENTICAL output: hot grams are
    // covered by definition and the distinct-train-doc count decomposes
    // as |cold ∪ hot| = n_cold + n_hot − n_cold∩hot over hot-gram masks.
    val boiler = "click here to subscribe to our newsletter today"
    val train = (1L to 40L).map { i =>
      val unique = s"unique$i body$i content$i word$i extra$i"
      (i, if (i <= 30) s"$unique $boiler" else unique)
    }.toDF("id", "text")
    val eval = Seq(
      (100L, s"evalone evaltwo evalthree $boiler"),       // hot + no cold overlap
      (101L, "unique7 body7 content7 word7 extra7"),      // cold full leak
      (102L, s"unique9 body9 content9 word9 extra9 $boiler"), // cold + hot
      (103L, "clean doc with no shared phrases at all zzz"))  // nothing
      .toDF("id", "text")
    val naive = Curation.evalContaminationReport(train, eval, "id", "text", n = 3)
      .orderBy("eval_id").collect().map(_.toSeq)
    val capped = Curation.evalContaminationReport(train, eval, "id", "text",
        n = 3, hotGramDf = Some(10L))
      .orderBy("eval_id").collect().map(_.toSeq)
    assert(capped.toSeq === naive.toSeq,
      s"capped plan diverged:\nnaive=${naive.toSeq}\ncapped=${capped.toSeq}")
    // sanity: the hot path actually engaged (boilerplate trigrams have
    // train df 30 > 10) and the shape is right: eval 100 is covered
    // only via hot grams yet counts all 30 boilerplate train docs
    val by = capped.map(r => r.head -> r).toMap
    assert(by(100L)(3).asInstanceOf[Long] === 30L) // n_train_docs
    assert(by(103L)(2).asInstanceOf[Long] === 0L)  // clean: zero coverage
  }

  test("dsir census is additive: split-merge equals whole-corpus, unseen buckets smooth") {
    val target = col("lang") === "en"
    val full = Curation.dsirCensus(docs, "text", target)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val merged = Curation.dsirCensusMerge(Seq(
        Curation.dsirCensus(docs.filter(col("doc_id") % 2 === 0), "text", target),
        Curation.dsirCensus(docs.filter(col("doc_id") % 2 =!= 0), "text", target)))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(full === merged)
    // scoring NEW text against a historical census: a token whose
    // bucket the census never saw takes the smoothed default, not a
    // silent drop — every token still counts
    val novel = Seq((999L, "zzzunseen zzztokens zzzhere")).toDF("doc_id", "text")
    val tinyCensus = Curation.dsirCensus(
      docs.filter(col("doc_id") < 5), "text", target, buckets = 65536)
    val scored = Curation.dsirScoreWithCensus(
        novel, "doc_id", "text", tinyCensus, buckets = 65536)
      .collect()
    // with an inner join the unseen buckets would vanish and n_tokens
    // would come up short; the left join + default keeps all 3
    assert(scored.length === 1 && scored(0).getLong(1) === 3L)
    assert(!scored(0).isNullAt(2))
  }

  test("resampleToBalance executes the plan: heavy shrinks, light repeats, cap binds") {
    val mk = (dom: String, n: Int, toks: Int) =>
      (0 until n).map(i => (s"$dom-$i".hashCode.toLong & 0xffffffL, dom,
        Seq.fill(toks)("w").mkString(" ")))
    val corpus = (mk("x", 100, 10) ++ mk("y", 10, 5) ++ mk("z", 1, 1))
      .toDF("id", "source", "text")
    val out = Curation.resampleToBalance(corpus, "id", "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    val byDom = out.groupBy(_._1)
    // x (epochs 0.175): a strict subset, every survivor exactly once
    val x = byDom("x")
    assert(x.length < 50 && x.length > 2, s"x kept ${x.length} of 100")
    assert(x.forall(_._3 == 1))
    assert(x.map(_._2).distinct.length === x.length)
    // y (epochs 3.5): 3 full passes + a fractional subset — between
    // 30 and 40 rows, ids with a 4th copy are a strict subset
    val y = byDom("y")
    assert(y.length >= 30 && y.length <= 40, s"y emitted ${y.length}")
    assert(y.count(_._3 <= 3) === 30)
    // z (epochs capped at 4.0): exactly 4 copies of the one doc
    val z = byDom("z")
    assert(z.length === 4 && z.map(_._3).sorted.toSeq === Seq(1, 2, 3, 4))
    // deterministic re-run
    val again = Curation.resampleToBalance(corpus, "id", "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    assert(out.sortBy(r => (r._1, r._2, r._3)).toSeq ===
      again.sortBy(r => (r._1, r._2, r._3)).toSeq)
  }

  test("corpusDiff classifies added/removed/changed/unchanged; NULL text is present") {
    val old = Seq((1L, "one"), (2L, "two"), (3L, "three"),
        (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val nw = Seq((2L, "two"), (3L, "three CHANGED"), (4L, "four"),
        (5L, "now populated"))
      .toDF("doc_id", "text")
    val out = Curation.corpusDiff(old, nw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // 5: NULL text in old is a PRESENT doc (hashes as '') — the diff
    // must read it as changed, never as added
    assert(out === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added", 5L -> "changed"))
  }

  test("epochPlan: repeat under-represented, downsample over-represented, cap binds") {
    // a: 100 tokens, b: 10 tokens, c: 1 token (10 one-word docs etc.)
    val corpus =
      (1 to 10).map(i => (s"a$i", "a", Seq.fill(10)("w").mkString(" "))) ++
      (1 to 10).map(i => (s"b$i", "b", "w")) ++
      Seq(("c1", "c", "w"))
    val df = corpus.toDF("id", "source", "text")
    val plan = Curation.epochPlan(df, "source", "text",
        Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25),
        budgetTokens = 80L, maxEpochs = 4.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(4), r.getDouble(5), r.getDouble(6),
          r.getLong(7))).toMap
    // a: avail 100, target 40 -> downsample rate 0.4, planned 40
    assert(plan("a") === ((100L, 40L, 0.4, 0.4, 40L)))
    // b: avail 10, target 20 -> 2 epochs, planned 20
    assert(plan("b") === ((10L, 20L, 1.0, 2.0, 20L)))
    // c: avail 1, target 20 -> epochs capped at 4, planned 4
    assert(plan("c") === ((1L, 20L, 1.0, 4.0, 4L)))
  }

  test("selectToBudget: level descent, boundary sub-prefix, never overshoots") {
    import spark.implicits._
    // five docs, 5 tokens each; levels q=3 {1,2}, q=2 {3,4}, q=1 {5}.
    // id-hash sub-buckets (md5 % 256): 3→203, 4→127 — doc 4 is the
    // ascending-prefix pick at the boundary level.
    val df = Seq(
      (1L, "t t t t t", 3L), (2L, "t t t t t", 3L),
      (3L, "t t t t t", 2L), (4L, "t t t t t", 2L),
      (5L, "t t t t t", 1L)).toDF("doc_id", "text", "q")
    def ids(budget: Long) =
      Curation.selectToBudget(df, "doc_id", "text", "q", budget)
        .collect().map(_.getLong(0)).toSet
    assert(ids(100L) === Set(1L, 2L, 3L, 4L, 5L)) // everything fits
    assert(ids(13L) === Set(1L, 2L))   // q2 boundary, r=3 < any sub
    assert(ids(16L) === Set(1L, 2L, 4L)) // r=6 fits ONE sub: 127 < 203
    assert(ids(4L) === Set.empty)      // even the top level overflows
    // the selection never overshoots the budget
    val picked = Curation.selectToBudget(df, "doc_id", "text", "q", 16L)
      .agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    assert(picked <= 16L)
  }

  test("preferencePairs: extremes pairing, gap filter, self-pair exclusion") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 100L), ("a", 2L, 90L), ("a", 3L, 50L), ("a", 4L, 10L),
      ("b", 5L, 30L), ("b", 6L, 25L), // gap 5 < 10 → filtered
      ("c", 7L, 40L)                  // singleton: top = bottom → excluded
    ).toDF("source", "doc_id", "n_chars")
    val got = Curation.preferencePairs(df, "doc_id", "n_chars", "source",
        k = 2, minGap = 10L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // a: rank1 = (100 vs 10), rank2 = (90 vs 50); b gap too small; c self
    assert(got.toSeq === Seq(
      ("a", 1, 1L, 100L, 4L, 10L),
      ("a", 2, 2L, 90L, 3L, 50L)))
  }

  test("perceptronTrain: exact update rule, convergence stops updates") {
    import spark.implicits._
    // buckets (md5 % 256): good=95, bad=230, nice=100, ugly=204 — no
    // collisions, so the update arithmetic is exactly checkable
    val train = Seq(
      (1L, "good nice", 1L), (2L, "bad ugly", -1L)).toDF("doc_id", "text", "y")
    val w = Curation.perceptronTrain(train, "doc_id", "text", "y",
      dim = 256, epochs = 3)
    // epoch 1: w=0, both docs misclassified (y·0 <= 0) → +1 on good/nice
    // buckets, -1 on bad/ugly; epochs 2-3: both margins correct, no
    // further updates — the exact batch-perceptron trajectory
    assert(w(95) === 1L && w(100) === 1L)
    assert(w(230) === -1L && w(204) === -1L)
    assert(w.map(math.abs).sum === 4L)
    // margins: exact integer sums of bucket weights
    val m = Seq((1L, "good good bad"), (2L, ""), (3L, "ugly"))
      .toDF("id", "text")
      .select(col("id"), Curation.perceptronMargin(col("text"), w).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(1L -> 1L, 2L -> 0L, 3L -> -1L))
  }

  test("mooreLewisScores ranks domain-like pool docs above general-like ones") {
    import spark.implicits._
    val inDomain = Seq(
      (1L, "alpha beta alpha beta gamma"),
      (2L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val general = Seq(
      (3L, "delta epsilon delta epsilon gamma"),
      (4L, "delta epsilon delta epsilon")).toDF("doc_id", "text")
    val pool = Seq(
      (10L, "alpha beta alpha beta"),   // reuses in-domain transitions
      (11L, "delta epsilon delta epsilon") // reuses general transitions
    ).toDF("doc_id", "text")
    val got = Curation.mooreLewisScores(inDomain, general, pool,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got(10L) > 0.0, "domain-like doc must score positive")
    assert(got(11L) < 0.0, "general-like doc must score negative")
    assert(got(10L) > got(11L))
  }
}
