package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Pins the custom codegen expressions to their declarative reference
  * formulations (the interpreted higher-order-function pipelines they
  * replaced), over randomized inputs — a kernel bug that diverges from
  * `zip_with`/`aggregate`/`transform` semantics fails here, not in the
  * DuckDB gate. Also asserts whole-stage codegen actually inlines the
  * kernels (a silent fallback to interpreted eval would be a performance
  * regression the correctness gates can't see).
  */
class FunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def check(prop: Prop, n: Int = 30): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n)
        .withMinSize(0).withMaxSize(24), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  private val vecGen: Gen[List[Float]] =
    Gen.chooseNum(1, 24).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-5f, 5f)))

  test("cosine/dot/euclidean kernels match the HOF reference formulas") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
        .select(
          F.cosineSim(col("a"), col("b")).as("cos"),
          F.dot(col("a"), col("b")).as("dot"),
          F.euclidean(col("a"), col("b")).as("euc"),
          // reference formulations, interpreted HOFs. The division is
          // guarded: ANSI mode (Spark 4 default) throws DIVIDE_BY_ZERO on
          // a zero-norm vector where the fused kernel yields NaN — the
          // kernel's IEEE behavior is the contract, checked separately.
          {
            val na = aggregate(transform(col("a"), x =>
              x.cast(DoubleType) * x.cast(DoubleType)), lit(0.0), _ + _)
            val nb = aggregate(transform(col("b"), x =>
              x.cast(DoubleType) * x.cast(DoubleType)), lit(0.0), _ + _)
            when(na * nb > 0.0,
              aggregate(zip_with(col("a"), col("b"), (x, y) =>
                x.cast(DoubleType) * y.cast(DoubleType)), lit(0.0), _ + _) /
                (sqrt(na) * sqrt(nb)))
          }.as("cos_ref"),
          aggregate(zip_with(col("a"), col("b"), (x, y) =>
            x.cast(DoubleType) * y.cast(DoubleType)), lit(0.0), _ + _).as("dot_ref"),
          sqrt(aggregate(zip_with(col("a"), col("b"), (x, y) =>
            (x.cast(DoubleType) - y.cast(DoubleType)) *
              (x.cast(DoubleType) - y.cast(DoubleType))), lit(0.0), _ + _)).as("euc_ref"))
      val r = df.collect()(0)
      def eq(i: Int, j: Int): Boolean = {
        val (x, y) = (r.getDouble(i), r.getDouble(j))
        (x.isNaN && y.isNaN) || x == y
      }
      val zeroNorm = a.forall(_ == 0f) || b.forall(_ == 0f)
      if (a.length == b.length)
        (if (zeroNorm) r.getDouble(0).isNaN else eq(0, 3)) && eq(1, 4) && eq(2, 5)
      else r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) // HOF zip pads; kernel nulls
    })
  }

  private val tokensGen: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "", "the", "und"))

  test("word_ngrams kernel matches the sequence/slice/array_join formulation") {
    check(Prop.forAll(tokensGen, Gen.chooseNum(1, 4)) { (toks, n) =>
      val df = Seq(Tuple1(toks)).toDF("t")
      val kernel = df.select(F.wordNgrams(col("t"), n)).collect()(0).getSeq[String](0)
      val ref =
        if (n == 1) df.select(array_distinct(col("t"))).collect()(0).getSeq[String](0)
        else {
          val cnt = size(col("t")) - (n - 1)
          df.select(
            when(cnt >= 1, array_distinct(transform(sequence(lit(1), cnt), i =>
              array_join(slice(col("t"), i, lit(n)), " "))))
              .otherwise(array().cast(ArrayType(StringType))))
            .collect()(0).getSeq[String](0)
        }
      kernel == ref
    })
  }

  test("xxhash64_array matches the builtin xxhash64 per element") {
    check(Prop.forAll(tokensGen) { toks =>
      val df = Seq(Tuple1(toks)).toDF("t")
      val kernel = df.select(F.xxhash64Array(col("t"))).collect()(0).getSeq[Long](0)
      val ref = toks.map(t =>
        df.sparkSession.sql(s"SELECT xxhash64('${t}')").collect()(0).getLong(0))
      kernel == ref
    }, n = 10)
  }

  test("count_tokens_in matches filter+array_contains") {
    val words = Seq("the", "und", "x")
    check(Prop.forAll(tokensGen) { toks =>
      val df = Seq(Tuple1(toks)).toDF("t")
      val kernel = df.select(F.countTokensIn(col("t"), words)).collect()(0).getInt(0)
      val wordArr = array(words.map(lit): _*)
      val ref = df.select(size(filter(col("t"), t => array_contains(wordArr, t))))
        .collect()(0).getInt(0)
      kernel == ref
    })
  }

  test("bloom_count_in: members always hit; count is monotone over true membership") {
    import org.apache.spark.unsafe.types.UTF8String
    val numBits = 1 << 16
    val k = 3
    val members = Seq("alpha beta", "gamma delta", "epsilon zeta")
    val bits = new Array[Long]((numBits + 63) / 64)
    members.foreach(m => graft.functions.Kernels.bloomSet(
      bits, numBits, k, UTF8String.fromString(m)))
    check(Prop.forAll(tokensGen) { toks =>
      val df = Seq(Tuple1(toks)).toDF("t")
      val bloom = df.select(F.bloomCountIn(col("t"), bits, numBits, k))
        .collect()(0).getInt(0)
      val trueCount = toks.count(members.contains)
      // no false negatives, and FPs only ADD
      bloom >= trueCount && bloom <= toks.size
    })
    // every member probes positive; a spot non-member set stays low
    val df = Seq(Tuple1(members)).toDF("t")
    assert(df.select(F.bloomCountIn(col("t"), bits, numBits, k))
      .collect()(0).getInt(0) === members.size)
  }

  test("word_ngram_hashes: distinct count matches word_ngrams; hashed bloom probes never miss members") {
    check(Prop.forAll(tokensGen, Gen.choose(1, 4)) { (toks, n) =>
      val df = Seq(Tuple1(toks)).toDF("t")
      val nStrings = df.select(size(F.wordNgrams(col("t"), n)))
        .collect()(0).getInt(0)
      val nHashes = df.select(size(F.wordNgramHashes(col("t"), n)))
        .collect()(0).getInt(0)
      // hash-distinct == string-distinct (a mismatch would need a 64-bit
      // chain-hash collision between two different grams of one doc)
      nHashes == nStrings
    })
    // grams planted in a bloomSetLong bitmap always probe positive
    // through the hashed pipeline (equal grams → equal hashes)
    val numBits = 1 << 16
    val k = 3
    val evalDf = Seq(Tuple1(Seq("alpha", "beta", "gamma", "delta"))).toDF("t")
    val evalHashes = evalDf.select(explode(F.wordNgramHashes(col("t"), 2)))
      .collect().map(_.getLong(0))
    val bits = new Array[Long]((numBits + 63) / 64)
    evalHashes.foreach(h =>
      graft.functions.Kernels.bloomSetLong(bits, numBits, k, h))
    // same token stream on the probe side: every gram must hit
    val hits = evalDf
      .select(F.bloomCountInLongs(F.wordNgramHashes(col("t"), 2), bits, numBits, k))
      .collect()(0).getInt(0)
    assert(hits === evalHashes.length)
    // disjoint tokens: hit count stays far below gram count (FPs only)
    val other = Seq(Tuple1(Seq("zeta", "eta", "theta", "iota"))).toDF("t")
    val miss = other
      .select(F.bloomCountInLongs(F.wordNgramHashes(col("t"), 2), bits, numBits, k))
      .collect()(0).getInt(0)
    assert(miss <= 1)
  }

  test("simhash64 kernel matches the SQL aggregate/zip_with formulation") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "the"))) { toks =>
      val df = Seq(Tuple1(toks)).toDF("t")
      val kernel = df.select(F.simhash64(col("t"))).collect()(0).getLong(0)
      val ref = df
        .withColumn("__h", transform(col("t"), x => xxhash64(x)))
        .selectExpr(
          """aggregate(
               zip_with(
                 aggregate(__h, array_repeat(0, 64),
                   (acc, h) -> zip_with(acc, sequence(0, 63),
                     (c, i) -> c + IF((shiftright(h, i) & 1) = 1, 1, -1))),
                 sequence(0, 63),
                 (c, i) -> IF(c > 0, shiftleft(1L, i), 0L)),
               0L, (a, x) -> a | x)""")
        .collect()(0).getLong(0)
      kernel == ref
    }, n = 15)
  }

  test("max_token_freq(+ratio) matches an explode/groupBy formulation") {
    check(Prop.forAll(tokensGen) { toks =>
      val df = Seq(Tuple1(toks)).toDF("t")
      val mc = df.select(F.maxTokenFreq(col("t"))).collect()(0).getInt(0)
      val expected =
        if (toks.isEmpty) 0
        else toks.groupBy(identity).values.map(_.size).max
      val ratio = df.select(F.maxTokenFreqRatio(col("t"))).collect()(0)
      val ratioOk =
        if (toks.isEmpty) ratio.isNullAt(0)
        else ratio.getDouble(0) == expected.toDouble / toks.size
      mc == expected && ratioOk
    })
  }

  test("winnow kernel matches a naive reference implementation") {
    import org.apache.spark.unsafe.types.UTF8String
    def reference(text: String, k: Int, w: Int): Seq[Long] = {
      val bytes = text.getBytes("UTF-8")
      if (bytes.length < k) return Seq.empty
      val grams = (0 to bytes.length - k).map { i =>
        val g = java.util.Arrays.copyOfRange(bytes, i, i + k)
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          g, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, k, 42L)
      }
      if (grams.length <= w)
        Seq(grams.zipWithIndex.minBy { case (v, i) => (v, -i) }._1)
      else {
        var lastIdx = -1
        val out = scala.collection.mutable.ArrayBuffer[Long]()
        for (start <- 0 to grams.length - w) {
          val win = grams.slice(start, start + w).zipWithIndex
          val best = start + win.minBy { case (v, i) => (v, -i) }._2
          if (best != lastIdx) { out += grams(best); lastIdx = best }
        }
        out.toSeq
      }
    }
    val textGen = Gen.listOf(Gen.oneOf("ab", "cd", "the", "x", " ")).map(_.mkString(" "))
    check(Prop.forAll(textGen, Gen.chooseNum(1, 6), Gen.chooseNum(1, 5)) { (text, k, w) =>
      val kernel = graft.functions.Kernels.winnow(UTF8String.fromString(text), k, w)
      kernel.toLongArray().toSeq == reference(text, k, w)
    })
  }

  test("clean_lines kernel matches the filter+split HOF formulation") {
    val lineGen = Gen.listOf(Gen.oneOf("a", "bb word", "x y z", "one two three four", "", "  "))
      .map(_.mkString("\n"))
    check(Prop.forAll(lineGen, Gen.chooseNum(0, 5)) { (text, minWords) =>
      val df = Seq(text).toDF("t")
      val kernel = df.select(F.cleanLines(col("t"), minWords)).collect()(0).getString(0)
      val reference = text.split("\n", -1)
        .filter(_.trim.split("\\s+").count(_.nonEmpty) >= minWords)
        .mkString("\n")
      kernel == reference
    })
  }

  test("quant_i8(+stats) match the HOF formulation and roundtrip within scale/2") {
    check(Prop.forAll(vecGen) { v =>
      val df = Seq(Tuple1(v)).toDF("v")
      val r = df.select(
          F.quantI8Stats(col("v")).as("s"),
          F.quantI8(col("v")).as("q"))
        .select(col("s.scale"), col("s.q_sum"), col("s.max_err"),
          col("q.scale").as("scale2"), col("q.codes"))
        .collect()(0)
      val scale = v.map(x => math.abs(x.toDouble)).max / 127.0
      val codes = if (scale > 0) v.map(x => math.floor(x.toDouble / scale + 0.5).toByte)
        else v.map(_ => 0.toByte)
      val maxErr = if (scale > 0)
        v.zip(codes).map { case (x, q) => math.abs(q * scale - x.toDouble) }.max
        else 0.0
      r.getDouble(0) == scale &&
        r.getLong(1) == codes.map(_.toLong).sum &&
        r.getDouble(2) == maxErr &&
        r.getDouble(3) == scale &&
        r.getSeq[Byte](4).toList == codes &&
        // reconstruction error bound: |q*scale - x| <= scale/2 everywhere
        r.getDouble(2) <= scale / 2 + 1e-12
    })
  }

  test("nfc_normalize composes decomposed text; strip_accents folds diacritics") {
    import spark.implicits._
    val df = Seq(
      ("cafe\u0301", "caf\u00e9"),   // decomposed vs precomposed
      ("nai\u0308ve", "na\u00efve"),
      ("plain ascii", "plain ascii")
    ).toDF("decomp", "comp")
    val out = df.select(
      (F.nfcNormalize(col("decomp")) === col("comp")).as("nfc_eq"),
      F.stripAccents(col("decomp")).as("strip_d"),
      F.stripAccents(col("comp")).as("strip_c")).collect()
    assert(out.forall(_.getBoolean(0)), "NFC must compose to the precomposed twin")
    assert(out.map(_.getString(1)).toSeq === Seq("cafe", "naive", "plain ascii"))
    assert(out.map(_.getString(2)).toSeq === Seq("cafe", "naive", "plain ascii"))
    // registered for SQL use
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT strip_accents('\\u00e9l\\u00e8ve') AS s")
      .collect()(0).getString(0) === "eleve")
  }

  test("zorder2: locality-preserving Morton interleave, reference bit math") {
    import spark.implicits._
    // reference values: interleave(a even bits, b odd bits)
    assert(graft.functions.Kernels.zorder2(0L, 0L) === 0L)
    assert(graft.functions.Kernels.zorder2(1L, 0L) === 1L)
    assert(graft.functions.Kernels.zorder2(0L, 1L) === 2L)
    assert(graft.functions.Kernels.zorder2(3L, 3L) === 15L)
    assert(graft.functions.Kernels.zorder2(0x7FFFFFFFL, 0L) ===
      0x1555555555555555L)
    // expression ≡ kernel over a grid, and z-sorting clusters 2-D tiles:
    // rows within one 4x4 tile occupy one contiguous z-run of length 16
    val grid = (for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b))
      .toDF("a", "b")
    val z = grid.select(col("a"), col("b"),
        F.zorder2(col("a"), col("b")).as("z")).collect()
    z.foreach(r => assert(r.getLong(2) ===
      graft.functions.Kernels.zorder2(r.getLong(0), r.getLong(1))))
    val byTile = z.groupBy(r => (r.getLong(0) / 4, r.getLong(1) / 4))
    byTile.foreach { case (_, rows) =>
      val zs = rows.map(_.getLong(2)).sorted
      assert(zs.length === 16 && zs.last - zs.head === 15,
        "a 4x4 tile must be one contiguous z-run")
    }
    // registered for SQL use
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT zorder2(3L, 3L) AS z").collect()(0).getLong(0) === 15L)
  }

  test("top_k_structs aggregate matches the window top-k under partitioning") {
    import spark.implicits._
    // many partitions + duplicate order values force the merge path and
    // the full-struct lexicographic tie-break
    val df = (1L to 1000L).map(i => (i % 7, i % 13, i))
      .toDF("g", "score", "id").repartition(11)
    val agg = df.groupBy(col("g"))
      .agg(F.topKStructs(struct(col("score"), col("id")), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "r")))
      .select(col("g"), col("i"), col("r.score").as("score"), col("r.id").as("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(desc("score"), desc("id"))
    val expected = df
      .withColumn("i", row_number().over(win) - 1)
      .filter(col("i") < 5)
      .select(col("g"), col("i"), col("score"), col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(agg.sorted.toSeq === expected.sorted.toSeq)
    // groups smaller than k return all their rows
    val small = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("g", "score", "id")
      .groupBy(col("g"))
      .agg(F.topKStructs(struct(col("score"), col("id")), 5).as("top"))
      .select(size(col("top"))).collect()(0).getInt(0)
    assert(small === 2)
  }

  test("top_k_structs plans as a partial ObjectHashAggregate (map-side combine)") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i % 3, i)).toDF("g", "id")
    val p = df.groupBy(col("g"))
      .agg(F.topKStructs(struct(col("id")), 3).as("top"))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"plan:\n$p")
    assert(p.contains("partial_top_k_structs"), s"no partial phase:\n$p")
  }

  test("heavy_hitters plans as a partial ObjectHashAggregate (map-side combine)") {
    import spark.implicits._
    val p = (1 to 100).map(i => s"t${i % 5}").toDF("token")
      .agg(F.heavyHitters(col("token"), 8).as("hh"))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"plan:\n$p")
    assert(p.contains("partial_heavy_hitters"), s"no partial phase:\n$p")
  }

  test("heavy_hitters: MG guarantee holds under partition merges; estimates undercount boundedly") {
    // skewed stream: "hot" ≈ 1/3, "warm" ≈ 1/15, a 500-token tail
    val rows = (1 to 3000).map { i =>
      if (i % 3 == 0) "hot" else if (i % 10 == 0) "warm" else s"t${i % 500}"
    }
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val cap = 16
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("token").repartition(parts)
      val cands = df.agg(F.heavyHitters(col("token"), cap).as("hh"))
        .select(explode(col("hh")).as("c"))
        .select(col("c.token"), col("c.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(cands.size <= cap)
      // every token with true freq > n/(cap+1) SURVIVES, however the
      // stream was partitioned — the prefilter guarantee
      truth.filter(_._2 > n / (cap + 1)).keys.foreach(t =>
        assert(cands.contains(t), s"$t missing at $parts partitions"))
      // estimates never overcount, and undercount by ≤ n/(cap+1)
      cands.foreach { case (t, est) =>
        assert(est <= truth(t), s"$t overcounted")
        assert(est >= truth(t) - n / (cap + 1), s"$t undercounted past bound")
      }
    }
    // the end-to-end operator returns EXACT counts above the threshold
    val docs = Seq.fill(50)("the quick the lazy the dog") ++ Seq.fill(10)("lazy dog runs")
    val out = graft.llm.TextAnalysis.heavyHitterTokens(
        docs.toDF("text"), "text", ratio = 5L, capacity = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // stream: the=150, quick=50, lazy=60, dog=60, runs=10; total=330
    // threshold cnt*5 > 330 → cnt > 66 → only "the"
    assert(out === Map("the" -> 150L))
  }

  test("kernels are inlined into whole-stage codegen (no fallback)") {
    // inputs must depend on a column — literal-only args constant-fold
    // before codegen and the kernels would never appear in the plan
    val idf = col("id").cast(FloatType)
    val ids = col("id").cast(StringType)
    val df = spark.range(4).select(
      F.cosineSim(array(idf, lit(2.0f)), array(lit(3.0f), idf)).as("c"),
      F.simhash64(array(ids, lit("b"))).as("s"),
      F.wordNgrams(array(ids, lit("b"), lit("c")), 2).as("g"),
      F.countTokensIn(array(ids), Seq("1", "2")).as("n"),
      F.cleanLines(concat(ids, lit(" w\nq")), 2).as("cl"),
      F.quantI8Stats(array(idf, lit(2.0f))).as("qs"),
      F.bloomCountInLongs(F.wordNgramHashes(array(ids, lit("b"), lit("c")), 2),
        new Array[Long](16), 1024, 3).as("bh"))
    val code = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(code.contains("graft.functions.Kernels.cosine"), "cosine not in codegen")
    assert(code.contains("graft.functions.Kernels.simhash64"), "simhash not in codegen")
    assert(code.contains("graft.functions.Kernels.ngrams"), "ngrams not in codegen")
    assert(code.contains("graft.functions.Kernels.countIn"), "countIn not in codegen")
    assert(code.contains("graft.functions.Kernels.cleanLines"), "cleanLines not in codegen")
    assert(code.contains("graft.functions.Kernels.quantI8Stats"), "quantI8Stats not in codegen")
    assert(code.contains("graft.functions.Kernels.ngramHashes"), "ngramHashes not in codegen")
    assert(code.contains("graft.functions.Kernels.bloomCountInLongs"),
      "bloomCountInLongs not in codegen")
    assert(df.collect().length == 4)
  }
}
