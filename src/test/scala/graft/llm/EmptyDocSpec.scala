package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-8 review-backlog fixes: the split-of-empty `[""]` phantom token,
  * vocabGrowth's bucket-formula overflow, tfidfTopTerms' cache release,
  * and perplexityBuckets' sub-2-token contract. Each test constructs the
  * edge the gate corpus can't contain. */
class EmptyDocSpec extends SparkSpec {

  import spark.implicits._

  // two empty-ish docs (empty + whitespace-only) appended to real text
  private lazy val withEmpties = Seq(
    (1L, "alpha beta alpha"),
    (2L, "beta gamma"),
    (3L, ""),
    (4L, "   \t\n ")).toDF("doc_id", "text")
  private lazy val noEmpties = withEmpties.filter(col("doc_id") <= 2)

  test("cleanTokens drops the [\"\"] phantom of empty/whitespace docs") {
    val arrs = withEmpties
      .select(TextAnalysis.cleanTokens(col("text")).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(arrs.map(_.length).sorted.toSeq === Seq(0, 0, 2, 3))
    assert(arrs.flatten.forall(_.nonEmpty))
  }

  test("vocabulary: empty docs contribute no token and no mass") {
    val a = TextAnalysis.vocabulary(withEmpties, "text", topK = 10).collect()
    val b = TextAnalysis.vocabulary(noEmpties, "text", topK = 10).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.forall(_.getString(0).nonEmpty))
  }

  test("heavyHitterTokens(ByGroup): empty docs don't enter the census") {
    val a = TextAnalysis
      .heavyHitterTokens(withEmpties, "text", ratio = 2L, capacity = 16)
      .collect()
    val b = TextAnalysis
      .heavyHitterTokens(noEmpties, "text", ratio = 2L, capacity = 16)
      .collect()
    assert(a.toSeq === b.toSeq)
    val g = withEmpties.withColumn("grp", lit("g"))
    val ga = TextAnalysis
      .heavyHitterTokensByGroup(g, "grp", "text", ratio = 2L, capacity = 16)
      .collect()
    assert(ga.forall(_.getString(1).nonEmpty))
    // the per-group total excludes the phantom: same rows as clean corpus
    val gb = TextAnalysis.heavyHitterTokensByGroup(
      noEmpties.withColumn("grp", lit("g")), "grp", "text",
      ratio = 2L, capacity = 16).collect()
    assert(ga.toSeq === gb.toSeq)
  }

  test("tfidfTopTerms: no phantom term; release handle is idempotent") {
    val (out, release) = TextAnalysis.tfidfTopTermsReleasable(
      withEmpties, "doc_id", "text", topK = 5)
    val rows = out.collect()
    assert(rows.forall(_.getString(1).nonEmpty))
    // df_t counts exclude empty docs: 'beta' appears in docs 1 and 2
    val beta = rows.filter(_.getString(1) == "beta")
    assert(beta.nonEmpty && beta.forall(_.getLong(3) === 2L))
    release(); release() // idempotent
    // result remains correct after release (recomputes the df table)
    assert(out.collect().toSeq === rows.toSeq)
  }

  test("collocations: empty docs don't inflate the unigram total") {
    val rep = (1 to 6).map(i => (i.toLong, "red fox red fox")) ++
      Seq((7L, ""), (8L, " "))
    val df = rep.toDF("doc_id", "text")
    val a = TextAnalysis.collocations(df, "text", topK = 5, minCount = 5L)
      .collect()
    val b = TextAnalysis.collocations(
      df.filter(col("doc_id") <= 6), "text", topK = 5, minCount = 5L)
      .collect()
    assert(a.toSeq === b.toSeq) // identical lift: t_u has no phantom mass
  }

  test("knFluency: empty train docs don't inflate the vocabulary size V") {
    val train = Seq((1L, "a b a c"), (2L, ""), (3L, "  ")).toDF("doc_id", "text")
    val cleanTrain = train.filter(col("doc_id") === 1)
    val target = Seq((10L, "a b z q")).toDF("doc_id", "text")
    val a = TextAnalysis.knFluency(train, target, "doc_id", "text").collect()
    val b = TextAnalysis.knFluency(cleanTrain, target, "doc_id", "text")
      .collect()
    // the OOV floor is 1/(V+1): a phantom "" in V would shift kn_score
    assert(a.toSeq === b.toSeq)
  }

  test("vocabGrowth: full-range 64-bit ids bucket without overflow") {
    val df = Seq(
      (Long.MinValue, "alpha"),
      (-1L, "beta"),
      (1L, "alpha gamma"),
      (Long.MaxValue, "delta")).toDF("doc_id", "text")
    val rows = TextAnalysis.vocabGrowth(df, "doc_id", "text", buckets = 4)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    // span is 2^64: the old BIGINT product wrapped negative; now every
    // word lands in a valid epoch and the totals reconcile
    assert(rows.map(_.getLong(1)).sum === 4L)   // new_words total = vocab
    assert(rows.last.getLong(3) === 4L)          // cumulative = vocab
    assert(rows.forall(r => r.getLong(2) >= r.getLong(1)))
  }

  test("vocabGrowth: decimal formula matches the old one in-range") {
    // non-negative compact ids (the old contract's domain): same buckets
    val df = (0L to 7L).map(i => (i, s"w$i")).toDF("doc_id", "text")
    val rows = TextAnalysis.vocabGrowth(df, "doc_id", "text", buckets = 4)
      .orderBy("bucket").collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((1, 2L), (2, 2L), (3, 2L), (4, 2L)))
  }

  test("perplexityBuckets: sub-2-token docs land in 'tail', not dropped") {
    val df = Seq(
      (1L, "a b a b"), (2L, "a b c a"), (3L, "b c b a"),
      (4L, "solo"), (5L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis
      .perplexityBuckets(df, "doc_id", "text", sampleMod = 1L,
        sampleCap = 100)
      .collect()
    assert(rows.length === 5) // every input doc gets a bucket row
    val short = rows.filter(r => r.getLong(0) >= 4L)
    assert(short.forall(r => r.isNullAt(1) && r.getString(2) == "tail"))
  }
}
