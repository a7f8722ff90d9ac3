package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language-ID, quality scoring, fingerprinting.
  *
  * Everything is a pure `Column` expression built from codegen'd
  * built-ins (no UDFs) — at 100 TB these run inside whole-stage codegen
  * over the document scan with nothing on the driver.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** [[tokens]] minus split-of-empty's `[""]` phantom: an empty or
    * whitespace-only document splits to a single empty-string token,
    * which would otherwise enter vocabularies, censuses and df tables
    * as a real type. The unified guard for every token-STREAM consumer
    * (r8 — previously each consumer guarded individually or not at
    * all). array_remove, NOT `filter(arr, t -> ...)`: higher-order
    * functions are CodegenFallback and would break the whole-stage
    * codegen span of every consumer's scan projection; array_remove is
    * a codegen'd builtin, and after trim the phantom "" is the only
    * empty element split can produce. */
  def cleanTokens(text: Column): Column =
    array_remove(tokens(text), "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, digit runs, and single
    * punctuation marks each count as one token — the usual pre-tokenizer
    * shape for byte-pair encoders. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]"))

  /** Normalized form used for fingerprinting/dedup: lowercase, collapse
    * whitespace runs, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Document fingerprint: md5 of the normalized text (hex string).
    * Stable across engines and shuffle order; used as the exact-dedup
    * key. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Fraction of tokens that appear in `stopwords` (duplicates count —
    * this is a ratio over the token stream, not the vocabulary). The
    * membership count is a custom codegen expression with a shared hash
    * set — `filter(toks, t -> array_contains(...))` evaluates the lambda
    * interpreted per token and rescans the literal array per call. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    graft.functions.F.countTokensIn(toks, stopwords).cast(DoubleType) /
      nullif(size(toks), lit(0)).cast(DoubleType)
  }

  /** Tiny per-language function-word profiles (public knowledge). */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pas", "avec", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "no", "con", "para"))

  /** Language-ID heuristic: argmax of per-language stopword-stream
    * ratios, 'und' when nothing matches. Deterministic tie-break: the
    * profile order above (en > de > fr > es). */
  def languageId(text: Column): Column = {
    // lowercase before matching: the profiles are lowercase, so raw
    // text would miss every sentence-initial/ALL-CAPS function word
    val scores = StopwordProfiles.map { case (lang, words) =>
      lang -> stopwordRatio(lower(text), words)
    }
    val anyHit = scores.map(_._2).reduce(_ + _) > 0.0
    val best = scores.tail.foldLeft(
      when(lit(true), struct(scores.head._2.as("s"), lit(scores.head._1).as("l")))) {
      case (acc, (lang, s)) =>
        when(s > acc.getField("s"), struct(s.as("s"), lit(lang).as("l"))).otherwise(acc)
    }
    when(anyHit, best.getField("l")).otherwise(lit("und"))
  }

  /** Tokenizer fertility per detected language — the standard tokenizer
    * evaluation table (tokens per whitespace word, characters per
    * token): languages a tokenizer serves badly show high fertility, the
    * signal behind per-language vocab budgeting. Composes the row-local
    * codegen kernels ([[languageId]], [[tokenCount]],
    * [[bpeTokenCount]]); the only shuffle is the |languages|-row final
    * aggregate. Ratios are ONE IEEE division of exact integer sums, so
    * they reproduce cross-engine. */
  def tokenizerFertility(df: DataFrame, textCol: String): DataFrame =
    df.select(
        languageId(col(textCol)).as("lang"),
        tokenCount(col(textCol)).cast(LongType).as("__ws"),
        bpeTokenCount(col(textCol)).cast(LongType).as("__bpe"),
        length(col(textCol)).cast(LongType).as("__chars"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__ws")).as("ws_tokens"),
        sum(col("__bpe")).as("bpe_tokens"),
        sum(col("__chars")).as("n_chars"),
        (sum(col("__bpe")).cast(DoubleType) /
          sum(col("__ws")).cast(DoubleType)).as("fertility"),
        (sum(col("__chars")).cast(DoubleType) /
          nullif(sum(col("__bpe")), lit(0L)).cast(DoubleType))
          .as("chars_per_token"))

  /** Winnowing fingerprints of the normalized text (rolling k-byte-gram
    * hashes, window-min selection — the MOSS local-fingerprint scheme):
    * any shared substring of length ≥ w+k-1 between two docs yields at
    * least one shared fingerprint, so partial-overlap/containment dedup
    * becomes an equi-join on exploded fingerprints — md5-style whole-doc
    * fingerprints can't see containment at all. */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    graft.functions.F.winnow(normalize(text), k, w)

  /** Repetition signals from the open web-corpus filtering canon
    * (duplicate-line fraction, dominant-token fraction): high values
    * flag boilerplate/word-salad documents for removal. */
  def duplicateLineRatio(text: Column): Column = {
    val lines = split(text, "\n")
    (lit(1.0) - size(array_distinct(lines)).cast(DoubleType) /
      nullif(size(lines), lit(0)).cast(DoubleType))
  }

  /** Fraction of the token stream taken by its most frequent token —
    * one codegen pass (graft.functions.MaxTokenFreqRatio). */
  def maxTokenFreqRatio(text: Column): Column =
    graft.functions.F.maxTokenFreqRatio(tokens(text))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[^\\p{L}\\p{N}\\s]")).cast(DoubleType) /
      nullif(length(text), lit(0)).cast(DoubleType)

  /** Fixed-size token-window chunking with overlap — the training-data
    * prep step that turns documents into model-ready sequences. Returns
    * an array of (chunk_idx, start_token, n_tokens, chunk_text) structs;
    * explode it for one row per chunk. A document of n tokens yields
    * ceil((n - chunkSize) / stride) + 1 chunks (1 if n ≤ chunkSize), so
    * consecutive chunks overlap by chunkSize - stride tokens. An empty or
    * whitespace-only document yields NO chunks (split-of-empty's [""]
    * artifact would otherwise fabricate a phantom 1-token chunk that
    * inflates token accounting). Pure codegen'd built-ins — no shuffle,
    * no driver involvement. */
  def tokenChunks(text: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      "need 1 <= stride <= chunkSize")
    val toks = tokens(text)
    val n = size(toks)
    val nChunks = when(n <= chunkSize, lit(1)).otherwise(
      ceil((n - chunkSize).cast(DoubleType) / stride).cast(IntegerType) + 1)
    val chunks = transform(sequence(lit(0), nChunks - 1), i =>
      struct(
        i.as("chunk_idx"),
        (i * stride).as("start_token"),
        least(lit(chunkSize), n - i * stride).as("n_tokens"),
        array_join(slice(toks, i * stride + 1, lit(chunkSize)), " ").as("chunk_text")))
    // filter with a constant-false lambda = typed empty array
    // rlike("\\S"), not trim: Spark's trim strips only 0x20, so a
    // tab/newline-only doc would bypass a trim-based guard and emit the
    // phantom 1-token chunk this exists to prevent
    when(!text.rlike("\\S"), filter(chunks, _ => lit(false)))
      .otherwise(chunks)
  }

  /** PII patterns scrubbed by [[scrubPii]] — deliberately simple,
    * RE2-compatible expressions (emails, international-format phone
    * numbers, IPv4 addresses) so the semantics reproduce in any regex
    * engine a downstream validator might use. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\+[0-9]{8,14}", "<PHONE>"),
    ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"))

  /** PII scrubbing: replace every email / phone / IPv4 occurrence with a
    * typed placeholder, applied in [[PiiPatterns]] order (emails first so
    * their digit runs can't be half-eaten by the phone pattern). */
  def scrubPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /** Per-document PII counts, same patterns as [[scrubPii]]. */
  def piiCounts(text: Column): Column =
    struct(
      regexp_count(text, lit(PiiPatterns(0)._1)).as("n_emails"),
      regexp_count(text, lit(PiiPatterns(1)._1)).as("n_phones"),
      regexp_count(text, lit(PiiPatterns(2)._1)).as("n_ips"))

  /** Corpus vocabulary: the `topK` most frequent normalized tokens with
    * counts and corpus-frequency fraction — tokenizer-training prep.
    * One explode + map-side-combined groupBy shuffle on the token, then
    * TakeOrdered for the top-k (never a global sort); the corpus total
    * re-attaches via a 1-row broadcast, not an unpartitioned window.
    * Ties break lexicographically so the cut is deterministic. */
  def vocabulary(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    val counts = df
      .select(explode(cleanTokens(normalize(col(textCol)))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts.orderBy(desc("cnt"), asc("token")).limit(topK)
      .crossJoin(broadcast(total))
      .select(col("token"), col("cnt"),
        (col("cnt").cast(DoubleType) / col("total")).as("frac"))
  }

  /** Vocabulary growth curve (Heaps' law measurement) — tokenizer-budget
    * planning: per corpus epoch, how many distinct words occur in it
    * (`epoch_vocab`), how many of those are NEW — first seen in that
    * epoch (`new_words`) — and the cumulative vocabulary at each cut.
    * Epochs are `buckets` equal ID-RANGE slices of `idCol` (ids model
    * arrival order): the min/max bounds broadcast from one cheap
    * aggregate and the bucket assignment is row-local integer arithmetic
    * (exact and engine-agnostic — an ntile would sort the corpus through
    * ONE window partition). The corpus pays exactly one doc-grain
    * shuffle, to (bucket, word) grain with map-side partials; both
    * output signals then reduce off that small grain (≤ vocab × buckets
    * rows — at 100 TB, persist that intermediate to share it instead of
    * recomputing the scan per branch). A bucket spine LEFT-join keeps
    * every epoch present even when it contributes nothing, and the
    * cumulative sum is an explode-to-later-epochs aggregation (each
    * first-seen row fans out to the ≤ `buckets` epochs it counts
    * toward) — an equi-groupBy, never a single-partition window, per
    * the house rule that NO plan may carry an unpartitioned WindowExec
    * even over provably bounded input. A flattening curve says the
    * vocabulary is saturating — more data buys few new types; a steep
    * tail says the vocab budget is underfed. */
  def vocabGrowth(
      df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 4): DataFrame = {
    val bounds = df.agg(
      min(col(idCol).cast("long")).as("__lo"),
      max(col(idCol).cast("long")).as("__hi"))
    val bucketWord = df
      .filter(col(idCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .select(
        // DIV (integer floor division — operands are non-negative), not
        // `/`: double division then floor can land one ulp off on large
        // ids, and the oracle's integer arithmetic would diverge.
        // DECIMAL(38,0), not BIGINT (r8): a 64-bit-hash id space makes
        // (id - lo) up to 2^64 and the × buckets product overflows
        // BIGINT silently; the ≤24-digit decimal product is exact and
        // value-identical to the old formula wherever it didn't wrap.
        expr(s"CAST(((CAST($idCol AS DECIMAL(38,0)) - __lo) * $buckets) " +
          "DIV (CAST(__hi AS DECIMAL(38,0)) - __lo + 1) + 1 AS INT)")
          .as("__bucket"),
        explode(tokens(normalize(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("__bucket"), col("w")).agg(count(lit(1)).as("cnt"))
    val epochVocab = bucketWord
      .groupBy(col("__bucket").as("bucket"))
      .agg(count(lit(1)).as("epoch_vocab"))
    val newWords = bucketWord
      .groupBy(col("w")).agg(min(col("__bucket")).as("first_bucket"))
      .groupBy(col("first_bucket").as("bucket"))
      .agg(count(lit(1)).as("new_words"))
    // cumulative per epoch b = Σ new_words over first_bucket ≤ b: each
    // first-seen row fans out to the epochs it counts toward, then one
    // keyed aggregate — no window anywhere in the plan
    val cumul = newWords
      .select(explode(sequence(col("bucket"), lit(buckets))).as("bucket"),
        col("new_words"))
      .groupBy(col("bucket"))
      .agg(sum(col("new_words")).as("cumulative_vocab"))
    df.sparkSession.range(1, buckets + 1L)
      .select(col("id").cast("int").as("bucket"))
      .join(broadcast(newWords), Seq("bucket"), "left")
      .join(broadcast(epochVocab), Seq("bucket"), "left")
      .join(broadcast(cumul), Seq("bucket"), "left")
      .select(
        col("bucket"),
        coalesce(col("new_words"), lit(0L)).as("new_words"),
        coalesce(col("epoch_vocab"), lit(0L)).as("epoch_vocab"),
        coalesce(col("cumulative_vocab"), lit(0L)).as("cumulative_vocab"))
      .orderBy(col("bucket"))
  }

  /** EXACT corpus heavy hitters at sketch-bounded cost. The naive plan
    * (`GROUP BY token` over the exploded stream, then HAVING) shuffles
    * one row per distinct token per partition — on a web corpus the
    * vocabulary tail is billions of keys and that shuffle IS the job.
    * Here a Misra–Gries aggregate ([[graft.functions.HeavyHitters]],
    * mergeable, map-side combined, ≤ `capacity` rows per partition ever
    * cross the wire) produces a candidate set that PROVABLY contains
    * every token with true frequency > total/(capacity+1); only those
    * ≤ capacity candidates are exactly recounted (broadcast semi-join —
    * the second scan shuffles ~capacity rows), and the true filter
    * `cnt · ratio > total` is applied to exact counts. Output: exactly
    * the tokens occurring in more than 1/ratio of the token stream,
    * with exact counts — deterministic, sketch-assisted, never
    * sketch-valued. Requires ratio < capacity + 1 (else the guarantee
    * cannot cover the filter). */
  def heavyHitterTokens(
      df: DataFrame, textCol: String, ratio: Long = 200L,
      capacity: Int = 512): DataFrame = {
    require(ratio > 0 && ratio < capacity + 1,
      s"MG(capacity=$capacity) only guarantees hitters above total/${capacity + 1}; " +
        s"ratio=$ratio filters below that floor")
    val toks =
      df.select(explode(cleanTokens(normalize(col(textCol)))).as("token"))
    // the stream total folds into the sketch pass — a separate
    // count() would re-scan and re-explode the corpus a third time
    val sketch = toks
      .agg(graft.functions.F.heavyHitters(col("token"), capacity).as("hh"),
        count(lit(1)).as("total"))
    val candidates = sketch
      .select(explode(col("hh")).as("c"))
      .select(col("c.token").as("token"))
    val exact = toks.join(broadcast(candidates), Seq("token"), "left_semi")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
    val total = sketch.select(col("total"))
    exact.crossJoin(broadcast(total))
      .filter(col("cnt") * ratio > col("total"))
      .select(col("token"), col("cnt"))
      .orderBy(desc("cnt"), asc("token"))
  }

  /** Per-GROUP exact heavy hitters at sketch-bounded cost — the
    * per-domain form of [[heavyHitterTokens]]: a vocabulary profile for
    * every source/language/domain without ever shuffling the full
    * per-group vocabulary. Each group keeps its own Misra–Gries sketch
    * (mergeable, map-side combined — ≤ capacity rows per (group,
    * partition) cross the wire), which provably covers every token
    * above group_total/(capacity+1); only those candidates are exactly
    * recounted per group, and the true `cnt · ratio > group_total`
    * filter applies to EXACT counts — the output is exact, the sketch
    * only bounded the candidate set. A skewed group (one mega-domain)
    * costs one hot sketch merge, never a hot vocabulary shuffle. The
    * candidate set is ≤ groups × capacity rows; the broadcast hint fits
    * domain/language/source grouping (≲10⁴ groups) — drop it for a
    * pathological million-group key and the semi-join shuffles keyed. */
  def heavyHitterTokensByGroup(
      df: DataFrame, groupCol: String, textCol: String, ratio: Long = 200L,
      capacity: Int = 512): DataFrame = {
    require(ratio > 0 && ratio < capacity + 1,
      s"MG(capacity=$capacity) only guarantees hitters above total/${capacity + 1}; " +
        s"ratio=$ratio filters below that floor")
    val toks = df.select(col(groupCol).as("grp"),
      explode(cleanTokens(normalize(col(textCol)))).as("token"))
    // per-group totals fold into the sketch pass (no third scan)
    val sketch = toks
      .groupBy(col("grp"))
      .agg(graft.functions.F.heavyHitters(col("token"), capacity).as("hh"),
        count(lit(1)).as("total"))
    val candidates = sketch
      .select(col("grp"), explode(col("hh")).as("c"))
      .select(col("grp"), col("c.token").as("token"))
    val exact = toks
      .join(broadcast(candidates), Seq("grp", "token"), "left_semi")
      .groupBy(col("grp"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val totals = sketch.select(col("grp"), col("total"))
    exact.join(totals, "grp")
      .filter(col("cnt") * ratio > col("total"))
      .select(col("grp").as(groupCol), col("token"), col("cnt"))
      .orderBy(col(groupCol), desc("cnt"), asc("token"))
  }

  /** Count–Min point-frequency estimates for probe tokens — the sketch
    * that answers "how often does THIS token occur" in one mergeable
    * pass, completing the sketch menu (HLL → distinct counts,
    * Misra–Gries → who is frequent, Bloom → membership, CMS → how
    * frequent is a GIVEN key). Uses Spark's built-in `count_min_sketch`
    * aggregate (partial-merged map-side, one corpus pass, sketch size
    * O(1/eps · ln(1/δ)) — a few KB crosses the wire per partition, never
    * a vocabulary); the probe lookups read the collected sketch
    * driver-side (it is broadcast-sized by construction). Output per
    * probe: the exact count (recounted over only the probe tokens — a
    * bounded semi-filtered aggregate) plus the two CMS contract
    * booleans: `never_under` (CMS cannot underestimate) and `within_eps`
    * (overestimate ≤ eps · stream length, w.p. ≥ confidence — pinned as
    * actual behavior under the fixed seed, the `a22_approx_distinct`
    * accuracy-gate discipline). */
  def cmsTokenCounts(
      df: DataFrame, textCol: String, probes: Seq[String],
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(probes.nonEmpty, "need at least one probe token")
    val spark = df.sparkSession
    val toks = df
      .select(explode(tokens(normalize(col(textCol)))).as("token"))
      .filter(length(col("token")) > 0)
    val row = toks.agg(
      expr(s"count_min_sketch(token, CAST($eps AS DOUBLE), " +
        s"CAST($confidence AS DOUBLE), $seed)").as("cms"),
      count(lit(1)).as("total")).collect()(0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(row.getAs[Array[Byte]](0))
    val bound = math.ceil(eps * row.getLong(1)).toLong
    import spark.implicits._
    val estDf = probes.map(t => (t, cms.estimateCount(t)))
      .toDF("token", "est")
    val exact = toks.filter(col("token").isin(probes: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("exact_cnt"))
    estDf.join(exact, Seq("token"), "left")
      .select(col("token"),
        coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"),
        (col("est") >= coalesce(col("exact_cnt"), lit(0L)))
          .as("never_under"),
        (col("est") <= coalesce(col("exact_cnt"), lit(0L)) + bound)
          .as("within_eps"))
      .orderBy(col("token"))
  }

  /** Corpus-frequency-based quality signal per document (the exact-
    * rational stand-in for CCNet-style LM perplexity filtering — a
    * transcendental log-prob would not hash-match across engines, the
    * same reason tf-idf here uses raw idf): documents dense in RARE
    * tokens (corpus count ≤ `rareMax`) are gibberish/OCR-noise
    * suspects, documents with very high mean token frequency are
    * boilerplate suspects. Two shuffles at any scale: the vocab census
    * (token-keyed, map-side combined), then the token→census equi-join
    * re-grouped to doc grain. All scores are single IEEE divisions of
    * exact integers — engine-reproducible bit for bit. */
  def tokenRarity(
      df: DataFrame, idCol: String, textCol: String,
      rareMax: Long = 2L): DataFrame = {
    val toks = df.select(col(idCol),
      explode(tokens(normalize(col(textCol)))).as("token"))
    val census = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = census.agg(sum(col("cnt")).as("total"))
    toks.join(census, "token")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("cnt")).as("freq_sum"),
        sum(when(col("cnt") <= rareMax, 1L).otherwise(0L)).as("rare_ct"))
      .crossJoin(broadcast(total))
      .select(col(idCol),
        col("n_tokens"),
        (col("rare_ct").cast(DoubleType) / col("n_tokens")).as("rare_rate"),
        // divisor multiplies as DOUBLE: n_tokens * total as Long*Long
        // overflows around 2e13-token corpora and wraps negative
        (col("freq_sum").cast(DoubleType) /
          (col("n_tokens").cast(DoubleType) * col("total")))
          .as("mean_freq"))
  }

  /** Markov bigram-transition fluency score per document — the exact-
    * rational stand-in for bigram-LM perplexity filtering (CCNet trains
    * a KenLM and drops high-perplexity docs; a log-prob would not
    * hash-match across engines, so this scores with the transition
    * probabilities themselves). For each consecutive token pair the
    * corpus-estimated transition probability is p(w2|w1) =
    * C(w1,w2) / C(w1·); a document's `fluency` is the mean p over its
    * bigrams. Natural text re-uses frequent transitions (high mean),
    * shuffled/gibberish text lands on rare ones (low mean) — same
    * decision boundary as perplexity, monotonically flipped.
    *
    * Scale shape: three keyed shuffles, none avoidable — the bigram
    * census (map-side combined), the prefix census derived FROM the
    * bigram census (vocab-sized, never re-scans the corpus), and the
    * doc-bigram → probability equi-join re-grouped to doc grain. Every
    * probability is a single IEEE division of exact integers and the
    * final mean decimal-accumulates, so the score reproduces bit for
    * bit in any engine. */
  def bigramFluency(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(normalize(col(textCol)))
    val bigrams = df
      .select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(
        zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => concat_ws(" ", a, b))).as("bigram"))
    val c2 = bigrams.groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(substring_index(col("bigram"), " ", 1).as("prefix"))
      .agg(sum(col("c2")).as("c1"))
    val p = c2
      .join(c1, substring_index(col("bigram"), " ", 1) === col("prefix"))
      .select(col("bigram"), (col("c2").cast(DoubleType) / col("c1")).as("p"))
    bigrams.join(p, "bigram")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        (sum(col("p").cast(DecimalType(18, 12))).cast(DoubleType) /
          count(lit(1))).as("fluency"))
  }

  /** Interpolated Kneser–Ney bigram LM scoring (Kneser & Ney 1995;
    * Chen & Goodman 1998 — the smoothing KenLM itself implements, and
    * the CCNet quality-filter convention: TRAIN the LM on a clean
    * reference corpus, SCORE the crawl with it). [[bigramFluency]]'s
    * raw-MLE transition probability assigns zero mass to any pair the
    * scored doc doesn't share with the corpus and over-rewards
    * boilerplate; KN discounts every seen bigram by `discount` and
    * redistributes that mass through the CONTINUATION distribution
    * (how many distinct contexts a word follows — "francisco" is
    * frequent but only ever follows "san", so its continuation
    * probability is tiny), which is what makes the score transfer to
    * held-out text.
    *
    * Model censuses (all derived from ONE bigram census over `train`,
    * never re-scanning it): c2(w1,w2); per-prefix totals c1(w1·) and
    * distinct-continuation counts N1+(w1·); per-suffix distinct-context
    * counts N1+(·w2); bigram-type total B; vocabulary size V. Scoring a
    * target bigram ladders deterministically:
    *
    *   - prefix seen:  p = (seen ? (c2 − D)/c1 : 0) + ((D·N1+(w1·))/c1)·pc
    *   - prefix unseen: p = pc
    *   - pc = N1+(·w2)/B when w2 is in-vocab, else the uniform floor
    *     1/(V+1)
    *
    * (c2 ≥ 1 and D < 1, so the textbook max(c2 − D, 0) is just c2 − D.)
    * Every term is IEEE arithmetic over exact integers with a pinned
    * expression tree — correctly-rounded ops reproduce bit for bit in
    * any engine, the same discipline as [[bigramFluency]] (a log-prob
    * would not hash-match). Output per target doc: `n_bigrams`,
    * `oov_bigrams` (pairs the model never saw — its own quality
    * signal), and `kn_score` (decimal-accumulated mean p).
    *
    * Scale shape: the train corpus pays one bigram-grain shuffle; the
    * three model tables are vocab-grain, so the target side pays three
    * vocab-grain equi-joins (broadcast when the model fits, shuffle
    * hash join with map-side partials when it doesn't) and one
    * doc-grain re-group. Nothing is ever doc×doc or corpus-sorted. */
  def knFluency(
      train: DataFrame, target: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"KN discount must be in (0,1), got $discount")
    def bigramsOf(df: DataFrame, cols: Column*): DataFrame = {
      val toks = tokens(normalize(col(textCol)))
      df.select((cols :+ toks.as("toks")): _*)
        .filter(size(col("toks")) >= 2)
        .select((cols :+ explode(
          zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat_ws(" ", a, b))).as("bigram")): _*)
    }
    val c2 = bigramsOf(train).groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1_fwd"))
    val cont = c2.groupBy(substring_index(col("bigram"), " ", -1).as("w2"))
      .agg(count(lit(1)).as("n1_bwd"))
    // B = bigram types, V = vocabulary size — both 1-row, derived from
    // the same vocab-grain tables, broadcast into the scoring join
    val totals = c2.agg(count(lit(1)).as("bt"))
      .crossJoin(
        train.select(explode(cleanTokens(normalize(col(textCol)))).as("w"))
          .agg(count_distinct(col("w")).as("v")))
    val tb = bigramsOf(target, col(idCol))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
    val d = lit(discount)
    val pc = when(col("n1_bwd").isNotNull,
        col("n1_bwd").cast(DoubleType) / col("bt"))
      .otherwise(lit(1.0) / (col("v") + 1L))
    val p = when(col("c1").isNotNull,
        when(col("c2").isNotNull, (col("c2") - d) / col("c1"))
          .otherwise(lit(0.0)) + ((d * col("n1_fwd")) / col("c1")) * pc)
      .otherwise(pc)
    tb.join(c2, Seq("bigram"), "left")
      .join(c1, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("c2").as("__c2"), p.as("p"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("__c2").isNull, 1L).otherwise(0L)).as("oov_bigrams"),
        (sum(col("p").cast(DecimalType(18, 12))).cast(DoubleType) /
          count(lit(1))).as("kn_score"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"
    * — public): rank documents by LM score and split the corpus into
    * head / middle / tail terciles, the pre-training convention for
    * keeping the head and sampling the middle.
    *
    * Scale design — CCNet's own: the tercile CUTOFFS come from a FIXED
    * deterministic sample (ids divisible by `sampleMod`, first
    * `sampleCap` by id), never from a global sort or window over the
    * corpus. The ≤`sampleCap`-row sample collapses into ONE sorted
    * array (a bounded collect_list — no WindowExec anywhere in the
    * plan), the two cutoff values broadcast, and bucket assignment is
    * a row-local comparison. The corpus-sized work is only
    * [[bigramFluency]]'s keyed shuffles — evaluated twice in this
    * single-expression form (once under the sample branch, once for
    * the output); a deployment materializes the score table first and
    * derives both from the parquet, as CCNet itself does.
    *
    * Determinism: the sample is selected by id, ordered by
    * (fluency, id) via the struct sort, and the cutoffs are the
    * ELEMENTS at 1-based ranks ⌈k/3⌉ and ⌈2k/3⌉ — actual sample
    * values, no interpolation, so any engine recomputes them
    * bit-for-bit. Buckets compare against the cutoff VALUE (head:
    * fluency > t2; middle: > t1; tail: rest), so ties bucket
    * deterministically regardless of row order. */
  def perplexityBuckets(
      df: DataFrame, idCol: String, textCol: String,
      sampleMod: Long = 5L, sampleCap: Int = 1000): DataFrame = {
    val scored = bigramFluency(df, idCol, textCol)
    // Sample selection hashes the id ([[graft.llm.Curation.hashBucket]],
    // the one cross-engine bucket definition) rather than `id % mod`, so
    // ANY id type — numeric, string, uuid — samples at rate ~1/mod,
    // cross-engine reproducibly.
    val idBucket = Curation.hashBucket(col(idCol))
    val sample = scored
      .filter(idBucket % sampleMod === 0)
      .orderBy(col(idCol)).limit(sampleCap)
      .select(col(idCol).as("__sid"), col("fluency").as("__f"))
    // ≤ sampleCap rows by the LIMIT above: the collect_list is bounded
    // by construction, and sort_array on (value, id) structs gives the
    // (fluency, id) rank order without a WindowExec.
    // Empty sample (no scoreable doc matched the id select): cutoffs go
    // NULL and every comparison below falls through to 'tail' — the
    // degenerate corpus buckets uniformly instead of crashing on
    // element_at(arr, 0).
    val cutoffs = sample
      .agg(sort_array(collect_list(struct(col("__f"), col("__sid"))))
        .as("__arr"))
      .select(
        expr("""if(size(__arr) = 0, cast(null as double),
               element_at(__arr, cast((size(__arr) + 2) div 3 as int)).__f)""")
          .as("t1"),
        expr("""if(size(__arr) = 0, cast(null as double),
               element_at(__arr, cast((2 * size(__arr) + 2) div 3 as int)).__f)""")
          .as("t2"))
    // Every input doc gets a bucket row: docs with fewer than 2 tokens
    // have no bigram signal ([[bigramFluency]] emits nothing for them),
    // so they carry NULL fluency and land in 'tail' — the contract is
    // "no fluency evidence buckets with the worst tercile", not a
    // silent drop from the corpus. They are likewise absent from the
    // cutoff sample (cutoffs describe the scoreable population).
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .crossJoin(broadcast(cutoffs))
      .select(col(idCol), col("fluency"),
        when(col("fluency") > col("t2"), "head")
          .when(col("fluency") > col("t1"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Collocation mining: the strongest token-pair associations in the
    * corpus, ranked by LIFT = p(ab) / (p(a)·p(b)) — PMI's argument
    * without the log (PMI = log lift; the log is monotone, so the
    * RANKING is identical, and dropping the transcendental keeps the
    * score a chain of IEEE ops on exact integers that any engine
    * reproduces bit for bit). The phrase-vocabulary step of tokenizer /
    * n-gram-merge pipelines (Mikolov et al.'s word2vec phrases use the
    * same count ratio with a discount).
    *
    * Scale shape: one corpus shuffle into the bigram census (map-side
    * combined), a vocab-grain unigram census derived from token counts,
    * two vocab-grain equi-joins (census-to-census, never corpus-sized),
    * and a TakeOrderedAndProject top-k. `minCount` prunes the census
    * tail BEFORE the joins — rare-pair noise is also why every published
    * collocation ranker floors the count. */
  def collocations(
      df: DataFrame, textCol: String, topK: Int,
      minCount: Long = 5L): DataFrame = {
    val toks = tokens(normalize(col(textCol)))
    val bigrams = df
      .select(toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(
        zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => concat_ws(" ", a, b))).as("bigram"))
    // cleanTokens (not the bigram-side raw toks): an empty doc would
    // otherwise inject "" into the unigram census and inflate t_u
    val unigrams = df
      .select(explode(cleanTokens(normalize(col(textCol)))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val census = bigrams.groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
    val c2 = census.filter(col("c2") >= minCount)
    // t_b derives from the vocab-grain census — a bigrams.count() here
    // would re-explode the whole corpus a second time
    val totals = unigrams.agg(sum(col("c1")).cast(LongType).as("t_u"))
      .crossJoin(census.agg(sum(col("c2")).as("t_b")))
    c2
      .join(unigrams.select(col("tok").as("__a"), col("c1").as("ca")),
        substring_index(col("bigram"), " ", 1) === col("__a"))
      .join(unigrams.select(col("tok").as("__b"), col("c1").as("cb")),
        substring_index(col("bigram"), " ", -1) === col("__b"))
      .crossJoin(broadcast(totals))
      .select(col("bigram"), col("c2").as("n_pair"),
        ((col("c2").cast(DoubleType) / col("t_b").cast(DoubleType)) /
          ((col("ca").cast(DoubleType) / col("t_u").cast(DoubleType)) *
            (col("cb").cast(DoubleType) / col("t_u").cast(DoubleType))))
          .as("lift"))
      .orderBy(desc("lift"), asc("bigram"))
      .limit(topK)
  }

  /** BPE-style adjacent character-pair census — the distributed
    * primitive of tokenizer training (Sennrich et al.: each BPE merge
    * step picks the most frequent adjacent symbol pair, weighted by
    * word frequency). The census collapses the corpus to its WORD
    * VOCABULARY first, so the pair explosion is vocab-sized, never
    * corpus-sized — at 100 TB the word census is the only
    * corpus-shuffle (map-side combined) and everything after operates
    * on ~10⁶ vocab rows. Top-K by count with lexicographic
    * tie-break; top-k is orderBy+limit → TakeOrderedAndProject. */
  def bpePairCensus(df: DataFrame, textCol: String, topK: Int): DataFrame =
    bpePairCensusFromWords(wordCensus(df, textCol), topK)

  /** [[bpePairCensus]] from an existing (w, c) word census — the
    * incremental-retrain entry point (see [[mergeWordCensus]]). */
  def bpePairCensusFromWords(words: DataFrame, topK: Int): DataFrame = {
    words.filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"), col("c"))
      .groupBy(col("pair")).agg(sum(col("c")).as("cnt"))
      .orderBy(desc("cnt"), asc("pair"))
      .limit(topK)
  }

  /** Train `numMerges` BPE merges the way production trainers scale it:
    * ONE distributed pass builds the word-frequency vocabulary, then
    * every merge iteration runs at VOCAB grain — census the adjacent
    * symbol pairs of ≤ ~10⁶ distinct words, pick the argmax
    * (count desc, then lexicographic — deterministic), apply the merge
    * greedily left-to-right per word. The corpus is never re-read.
    * Returns the ordered merge list [(left, right)]. */
  def trainBpeMerges(
      df: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] =
    trainBpeMergesFromWords(wordCensus(df, textCol), numMerges)

  /** [[trainBpeMerges]] from an existing (w, c) word census — the
    * incremental-retrain entry point (see [[mergeWordCensus]]). */
  def trainBpeMergesFromWords(
      words: DataFrame, numMerges: Int): Seq[(String, String)] = {
    // vocab to the driver: (symbols, weight). Production keeps this as
    // a DataFrame when vocab outgrows memory; the iteration structure
    // (pair census → argmax → merge) is identical either way.
    // Initial symbols are CODE POINTS, matching [[bpePairCensus]]'s
    // substring semantics — a UTF-16 Char split would seed non-BMP
    // words with lone-surrogate symbols, which are invalid strings the
    // moment a piece lands anywhere (parquet, JSON) un-merged.
    var vocab: Array[(Array[String], Long)] = words
      .collect()
      .map(r => (codePointSyms(r.getString(0)), r.getLong(1)))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    while (step < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, w) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + w)
          i += 1
        }
      }
      if (counts.isEmpty) return merges.toSeq
      val best = counts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }._1
      merges += best
      vocab = vocab.map { case (syms, w) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 &&
              syms(i) == best._1 && syms(i + 1) == best._2) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.toArray, w)
      }
      step += 1
    }
    merges.toSeq
  }

  /** Apply an ordered BPE merge list to one word (tokenizer INFERENCE):
    * start from characters, repeatedly merge the lowest-rank adjacent
    * pair (all its occurrences, left to right) until no learned pair
    * remains — the standard decode-side pairing of [[trainBpeMerges]].
    * Concatenating the returned pieces always reconstructs the word
    * exactly (BPE is lossless by construction). */
  /** Split a word into single-code-point symbol strings (the BPE
    * starting alphabet; a Char split would break surrogate pairs). */
  private def codePointSyms(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  def applyBpeMerges(
      word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = codePointSyms(word)
    var done = syms.length < 2
    while (!done) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0 || bestRank == Int.MaxValue) done = true
      else {
        val a = syms(bestIdx); val b = syms(bestIdx + 1)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        done = syms.length < 2
      }
    }
    syms
  }

  /** Encode every document with a trained merge list: per word, the
    * greedy rank-ordered merge loop of [[applyBpeMerges]]. The merge
    * table broadcasts in the task closure (a trained tokenizer is
    * ~50k pairs — KBs); tokenization itself stays codegen, and the
    * per-word merge loop runs behind a typed mapPartitions boundary —
    * the one genuinely iterative per-row algorithm Catalyst cannot
    * express (same justified escape as the MinHash signature barrier).
    * Output column is Array[Array[String]]: pieces per word, so word
    * boundaries survive for downstream packing/reconstruction. */
  def bpeEncode(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)],
      outCol: String = "bpe_tokens"): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    encodeWords(df, idCol, textCol, outCol)(w => applyBpeMerges(w, ranks).toSeq)
  }

  /** Word-frequency census of a corpus slice: (w, c) over normalized
    * whitespace words — the ONE corpus-grain shuffle (map-side combined)
    * every tokenizer trainer starts from; everything downstream (BPE
    * pair census, unigram seed pieces, WordPiece positional pieces)
    * derives from it at VOCAB grain.
    *
    * ADDITIVE by construction: wordCensus(A ⊎ B) ≡
    * [[mergeWordCensus]](wordCensus(A), wordCensus(B)) — the property
    * the incremental retrain path rides (oracle-pinned by
    * `l_census_incremental`). */
  def wordCensus(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(normalize(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))

  /** Merge shard word censuses by summing counts — vocab-grain work,
    * never corpus-grain. The continuous-ingest retrain shape at 100 TB:
    * the standing corpus census is maintained as a table; a new shard
    * contributes census(shard) = O(shard) work, the merge is one
    * ~10⁶-row shuffle, and every tokenizer family retrains from the
    * merged census WITHOUT rescanning the corpus ([[bpePairCensus]]'
    * pair explosion, [[Unigram.seedCensusFromWords]], and
    * [[WordPiece.pieceCensus]] all take the word census as input). */
  def mergeWordCensus(censuses: Seq[DataFrame]): DataFrame = {
    require(censuses.nonEmpty, "mergeWordCensus needs at least one census")
    censuses.reduce(_.unionByName(_))
      .groupBy(col("w")).agg(sum(col("c")).as("c"))
  }

  /** Shared vocab-build scaffolding ([[Unigram.seedCensus]] and
    * [[WordPiece.buildVocab]]): pin `censusPlan` to ONE physical plan
    * (LogicalRDD), take the top `topK` rows by `order`, and union back
    * every row matching `singles` (the stranded-word guard), deduping by
    * max(cnt) over the census's key columns (everything but `cnt`).
    *
    * The pin matters: left as two Catalyst branches, the `singles`
    * grouping-key filter pushes BELOW the census aggregate, the subplans
    * diverge, exchange reuse is lost, and the corpus scans + census
    * shuffle run twice. Shared here so the fix lives in exactly one
    * place. */
  private[llm] def pinnedTopKUnionSingles(
      censusPlan: DataFrame, order: Seq[Column],
      singles: Column, topK: Int): DataFrame = {
    val census = censusPlan.sparkSession
      .createDataFrame(censusPlan.rdd, censusPlan.schema)
    val top = census.orderBy(order: _*).limit(topK)
    val keyCols = census.columns.filterNot(_ == "cnt").map(col(_))
    top.unionByName(census.filter(singles))
      .groupBy(keyCols: _*).agg(max(col("cnt")).as("cnt"))
  }

  /** Shared per-word tokenizer-inference scaffolding (BPE and unigram):
    * tokenization stays codegen; `segment` runs per word behind the one
    * justified mapPartitions boundary, with whatever table it needs
    * captured in its closure. Output `outCol` is Array[Array[String]]
    * (pieces per word) so word boundaries survive for downstream
    * packing/reconstruction. */
  private[llm] def encodeWords(
      df: DataFrame, idCol: String, textCol: String, outCol: String)(
      segment: String => Seq[String]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    val worded = df.select(col(idCol),
      tokens(normalize(col(textCol))).as("__words"))
    val wIdx = worded.schema.fieldIndex("__words")
    val outSchema = StructType(
      worded.schema.fields.patch(wIdx, Nil, 1) :+
        StructField(outCol, ArrayType(ArrayType(StringType))))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    worded.mapPartitions { rows =>
      // Zipf makes repeated words the common case, so memoize
      // segmentations per task: corpus-grain encode then does
      // VOCABULARY-grain segmentation work (measured: the unigram
      // encode's ×100 slope was 1.19 without this — per-occurrence DP —
      // and the distinct-word count barely grows with corpus size).
      // Bounded: past the cap, segment without caching (a few MB of
      // memo covers the head of any natural-language distribution).
      val memo = new java.util.HashMap[String, Seq[String]](1 << 12)
      def seg(w: String): Seq[String] = {
        val hit = memo.get(w)
        if (hit != null) hit
        else {
          val s = segment(w)
          if (s != null && memo.size < (1 << 17)) memo.put(w, s)
          s
        }
      }
      rows.map { r =>
        val ws = r.getSeq[String](wIdx)
        val pieces: Seq[Seq[String]] =
          if (ws == null) null else ws.map(seg)
        Row.fromSeq(r.toSeq.patch(wIdx, Nil, 1) :+ pieces)
      }
    }(enc)
  }

  /** RE2-compatible URL pattern (scheme + host, optional path) — works
    * identically under Java regex and DuckDB's RE2. */
  val UrlPattern = "https?://[A-Za-z0-9.-]+(/[^ \\t\\n]*)?"

  /** Number of http(s) URLs in the text. */
  def urlCount(text: Column): Column =
    regexp_count(text, lit(UrlPattern))

  /** Host names of every http(s) URL in the text (with duplicates, in
    * order) — group-1 extraction, codegen'd builtin, no per-element
    * lambda. */
  def urlDomains(text: Column): Column =
    regexp_extract_all(text, lit("https?://([A-Za-z0-9.-]+)"), lit(1))

  /** Sentence count: runs of terminal punctuation followed by whitespace
    * or end-of-text. Counting (not splitting) keeps the expression
    * RE2-portable — sentence SPLITTING needs lookbehind, which RE2
    * lacks; for the split itself use Java-regex `split` knowing the
    * oracle can only verify counts. */
  def sentenceCount(text: Column): Column =
    regexp_count(text, lit("[.!?]+([ \\t\\n]|$)"))

  /** Per-document TF-IDF top terms: for each doc, the `topK` tokens by
    * tf × idf with the RAW idf variant (n_docs / df) rather than
    * ln(n_docs / df) — transcendental functions are not bit-reproducible
    * across engines (ln is not required to be correctly rounded), while
    * tf·n/df is one exact-integer division, so the score itself can be
    * hash-verified; the ranking intent (frequent-here, rare-elsewhere) is
    * the same and ln is monotonic in it. Swap `col("score")` for
    * `log(col("score"))`-based weighting if the magnitudes matter.
    *
    * Shape: one explode + two hash aggregations (doc-term, then term),
    * a broadcast of the 1-row corpus count, and a PARTITIONED window for
    * the per-doc top-k — no global sort, no unpartitioned window.
    *
    * The df join is the scale decision: "token" is Zipf-skewed by
    * nature (a stopword's partition carries a row per document), so
    * shuffling the doc-term matrix on it degrades superlinearly —
    * measured slope 1.88 at ×10 on the shared-vocab corpus. The
    * term-grain df table is VOCAB-sized, so when a LIMIT-bounded probe
    * says it fits (default ≤ 2^21 terms — tens of MB, comfortably
    * broadcastable), it broadcasts and the skewed shuffle disappears
    * (the only remaining corpus shuffle is the doc-grain window). A
    * web-scale vocabulary over the cap falls back to the shuffle join,
    * where AQE's skew split handles the hot tokens. */
  def tfidfTopTerms(
      df: DataFrame, idCol: String, textCol: String, topK: Int,
      broadcastVocabLimit: Long = 1L << 21): DataFrame =
    tfidfTopTermsReleasable(df, idCol, textCol, topK, broadcastVocabLimit)._1

  /** [[tfidfTopTerms]] plus a release handle for the shared df-table
    * cache: the term-grain df table is cached so the broadcast-fits
    * probe and the scoring join share one corpus aggregation, but the
    * cache outlives the returned (lazy) plan. A single-shot caller can
    * ignore the handle (one vocab table, bounded); a caller LOOPING
    * over corpus slices must call release() after consuming each
    * result, or the cached vocab tables accumulate for the session's
    * lifetime. release() is idempotent; consuming the result after
    * release is correct but recomputes the df table once. */
  def tfidfTopTermsReleasable(
      df: DataFrame, idCol: String, textCol: String, topK: Int,
      broadcastVocabLimit: Long = 1L << 21): (DataFrame, () => Unit) = {
    import org.apache.spark.sql.expressions.Window
    val tf = df
      .select(col(idCol).as("doc_id"),
        explode(cleanTokens(normalize(col(textCol)))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // Cached so the LIMIT-bounded fits-probe and the join below share one
    // term-grain aggregation instead of re-running the corpus explode.
    val dfT = tf.groupBy("token").agg(count(lit(1)).as("df_t")).cache()
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    // probe limit clamped: limits ≥ Int.MaxValue would wrap negative in
    // .limit(); at that point the probe is moot (limit() can't exceed it)
    val probeLimit =
      math.min(broadcastVocabLimit + 1, Int.MaxValue.toLong).toInt
    val vocabFits = dfT.limit(probeLimit).count() <= broadcastVocabLimit
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(desc("score"), asc("token"))
    val out = tf.join(if (vocabFits) broadcast(dfT) else dfT, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * col("n_docs") / col("df_t"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("token"), col("tf"), col("df_t"),
        col("score"), col("rank"))
    (out, () => { dfT.unpersist(); () })
  }

  /** C4-style line filter: drop lines with fewer than `minWords`
    * whitespace tokens (navigation crumbs, lone numbers, boilerplate
    * fragments), keeping the rest joined with '\n'. One primitive pass in
    * codegen (graft.functions.CleanLines) — the
    * `filter(split(text), l -> ...)` formulation evaluates interpreted
    * per line. */
  def cleanLines(text: Column, minWords: Int = 3): Column =
    graft.functions.F.cleanLines(text, minWords)

  /** Composite 0–100 quality score from public heuristics: length,
    * stopword density, punctuation density, mean word length. Mirrors the
    * length/punct/stopword-ratio recipe used by open web-corpus filters. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text).cast(DoubleType) / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val meanWordLen =
      length(regexp_replace(text, "\\s+", "")).cast(DoubleType) /
        nullif(tokenCount(text), lit(0)).cast(DoubleType)
    val wordLenScore =
      when(meanWordLen.between(3.0, 10.0), 1.0)
        .when(meanWordLen.isNull, 0.0)
        .otherwise(0.5)
    round(
      lit(100.0) * (lenScore * 0.3 + stopScore * 0.3 + punctScore * 0.2 +
        wordLenScore * 0.2), 2)
  }
}
