package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators for training-data assembly: deterministic
  * train/val/test splitting, cross-corpus decontamination, domain-mix
  * sampling weights, and Gopher-style document quality rules.
  *
  * All of these are single-pass or single-shuffle designs: splitting and
  * quality rules are pure row-local expressions (whole-stage codegen,
  * no shuffle at all); decontamination is one equi-join on the n-gram;
  * mixing weights aggregate to one row per domain before any join.
  */
object Curation {

  // ---------------------------------------------------------------------
  // Deterministic splitting
  // ---------------------------------------------------------------------

  /** 16-bit hash bucket of an id: the first 4 hex chars of md5(id as
    * string), parsed to [0, 65536). md5 is engine-portable (same bytes in
    * Spark, DuckDB, Python), so the assignment is reproducible anywhere —
    * unlike xxhash64, whose seeds differ per engine. Row-local codegen;
    * no shuffle. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast(StringType)), 1, 4), 16, 10).cast(IntegerType)

  /** Deterministic corpus split by hashed id. `splits` are (label,
    * fraction) in ladder order; fractions must sum to 1. A row's split is
    * decided only by its id — stable under re-runs, repartitioning,
    * appends, and engine changes, which is what keeps eval sets leak-free
    * as the corpus grows (a random() split resamples every run). */
  def withSplit(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Double)] = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      bucketCol: String = "split"): DataFrame =
    df.withColumn(bucketCol, splitOf(col(idCol), splits))

  /** The split label of a single id column — [[withSplit]]'s ladder as a
    * row-local expression, so derived frames (near-dup PAIRS, shard
    * manifests) can recover each side's split without joining back to
    * the corpus: the split is a pure function of the id. */
  def splitOf(
      id: Column,
      splits: Seq[(String, Double)] = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)): Column = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    val b = hashBucket(id).cast(DoubleType) / lit(65536.0)
    val ladder = splits.toList.scanLeft(("", 0.0)) {
      case ((_, cum), (label, w)) => (label, cum + w)
    }.tail
    ladder.init.foldRight(lit(ladder.last._1): Column) {
      case ((label, cum), acc) => when(b < cum, label).otherwise(acc)
    }
  }

  /** Deterministic global shuffle into `nShards` balanced shards — the
    * training-order randomization step (every epoch-shuffle pipeline
    * needs one before packing/writing shards). Each row gets
    * `shard` = md5-bucket of its id and `pos` = its rank inside the
    * shard ordered by the full md5 key, so (shard, pos) is a
    * reproducible pseudorandom permutation of the corpus: stable under
    * re-runs, repartitioning, and engine changes (md5, unlike
    * xxhash64, hashes to the same bytes everywhere).
    *
    * Scale shape: assignment is row-local codegen (no shuffle); the
    * rank is a window partitioned BY SHARD, so the one shuffle is
    * hash-distribution on `shard` and each shard sorts locally. At
    * 100 TB you pick `nShards` ≥ cluster parallelism (e.g. 10k shards
    * of ~10 GB) so no partition ever holds more than one shard's rows
    * — this never degenerates into the single-partition global
    * row_number that a naive "shuffle then number everything" plan
    * produces. */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    import org.apache.spark.sql.expressions.Window
    val key = md5(col(idCol).cast(StringType))
    // First 8 hex chars → [0, 2^32): non-negative, so % == pmod and the
    // DuckDB oracle's plain % matches.
    val h = conv(substring(key, 1, 8), 16, 10).cast(LongType)
    df.select(col(idCol), key.as("shuffle_key"),
        (h % nShards).cast(IntegerType).as("shard"))
      .withColumn("pos",
        (row_number().over(
          Window.partitionBy(col("shard"))
            .orderBy(col("shuffle_key"), col(idCol))) - 1).cast(LongType))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Deterministic stand-in weight table for [[linearTextScore]] —
    * integer thousandths in [-500, 499]. A TRAINED model (fastText-style
    * quality classifier) drops in as the same array; this formula only
    * exists so tests and the cross-engine oracle can rebuild the table
    * without shipping a model file. */
  def standInWeightsMilli(d: Int): Array[Long] =
    Array.tabulate(d)(i => (i.toLong * 2654435761L) % 1000L - 500L)

  /** md5 token feature-bucket in [0, d) — THE formula the trained model
    * ([[perceptronTrain]]/[[hashedBow]]) and every scorer
    * ([[linearTextScore]], [[perceptronMargin]]) must share
    * bit-identically: train/inference bucket agreement is load-bearing,
    * so it exists exactly once. */
  private def tokenBucket(t: Column, d: Int): Column =
    pmod(conv(substring(md5(t), 1, 4), 16, 10).cast(LongType),
      lit(d.toLong))

  /** Linear text-classifier INFERENCE at corpus scale (the fastText-
    * shaped quality filter every production pipeline runs over 100 TB):
    * each token feature-hashes into a broadcast weight table (md5
    * bucket — engine-portable, same reason as [[hashBucket]]) and the
    * document scores as the mean token weight. Entirely row-local
    * codegen — ZERO shuffles at any corpus size; the weight table rides
    * along as a literal array (a few KB), exactly how a broadcast model
    * behaves on a cluster. Weights are integer thousandths, so the
    * accumulation is exact integer arithmetic and the single IEEE
    * division at the end reproduces bit-for-bit in any engine. Returns
    * NULL for token-less documents. */
  def linearTextScore(text: Column, weightsMilli: Array[Long]): Column = {
    val d = weightsMilli.length
    val wLit = typedlit(weightsMilli.toSeq)
    val toks = TextAnalysis.tokens(TextAnalysis.normalize(text))
    val milliSum = aggregate(
      transform(toks, t => element_at(wLit,
        (tokenBucket(t, d) + 1).cast(IntegerType))),
      lit(0L), (acc, x) => acc + x)
    // guard on the normalized TEXT, not size(toks): splitting "" yields
    // [""] (size 1), so a token-less doc would otherwise score the hash
    // bucket of the empty string
    when(length(TextAnalysis.normalize(text)) > 0,
      milliSum.cast(DoubleType) / (size(toks) * lit(1000.0)))
      .otherwise(lit(null).cast(DoubleType))
  }

  /** Token-budget corpus selection: keep the highest-quality documents
    * whose total token count fits `budgetTokens` — the "train on the
    * best N tokens" cut every budgeted pretraining run makes. The
    * quality signal must be INTEGER-quantized (bucket a float score
    * first); selection descends quality levels whole-level-at-a-time,
    * and the boundary level that doesn't fully fit splits by a
    * deterministic 256-way id-hash sub-bucket, selecting the ascending
    * prefix of sub-buckets that still fits (conservative at 1/256-level
    * resolution — never overshoots the budget).
    *
    * Scale shape — NO global sort and NO corpus-sized window anywhere:
    * one quality-level histogram (≤ levels rows) and one sub-bucket
    * histogram of the boundary level (≤ 256 rows) collect to the
    * driver; the cutoffs come back as literals into one row-local
    * codegen filter over the corpus. Compare: the textbook greedy
    * (sort all docs by quality, take the prefix) is a total order over
    * 100 TB. Returns the selected docs as (idCol, quality, n_tokens). */
  def selectToBudget(
      df: DataFrame, idCol: String, textCol: String, qualityCol: String,
      budgetTokens: Long, subBuckets: Int = 256): DataFrame = {
    require(budgetTokens >= 0 && subBuckets >= 2, "bad budget/subBuckets")
    // null-quality docs (missing classifier output) are EXCLUDED, not
    // crashed on — and the slim projection persists because three
    // actions consume it (two histogram collects + the output filter);
    // recomputing the corpus scan per action would triple the cost
    val base = df.filter(col(qualityCol).isNotNull)
      .select(col(idCol),
        col(qualityCol).cast(LongType).as("quality"),
        TextAnalysis.tokenCount(col(textCol)).cast(LongType).as("n_tokens"),
        (hashBucket(col(idCol)) % subBuckets).as("__sub"))
      .persist()
    val levels = base.groupBy(col("quality"))
      .agg(sum(col("n_tokens")).as("tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    var used = 0L
    var minFull: Option[Long] = None
    var boundary: Option[Long] = None
    levels.foreach { case (q, tok) =>
      if (boundary.isEmpty) {
        if (used + tok <= budgetTokens) { used += tok; minFull = Some(q) }
        else boundary = Some(q)
      }
    }
    val subCut: Option[Int] = boundary.map { qb =>
      val subs = base.filter(col("quality") === qb)
        .groupBy(col("__sub")).agg(sum(col("n_tokens")).as("tok"))
        .collect().map(r => (r.getInt(0), r.getLong(1)))
        .sortBy(_._1)
      // ascending prefix of sub-buckets whose cumulative total fits the
      // remaining budget (equivalently: max sub with running-cum ≤ r)
      var r = budgetTokens - used
      var cut = -1
      var fits = true
      subs.foreach { case (s, tok) =>
        if (fits && tok <= r) { r -= tok; cut = s }
        else fits = false
      }
      cut
    }
    // boundary (if any) is strictly below minFull in the descent, so
    // quality >= minFull selects exactly the fully-fitting levels
    val fullPred = minFull
      .map(mq => col("quality") >= mq).getOrElse(lit(false))
    val subPred = (boundary, subCut) match {
      case (Some(qb), Some(c)) if c >= 0 =>
        col("quality") === qb && col("__sub") <= c
      case _ => lit(false)
    }
    // the result re-reads the persisted projection; unpersisting here
    // would recompute it, so the cache is released lazily by eviction
    base.filter(fullPred || subPred)
      .select(col(idCol), col("quality"), col("n_tokens"))
  }

  /** Preference-pair construction for reward-model / DPO-style training
    * from a weak quality signal: within each group (source, domain,
    * prompt cluster — pairs must be COMPARABLE), the top-k docs by
    * score pair with the bottom-k ("extremes pairing": rank-1 chosen
    * with rank-1-from-the-bottom rejected, etc.), keeping pairs whose
    * score gap clears `minGap` — wide-margin pairs carry the training
    * signal; near-ties are noise.
    *
    * Scale shape: ONE grouped aggregate with TWO bounded heaps per
    * group ([[graft.functions.TopKStructs]] on (score, id) and on
    * (-score, id)) — ≤ k rows per (group, partition) cross the wire for
    * each end, never a per-group sort; the zip/explode afterwards is
    * output-sized. Ties break on id (descending, the heap's
    * lexicographic order) so pairing is fully deterministic. */
  def preferencePairs(
      df: DataFrame, idCol: String, scoreCol: String, groupCol: String,
      k: Int, minGap: Long): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val base = df.select(col(groupCol).as("grp"),
      col(idCol).as("id"), col(scoreCol).as("score"))
    base.groupBy(col("grp"))
      .agg(
        graft.functions.F.topKStructs(
          struct(col("score"), col("id")), k).as("top"),
        graft.functions.F.topKStructs(
          struct((-col("score")).as("nscore"), col("id")), k).as("bot"))
      .select(col("grp"),
        posexplode(arrays_zip(col("top"), col("bot"))).as(Seq("i", "p")))
      .select(col("grp").as(groupCol),
        (col("i") + 1).cast(IntegerType).as("pair_rank"),
        col("p.top.id").as("chosen_id"),
        col("p.top.score").as("chosen_score"),
        col("p.bot.id").as("rejected_id"),
        (-col("p.bot.nscore")).as("rejected_score"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("chosen_score") - col("rejected_score") >= minGap)
      .orderBy(col(groupCol), col("pair_rank"))
  }

  /** Hashed bag-of-words features at (doc, bucket, count) grain — the
    * featurization [[perceptronTrain]] and [[perceptronMargin]] share
    * (md5 token bucket, the engine-portable hash discipline). */
  private def hashedBow(
      df: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(TextAnalysis.tokens(TextAnalysis.normalize(col(textCol))))
          .as("t"))
      .filter(length(col("t")) > 0)
      .select(col("__id"), tokenBucket(col("t"), dim).as("b"))
      .groupBy(col("__id"), col("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Distributed batch-perceptron TRAINING — the training half of the
    * [[linearTextScore]] seam (its scaladoc: "a TRAINED model drops in
    * as the same array"). The fastText-shaped quality classifier every
    * production pipeline trains on labeled docs and runs over the
    * corpus, built so that TRAINING ITSELF is bit-reproducible in any
    * engine: hashed token counts are integers, the learning rate is 1,
    * and the batch update w += Σ_misclassified y·x is an exact integer
    * sum — no transcendental loss, no float gradient order-dependence
    * (logistic regression's exp is exactly what wouldn't cross-engine
    * hash-match).
    *
    * Each epoch costs two keyed aggregates over the cached feature
    * table — doc-grain margins under the broadcast weight vector, then
    * bucket-grain gradient over the misclassified docs — and the weight
    * vector (`dim` entries, a few KB) collects to the driver and
    * re-broadcasts as a literal, the k-means-centroid discipline.
    * Labels must be +1/-1. Returns the weight array (index = bucket).
    * Margins classify at 0; [[linearTextScore]]'s mean-weight form
    * divides by a positive length, so DECISIONS agree either way. */
  def perceptronTrain(
      df: DataFrame, idCol: String, textCol: String, labelCol: String,
      dim: Int = 256, epochs: Int = 3): Array[Long] = {
    require(dim >= 2 && epochs >= 1, s"need dim >= 2, epochs >= 1")
    val labels = df.select(col(idCol).as("__id"),
      col(labelCol).cast(LongType).as("y"))
    val feats = hashedBow(df, idCol, textCol, dim)
      .join(labels, "__id").persist()
    // Eager fill: every epoch's plan references `feats` TWICE (the
    // margin subtree + the gradient join), so the first epoch against a
    // cold cache re-runs the tokenize+hash build through both branches.
    // The count also measures the (doc × bucket)-grain state, which
    // sizes the epochs' shuffle partitions below — per-epoch state is a
    // few bytes per (doc, bucket), and the session-wide fan-out
    // dominated epoch wall time at gate scale.
    val nFeats = feats.count()
    try graft.core.ShuffleSizing.withSizedShuffle(
        df.sparkSession, nFeats, 48L) {
      val w = Array.fill(dim)(0L)
      for (_ <- 1 to epochs) {
        val wLit = typedlit(w.toSeq)
        val margins = feats
          .groupBy(col("__id"), col("y"))
          .agg(sum(col("cnt") *
            element_at(wLit, (col("b") + 1).cast(IntegerType)))
            .as("margin"))
        val grad = feats
          .join(margins.filter(col("y") * col("margin") <= 0)
            .select(col("__id")), "__id")
          .groupBy(col("b"))
          .agg(sum(col("y") * col("cnt")).as("g"))
          .collect()
        grad.foreach(r => w(r.getLong(0).toInt) += r.getLong(1))
      }
      w
    } finally { feats.unpersist(): Unit }
  }

  /** Integer margin Σ count(b) · w[b] of a trained [[perceptronTrain]]
    * model over a document — row-local codegen (the weight vector rides
    * as a literal array), ZERO shuffles at any corpus size, and the
    * margin is an exact integer so classification hash-verifies
    * cross-engine. Token-less docs margin 0. */
  def perceptronMargin(text: Column, weights: Array[Long]): Column = {
    val d = weights.length
    val wLit = typedlit(weights.toSeq)
    val toks = TextAnalysis.tokens(TextAnalysis.normalize(text))
    val s = aggregate(
      filter(toks, t => length(t) > 0),
      lit(0L),
      (acc, t) => acc + element_at(wLit,
        (tokenBucket(t, d) + 1).cast(IntegerType)))
    coalesce(s, lit(0L))
  }

  // ---------------------------------------------------------------------
  // Cross-corpus decontamination
  // ---------------------------------------------------------------------

  /** Training docs that share ≥ `minShared` distinct word n-grams with
    * the eval corpus (test-set contamination scan). Returns (doc_id,
    * n_shared, n_ngrams, contamination = n_shared / n_ngrams).
    *
    * Shape: the eval side collapses to a DISTINCT n-gram set first, so
    * the join is posting-list × set — one equi-join on the n-gram string,
    * never a doc × doc product. Eval corpora (benchmarks) are tiny next
    * to a 100 TB train corpus, so the deduped eval set broadcasts and the
    * whole scan is shuffle-free on the train side; set `broadcastEval =
    * false` if the eval side is itself corpus-sized. */
  def contamination(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minShared: Int = 1,
      broadcastEval: Boolean = true): DataFrame = {
    val sh = Dedup.wordShingles(col(textCol), n)
    val trainSh = train.select(col(idCol).as("doc_id"), sh.as("grams"))
      .select(col("doc_id"), size(col("grams")).as("n_ngrams"),
        explode(col("grams")).as("gram"))
    val evalSet0 = eval.select(explode(sh).as("gram")).distinct()
    val evalSet = if (broadcastEval) broadcast(evalSet0) else evalSet0
    trainSh.join(evalSet, "gram")
      // wordShingles is distinct-per-doc, so the match count IS the
      // distinct shared-gram count — no second dedup shuffle needed.
      .groupBy(col("doc_id"), col("n_ngrams"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"), col("n_shared"), col("n_ngrams"),
        (col("n_shared").cast(DoubleType) /
          col("n_ngrams").cast(DoubleType)).as("contamination"))
  }

  /** The EVAL-side of the contamination story — [[contamination]] asks
    * "which train docs should I drop"; this asks the question a model
    * evaluator asks FIRST: "how much of my eval suite already leaks
    * into training data". Per eval doc: how many of ITS n-grams appear
    * anywhere in train (`coverage`), how many distinct train docs share
    * at least one gram, and whether the doc is fully leaked.
    *
    * Scale shape: the EVAL gram stream is small by definition (an eval
    * suite) and broadcasts. COVERAGE is pair-free — it only asks set
    * membership (which eval grams exist in train), so it rides a
    * gram-set semi-join whose exchange carries ≤ |eval gram set| rows.
    * Distinct-train-doc counts need the pair grain, but only the
    * DISTINCT (eval, train) pairs: the gram-grain join output collapses
    * to that grain inside its own stage (map-side partial aggregation)
    * and the gram-grain stream is never landed — an earlier form
    * localCheckpoint'ed it to share between the two rollups and the
    * ×100 replica measured that landed stream at disk-filling size
    * (every gram is ~replica-factor-hot yet below any sane df cap).
    * Neither rollup uses a countDistinct Expand. Eval docs with zero
    * matches surface with coverage 0 via the eval-grain left join —
    * absence of evidence must be a ROW, not a missing row. */
  def evalContaminationReport(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int = 3, hotGramDf: Option[Long] = None): DataFrame = {
    val sh = Dedup.wordShingles(col(textCol), n)
    val evalBase = eval
      .select(col(idCol).as("eval_id"), sh.as("__grams"))
      .select(col("eval_id"), size(col("__grams")).as("n_ngrams"),
        col("__grams"))
    val evalGrams = evalBase
      .select(col("eval_id"), explode(col("__grams")).as("gram"))
    val trainGrams = train
      .select(col(idCol).as("__tid"), explode(sh).as("gram"))

    // HOT grams — train doc-frequency above the cap. The ×100 campaign
    // found the naive gram join QUADRATIC under a boilerplate phrase
    // shared by eval and train (each hot gram matches hot_train ×
    // hot_eval pairs; the materialized match stream filled the disk).
    // Hot grams never need pair enumeration:
    //   - coverage: a hot gram is covered BY DEFINITION (df > cap ≥ 1
    //     train docs contain it) — count it row-local;
    //   - distinct train docs: decompose as |cold ∪ hot| = n_cold +
    //     n_hot − n_cold∩hot, where hot membership is a row-local
    //     intersection with the (tiny, broadcast) hot-gram set and
    //     n_hot groups train docs by their hot-gram MASK (boilerplate
    //     means most docs share the same few masks).
    // Every output stays EXACT — the cap only changes the plan.
    val hotGrams: Array[String] = hotGramDf match {
      case None => Array.empty
      case Some(cap) =>
        val hot = trainGrams.groupBy(col("gram"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df") > cap)
          .select(col("gram")).collect().map(_.getString(0))
        require(hot.length <= 100000,
          s"${hot.length} grams exceed hotGramDf=$cap — raise the cap " +
            "(the hot set broadcasts and must stay small)")
        hot.sorted
    }

    if (hotGrams.isEmpty) {
      // Coverage: intersect the (tiny, broadcast) eval gram SET with
      // the train gram stream — the semi-matched train rows collapse to
      // ≤ |eval gram set| before their exchange, and no (eval, train)
      // pair exists anywhere in this branch of the plan.
      val evalGramSet = evalGrams.select("gram").distinct()
      val coveredGrams = trainGrams
        .join(broadcast(evalGramSet), Seq("gram"), "left_semi")
        .select("gram").distinct()
      // wordShingles is distinct-per-doc, so counting e's semi-matched
      // gram rows IS e's distinct covered-gram count.
      val cov = evalGrams
        .join(broadcast(coveredGrams), Seq("gram"), "left_semi")
        .groupBy("eval_id").agg(count(lit(1)).as("n_covered"))
      // Distinct train docs: collapse the gram-grain join output to the
      // distinct (eval_id, __tid) grain in-stage; the exchange carries
      // only distinct pairs (output-bound), never the gram-grain stream.
      val td = trainGrams.join(broadcast(evalGrams), "gram")
        .select("eval_id", "__tid").distinct()
        .groupBy("eval_id").agg(count(lit(1)).as("n_train_docs"))
      evalBase.drop("__grams")
        .join(cov, Seq("eval_id"), "left")
        .join(td, Seq("eval_id"), "left")
        .na.fill(0L, Seq("n_covered", "n_train_docs"))
        .withColumn("coverage",
          col("n_covered").cast(DoubleType) /
            nullif(col("n_ngrams"), lit(0)).cast(DoubleType))
        .withColumn("fully_leaked",
          col("n_ngrams") > 0 && col("n_covered") === col("n_ngrams"))
    } else {
      val hotLit = typedlit(hotGrams.toSeq)
      // TRAIN-side hot membership goes through a broadcast HASH join,
      // not array_contains(literal): the literal scan is O(|hot|) per
      // gram row — at a 10⁵ hot set over 10⁹ train gram rows that is
      // 10¹⁴ string compares, dwarfing the pair join the cap avoids.
      // (array_intersect with hotLit below is fine: it only runs on the
      // fixed-size eval suite.)
      val sp = train.sparkSession
      import sp.implicits._
      val hotDf = broadcast(hotGrams.toSeq.toDF("gram"))
      // cold pair stream: bounded by cap × |eval grams|
      val coldTrain = trainGrams.join(hotDf, Seq("gram"), "left_anti")
      val coldEval = evalGrams.join(hotDf, Seq("gram"), "left_anti")
      // coverage = cold grams present in cold train (pair-free gram-set
      // intersection, same shape as the uncapped branch) + hot grams
      // (covered by definition: df > cap ≥ 1)
      val coldEvalSet = coldEval.select("gram").distinct()
      val coveredCold = coldTrain
        .join(broadcast(coldEvalSet), Seq("gram"), "left_semi")
        .select("gram").distinct()
      val covCold = coldEval
        .join(broadcast(coveredCold), Seq("gram"), "left_semi")
        .groupBy("eval_id").agg(count(lit(1)).as("__cov_cold"))
      val evalHot = evalBase.select(col("eval_id"),
        array_sort(array_intersect(col("__grams"), hotLit)).as("__hot"))
      val covHot = evalHot.select(col("eval_id"),
        size(col("__hot")).cast(LongType).as("__cov_hot"))
      // per-train-doc hot-gram mask, ONE definition shared by nHot
      // (via the mask census below) and nColdHot (via the join) — the
      // identical aggregate exchange dedupes under ReuseExchange. NOT
      // materialized: with a large organic hot set (every gram above
      // 1% df, not just a planted phrase) the (id, mask-array) table
      // is corpus-scale, and an eager localCheckpoint of it OOMed the
      // ×100 measurement run that the streamed form completes.
      val trainMask = trainGrams.join(hotDf, Seq("gram"), "left_semi")
        .groupBy(col("__tid"))
        .agg(array_sort(collect_set(col("gram"))).as("__tmask"))
      // mask → doc count; boilerplate collapses most docs onto a
      // handful of masks
      val masks = trainMask
        .select(col("__tmask").as("__mask"))
        .groupBy(col("__mask"))
        .agg(count(lit(1)).as("__mask_docs"))
      // n_hot(e) = Σ docs of masks overlapping e's hot grams
      val nHot = evalHot.filter(size(col("__hot")) > 0)
        .join(broadcast(masks), arrays_overlap(col("__hot"), col("__mask")))
        .groupBy("eval_id").agg(sum(col("__mask_docs")).as("__n_hot"))
      // n_cold(e) and the overlap correction n_cold∩hot(e): cold-matched
      // train docs whose own hot mask intersects e's hot grams. The
      // distinct (eval, train) pair table is quadratic at adversarial
      // grain (every eval doc vocabulary-matching most train docs), so
      // it must NEVER be materialized: a localCheckpoint of it OOMed an
      // ×100 measurement run at ~10⁹ pairs (and the previous shape,
      // which landed the GRAM-grain stream, filled the disk before
      // that). Instead the pair stream is consumed EXACTLY ONCE: the
      // gram-grain join collapses to distinct pairs in-stage, flows
      // through the mask join, and ONE aggregation computes both
      // n_cold (count) and n_cold∩hot (conditional count) — every
      // pair-scale stage streams through shuffle files, nothing lands
      // in a storage level.
      val coldPairs = coldTrain.join(broadcast(coldEval), "gram")
        .select("eval_id", "__tid").distinct()
      val nColdBoth = coldPairs
        .join(trainMask, Seq("__tid"), "left")
        .join(broadcast(evalHot), Seq("eval_id"), "left")
        .groupBy("eval_id").agg(
          count(lit(1)).as("__n_cold"),
          sum(when(size(col("__hot")) > 0 && col("__tmask").isNotNull &&
              arrays_overlap(col("__hot"), col("__tmask")), 1L)
            .otherwise(0L)).as("__n_coldhot"))
      evalBase.drop("__grams")
        .join(covCold, Seq("eval_id"), "left")
        .join(covHot, Seq("eval_id"), "left")
        .join(nColdBoth, Seq("eval_id"), "left")
        .join(nHot, Seq("eval_id"), "left")
        .na.fill(0L, Seq("__cov_cold", "__cov_hot", "__n_cold", "__n_hot",
          "__n_coldhot"))
        .withColumn("n_covered", col("__cov_cold") + col("__cov_hot"))
        .withColumn("n_train_docs",
          col("__n_cold") + col("__n_hot") - col("__n_coldhot"))
        .drop("__cov_cold", "__cov_hot", "__n_cold", "__n_hot", "__n_coldhot")
        .withColumn("coverage",
          col("n_covered").cast(DoubleType) /
            nullif(col("n_ngrams"), lit(0)).cast(DoubleType))
        .withColumn("fully_leaked",
          col("n_ngrams") > 0 && col("n_covered") === col("n_ngrams"))
    }
  }

  /** [[contamination]] flipped into the cleaning action: train rows with
    * contamination below `maxContamination` (anti-join on the flagged
    * set). */
  def decontaminate(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int = 3, maxContamination: Double = 0.2): DataFrame = {
    val flagged = contamination(train, eval, idCol, textCol, n)
      .filter(col("contamination") >= maxContamination)
      .select(col("doc_id").as(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Bloom bitmap of the eval set's distinct n-grams, built on the
    * driver — the eval/benchmark set is SMALL by definition (that is
    * the whole reason decontamination is tractable); at the default
    * 2²² bits (512 KB) a 100k-gram benchmark fills < 5% of the bitmap
    * and the per-gram false-positive rate with k=3 probes is ≪ 1%.
    *
    * Keyed on 64-bit GRAM HASHES (Kernels.ngramHashes), not gram
    * strings: the probe side then hashes 8 longs per gram instead of
    * concatenating and hashing a ~50-byte string — the DecontamScale
    * ×100 measurement showed the probe stage dominated by exactly that
    * gram-string materialization. Equal grams always hash equal, so
    * the probe still can never miss a true overlap. */
  def evalBloom(
      eval: DataFrame, textCol: String, n: Int,
      numBits: Int = 1 << 22, k: Int = 3): Array[Long] = {
    val grams = eval
      .select(explode(gramHashes(col(textCol), n)).as("gh"))
      .distinct().collect().map(_.getLong(0))
    val bits = new Array[Long]((numBits + 63) / 64)
    grams.foreach(g => graft.functions.Kernels.bloomSetLong(bits, numBits, k, g))
    bits
  }

  /** Distinct word-n-gram hashes of a text column — normalize +
    * tokenize exactly as [[Dedup.wordShingles]], then the hash-space
    * kernel instead of gram-string materialization. */
  private def gramHashes(text: Column, n: Int): Column =
    graft.functions.F.wordNgramHashes(
      TextAnalysis.tokens(TextAnalysis.normalize(text)), n)

  /** The 100 TB form of [[decontaminate]]: identical OUTPUT, different
    * plan. The exact path explodes every train document into one row
    * per n-gram (a 50–500× row blow-up feeding a join and a re-group
    * shuffle); here a per-row codegen Bloom probe
    * ([[graft.functions.BloomCountIn]]) computes a superset
    * contamination estimate in ONE projection — no explode, no join,
    * no shuffle — and only the suspects (bloom estimate ≥ threshold; a
    * strict superset of the truly contaminated, since FPs only ADD)
    * pay the exact verification. On a clean-ish corpus the exact stage
    * processes a sliver of the data; correctness never depends on the
    * bitmap. */
  /** The Bloom pre-filter stage of [[decontaminateBloom]], exposed so
    * the scale harness can measure the suspect fraction directly: rows
    * whose bitmap-estimated contamination reaches the threshold — a
    * strict SUPERSET of the truly contaminated (false positives only
    * ADD shared-gram counts). One codegen projection over the train
    * scan; no explode, no join, no shuffle. */
  def bloomSuspects(
      train: DataFrame, bits: Array[Long], textCol: String,
      n: Int, maxContamination: Double,
      numBits: Int = 1 << 22, k: Int = 3): DataFrame =
    train
      .withColumn("__gh", gramHashes(col(textCol), n))
      .withColumn("__bloom_shared",
        graft.functions.F.bloomCountInLongs(col("__gh"), bits, numBits, k))
      .filter(size(col("__gh")) > 0 &&
        col("__bloom_shared").cast(DoubleType) /
          size(col("__gh")).cast(DoubleType) >= maxContamination)
      .drop("__gh", "__bloom_shared")

  def decontaminateBloom(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int = 3, maxContamination: Double = 0.2,
      numBits: Int = 1 << 22, k: Int = 3): DataFrame = {
    val bits = evalBloom(eval, textCol, n, numBits, k)
    val suspects =
      bloomSuspects(train, bits, textCol, n, maxContamination, numBits, k)
    val flagged = contamination(suspects, eval, idCol, textCol, n)
      .filter(col("contamination") >= maxContamination)
      .select(col("doc_id").as(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }

  // ---------------------------------------------------------------------
  // Domain mixing
  // ---------------------------------------------------------------------

  /** Per-domain sampling rates that realize a target corpus composition.
    * Given target fractions per `sourceCol` value (must sum to ≤ 1 over
    * the domains present), the achievable output size is bounded by the
    * scarcest domain: totalOut = min over domains of n_s / w_s, and each
    * domain samples at rate_s = totalOut · w_s / n_s (≤ 1 by
    * construction, no upsampling). Returns one row per target domain:
    * (source, n_rows, target_frac, rate, expected_rows).
    *
    * One aggregation to domain grain (thousands of rows at most), then
    * pure scalar math against a 1-row broadcast — the corpus is scanned
    * once regardless of domain count. */
  def mixingWeights(
      df: DataFrame, sourceCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0))
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targets.toSeq.sortBy(_._1).toDF("source", "target_frac")
    val counts = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_rows"))
      .join(broadcast(tgt), "source")
    val totalOut = counts
      .agg(min(col("n_rows").cast(DoubleType) / col("target_frac")).as("total_out"))
    counts.crossJoin(broadcast(totalOut))
      .select(col("source"), col("n_rows"), col("target_frac"),
        least(lit(1.0), col("total_out") * col("target_frac") /
          col("n_rows").cast(DoubleType)).as("rate"),
        floor(col("total_out") * col("target_frac")).cast(LongType)
          .as("expected_rows"))
  }

  /** Temperature-based domain mixing (α-sampling, the multilingual
    * training standard): sampled share q_s ∝ p_s^α where p_s is the
    * observed domain share — α < 1 upweights scarce domains without the
    * hand-tuned targets [[mixingWeights]] needs. One aggregation to
    * domain grain, pure scalar math after; the returned q column feeds
    * [[mixingWeights]]/[[sampleToMix]] as the target composition.
    *
    * Determinism: α = 0.5 computes through `sqrt` (correctly rounded
    * per IEEE 754 — `pow(x, 0.5)` is NOT), and the weight normalization
    * sums DECIMAL-cast weights so partial-aggregation order can't
    * perturb the result. */
  def temperatureWeights(
      df: DataFrame, sourceCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    val counts = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_rows"))
    val wRaw =
      if (alpha == 0.5) sqrt(col("n_rows").cast(DoubleType))
      else pow(col("n_rows").cast(DoubleType), lit(alpha))
    val weighted = counts.withColumn("__wd", wRaw.cast(DecimalType(28, 10)))
    val totals = weighted.agg(
      sum(col("n_rows")).as("n_total"),
      sum(col("__wd")).as("w_total"))
    weighted.crossJoin(broadcast(totals))
      .select(col("source"), col("n_rows"),
        (col("n_rows").cast(DoubleType) / col("n_total")).as("p"),
        (col("__wd").cast(DoubleType) / col("w_total").cast(DoubleType))
          .as("q"))
  }

  /** Apply [[mixingWeights]] as a deterministic sample: keep a row iff
    * its salted hash variate falls under the domain's rate. Hash-based
    * (not `sample()`), so the selection is reproducible and
    * append-stable — and salted ("mix"), so it composes with
    * [[withSplit]] without correlation (the sampled survivors still
    * split ~90/5/5, not 100/0/0). */
  def sampleToMix(
      df: DataFrame, idCol: String, sourceCol: String,
      targets: Map[String, Double]): DataFrame = {
    val rates = mixingWeights(df, sourceCol, targets)
      .select(col("source").as("__mix_source"), col("rate").as("__mix_rate"))
    df.join(broadcast(rates), df(sourceCol) === col("__mix_source"))
      .filter(hashUniform(col(idCol), "mix") < col("__mix_rate"))
      .drop("__mix_source", "__mix_rate")
  }

  // ---------------------------------------------------------------------
  // Weighted sampling
  // ---------------------------------------------------------------------

  /** 60-bit uniform variate in (0, 1] from a SALTED md5 of the id.
    * The salt decorrelates operators that would otherwise all read the
    * same md5(id) stream — composing [[sampleToMix]] (keeps low
    * buckets) with [[withSplit]] (assigns low buckets to 'train') on
    * the raw stream would leave val/test empty. 60 bits (vs the 16-bit
    * split bucket) matter for top-k sampling: a 16-bit grid puts ~n/65536
    * rows on the maximal u where weights stop discriminating. */
  def hashUniform(id: Column, salt: String): Column =
    (conv(substring(md5(concat(id.cast(StringType), lit("|" + salt))), 1, 15),
      16, 10).cast(LongType).cast(DoubleType) + lit(1.0)) /
      lit(1152921504606846976.0) // 2^60

  /** Efraimidis–Spirakis (A-ES) sampling key: u^(1/w) with u ∈ (0, 1]
    * from [[hashUniform]] (salt "wsample"). The global top-k rows by
    * this key form a weighted sample WITHOUT replacement — and because u
    * comes from the id hash (not random()), the sample is deterministic
    * and append-stable, like [[withSplit]]. Row-local codegen. */
  def weightedSampleKey(id: Column, weight: Column): Column =
    // weights must be POSITIVE: w <= 0 flips the exponent sign and the
    // key u^(1/w) lands >= 1, outranking every valid row — a negative
    // weight yields NULL key here (never sampled) instead
    when(weight > 0,
      pow(hashUniform(id, "wsample"), lit(1.0) / weight.cast(DoubleType)))
      .otherwise(lit(null).cast(DoubleType))

  /** Deterministic weighted sample of k rows (weights must be > 0; a
    * row's selection odds scale with its weight). Top-k by the A-ES key
    * compiles to TakeOrderedAndProject — a bounded per-partition heap +
    * driver merge, never a global sort, so sampling 1k docs from 100 TB
    * moves k rows per partition and nothing else. */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame =
    df.withColumn("__wkey", weightedSampleKey(col(idCol), col(weightCol)))
      .orderBy(desc("__wkey"), asc(idCol))
      .limit(k)
      .drop("__wkey")

  /** Deterministic stratified sample: up to `perStratum` rows from EACH
    * stratum, chosen by the hashed-id order (salt "strata") — the
    * per-source / per-language quota downsampling every mixing recipe
    * needs (cap the over-represented crawl, keep all of the rare
    * high-quality source). Same append-stability argument as
    * [[withSplit]]: a row's in/out depends only on its id and the ids
    * hashing below it, never on random() or row order.
    *
    * Shape: one shuffle by stratum + a per-stratum bounded rank — the
    * window partitions by stratum, so no global sort. Strata counts are
    * typically few (sources, languages); a single mega-stratum is the
    * W1-dedup shape and AQE handles it the same way. */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      perStratum: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashUniform(col(idCol), "strata").asc, col(idCol).asc)
    df.withColumn("__srank", row_number().over(w))
      .filter(col("__srank") <= perStratum)
      .drop("__srank")
  }

  // ---------------------------------------------------------------------
  // URL / domain blocklist
  // ---------------------------------------------------------------------

  /** True when the text links to any blocklisted domain. The blocklist
    * rides as an array literal (broadcast with the plan, not a join);
    * `array_intersect` over the extracted hosts stays codegen. For
    * blocklists too large for a literal (millions of domains), explode
    * the domains and anti-join against a broadcast blocklist table
    * instead. */
  def hasBlockedDomain(text: Column, blockedDomains: Seq[String]): Column =
    size(array_intersect(TextAnalysis.urlDomains(text),
      typedlit(blockedDomains))) > 0

  /** Drop rows that link to any blocklisted domain. A NULL text links
    * to nothing and is KEPT — the raw predicate is NULL there, and
    * filter would silently drop the row. */
  def blocklistFilter(
      df: DataFrame, textCol: String, blockedDomains: Seq[String]): DataFrame =
    df.filter(!coalesce(
      hasBlockedDomain(col(textCol), blockedDomains), lit(false)))

  /** Canonical URL form for URL-level dedup (the step before content
    * fetch in a crawl pipeline — near-identical URLs fan out crawler
    * budget and duplicate documents downstream): lowercase scheme and
    * host, normalize the empty path to "/", drop the fragment, drop
    * tracking parameters (`utm_*`), and SORT the surviving query
    * parameters so parameter order stops mattering. Pure codegen
    * column expression — row-local at any scale; dedup then becomes
    * one hash-groupBy on the canonical string. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val host = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    val path = regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    // strip the fragment FIRST: a '?' inside the fragment is fragment
    // content, not a query — extracting the query from the raw url
    // would resurrect it ("/page#sec?b=1" has NO query)
    val preFragment = regexp_extract(url, "^([^#]*)", 1)
    val query = regexp_extract(preFragment, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.startsWith("utm_")))
    val q2 = array_join(params, "&")
    concat(scheme, lit("://"), host,
      when(path === "", "/").otherwise(path),
      when(q2 === "", "").otherwise(concat(lit("?"), q2)))
  }

  /** Code-vs-prose signals for code-corpus curation (row-local
    * codegen): symbol density (brace/bracket/operator characters per
    * character), indented-line ratio, and programming-keyword hits in
    * the token stream. `looks_code` fires on symbol-dense text or on
    * keyword-bearing indented text — the cheap first-pass router that
    * decides which pipeline (prose filters vs code filters) a document
    * enters. */
  def codeSignals(text: Column): Column = {
    val n = greatest(length(text), lit(1))
    val symbolRatio =
      (length(text) - length(regexp_replace(text, "[{}()\\[\\];=<>]", "")))
        .cast(DoubleType) / n
    val lines = split(text, "\n")
    val indentRatio = size(filter(lines, l => l.rlike("^[ \\t]{2,}")))
      .cast(DoubleType) / greatest(size(lines), lit(1))
    val kw = Seq("def", "class", "import", "return", "void", "int",
      "const", "function", "var", "public")
    val kwHits = graft.functions.F.countTokensIn(
      TextAnalysis.tokens(TextAnalysis.normalize(text)), kw)
    struct(
      symbolRatio.as("symbol_ratio"),
      indentRatio.as("indent_ratio"),
      kwHits.as("keyword_hits"),
      (symbolRatio > 0.05 || (kwHits >= 2 && indentRatio > 0.3))
        .as("looks_code"))
  }

  // ---------------------------------------------------------------------
  // Gopher-style quality rules
  // ---------------------------------------------------------------------

  /** The document-level quality heuristics from the public Gopher /
    * MassiveText filtering recipe, as row-local codegen expressions.
    * Each rule is exposed as its own boolean so downstream audits can
    * report per-rule rejection rates; `gopherKeep` is their conjunction.
    *
    * Rules (defaults from the paper, tunable): word count in
    * [minWords, maxWords]; mean word length in [3, 10]; symbol-to-word
    * ratio (#, … or ...) below 0.1; ≥ 80% of words contain a letter;
    * ≥ 2 stopword hits in the token stream. */
  def gopherFlags(
      text: Column,
      stopwords: Seq[String] = TextAnalysis.StopwordProfiles.head._2,
      minWords: Int = 50, maxWords: Int = 100000): Seq[(String, Column)] = {
    val norm = TextAnalysis.normalize(text)
    val toks = TextAnalysis.tokens(norm)
    val nWords = size(toks)
    val nw = nWords.cast(DoubleType)
    val meanLen = length(regexp_replace(norm, " ", "")).cast(DoubleType) /
      nullif(nWords, lit(0)).cast(DoubleType)
    val alphaFrac = size(filter(toks, t => t.rlike("[a-z]"))).cast(DoubleType) /
      nullif(nWords, lit(0)).cast(DoubleType)
    val symbolRatio = regexp_count(text, lit("#|\\.\\.\\.|…")).cast(DoubleType) /
      nullif(nWords, lit(0)).cast(DoubleType)
    val stopHits = graft.functions.F.countTokensIn(toks, stopwords)
    Seq(
      "n_words" -> nWords.cast(LongType),
      "ok_word_count" -> nWords.between(minWords, maxWords),
      "ok_mean_word_len" -> (meanLen >= 3.0 && meanLen <= 10.0),
      "ok_symbol_ratio" -> (symbolRatio < 0.1),
      "ok_alpha_words" -> (alphaFrac >= 0.8),
      "ok_stopwords" -> (stopHits >= 2))
  }

  /** Conjunction of every ok_* rule in [[gopherFlags]]. */
  def gopherKeep(
      text: Column,
      stopwords: Seq[String] = TextAnalysis.StopwordProfiles.head._2,
      minWords: Int = 50, maxWords: Int = 100000): Column =
    gopherFlags(text, stopwords, minWords, maxWords)
      .collect { case (n, c) if n.startsWith("ok_") => c }
      .reduce(_ && _)

  // ----------------------------------------------- DSIR target affinity

  /** DSIR-style target-affinity scores (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023 — public):
    * score each document by how much more likely its tokens are under a
    * TARGET subcorpus's hashed-unigram distribution than under the raw
    * corpus distribution, the signal DSIR resamples pretraining data on.
    *
    * Published form is Σ log p_target(f)/p_raw(f) over hashed n-gram
    * features. Cross-engine stand-in per this repo's exact-rational
    * convention: the log is dropped and the per-token likelihood RATIO
    * is averaged — each ratio is ((c_t+1)·(T_r+B)) / ((c_r+1)·(T_t+B))
    * with add-one smoothing over the B buckets, i.e. one IEEE division
    * of two exact integer products, so DuckDB reproduces the double bit
    * for bit (ln() would diverge in the last ulp between engines). The
    * per-token decision boundary is unchanged (ratio > 1 ⇔ log > 0).
    *
    * Scale shape: ONE pass over the token stream collapses to a
    * ≤`buckets`-row census via map-side partial aggregation (conditional
    * count for the target column — no second scan, no self-join); the
    * census cross-joins its own 1-row total and broadcast-joins back
    * onto the token stream; the per-doc mean is one shuffle on the doc
    * id. Nothing corpus-sized touches the driver. Counts are bounded by
    * the corpus token total, so the integer products stay inside Long
    * for corpora under ~10^17 tokens; production DSIR runs in log space
    * and is immune. The token stream is tokenized twice (census +
    * scoring) — at 100 TB persist the exploded stream or accept the
    * second scan; both passes are full-codegen scans. */
  def dsirTargetAffinity(
      df: DataFrame, idCol: String, textCol: String, targetFilter: Column,
      buckets: Int = 256): DataFrame =
    dsirScoreWithCensus(df, idCol, textCol,
      dsirCensus(df, textCol, targetFilter, buckets), buckets)

  /** Moore–Lewis contrastive data selection (Moore & Lewis 2010,
    * "Intelligent Selection of Language Model Training Data" — public):
    * rank a candidate pool by the DIFFERENCE between an IN-DOMAIN LM's
    * score and a GENERAL-corpus LM's score, so documents that look like
    * the target domain — rather than documents that are merely fluent —
    * float to the top. The textbook form differences cross-entropies;
    * this differences [[TextAnalysis.knFluency]]'s exact-rational KN
    * mean probabilities (same decision direction, and a log-prob would
    * not hash-match cross-engine — the house discipline). Two model
    * trainings (one bigram census each), two scoring passes over the
    * pool (vocab-grain joins), one doc-grain join of the two score
    * tables. Select the pool's top fraction by `ml_score` descending. */
  def mooreLewisScores(
      inDomain: DataFrame, general: DataFrame, pool: DataFrame,
      idCol: String, textCol: String, discount: Double = 0.75): DataFrame = {
    val inS = TextAnalysis.knFluency(inDomain, pool, idCol, textCol, discount)
      .select(col(idCol), col("n_bigrams"), col("kn_score").as("in_score"))
    val genS = TextAnalysis.knFluency(general, pool, idCol, textCol, discount)
      .select(col(idCol), col("kn_score").as("gen_score"))
    inS.join(genS, idCol)
      .select(col(idCol), col("n_bigrams"), col("in_score"),
        col("gen_score"),
        (col("in_score") - col("gen_score")).as("ml_score"))
  }

  /** The DSIR hashed-unigram census: ≤`buckets` rows of (bucket,
    * raw count, target count), ONE pass with a conditional count. The
    * census is ADDITIVE — counts sum — so an ingest pipeline maintains
    * it per batch and [[dsirCensusMerge]] folds batch censuses into the
    * corpus census without ever re-tokenizing history; the additivity
    * is oracle-gated (`l_dsir_incremental` scores through a merged
    * split-census and must exact-match the whole-corpus scores). */
  def dsirCensus(
      df: DataFrame, textCol: String, targetFilter: Column,
      buckets: Int = 256): DataFrame =
    df.select(targetFilter.as("__is_target"),
        explode(TextAnalysis.tokens(TextAnalysis.normalize(col(textCol))))
          .as("__tok"))
      // split-of-empty's [""] artifact: an empty doc must contribute
      // NOTHING, not a count in md5("")'s bucket (the trap
      // linearTextScore's guard documents)
      .filter(length(col("__tok")) > 0)
      .withColumn("__b", pmod(hashBucket(col("__tok")), lit(buckets)))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("c_r"),
        count(when(col("__is_target"), lit(1))).as("c_t"))

  /** Fold any number of [[dsirCensus]] frames into one (counts sum;
    * buckets absent from a part contribute zero). */
  def dsirCensusMerge(censuses: Seq[DataFrame]): DataFrame =
    censuses.reduce(_ unionByName _)
      .groupBy(col("__b"))
      .agg(sum(col("c_r")).cast(LongType).as("c_r"),
        sum(col("c_t")).cast(LongType).as("c_t"))

  /** Score documents against a prebuilt census (see
    * [[dsirTargetAffinity]] for the semantics and exact-rational
    * smoothing). */
  def dsirScoreWithCensus(
      df: DataFrame, idCol: String, textCol: String, census: DataFrame,
      buckets: Int = 256): DataFrame = {
    val totals = census.agg(
      sum(col("c_r")).cast(LongType).as("t_r"),
      sum(col("c_t")).cast(LongType).as("t_t"))
    val B = buckets.toLong
    val ratios = census.crossJoin(broadcast(totals))
      .select(col("__b"),
        (((col("c_t") + 1L) * (col("t_r") + B)).cast(DoubleType) /
          ((col("c_r") + 1L) * (col("t_t") + B)).cast(DoubleType))
          .as("__ratio"))
    df.select(col(idCol),
        explode(TextAnalysis.tokens(TextAnalysis.normalize(col(textCol))))
          .as("__tok"))
      // same empty-token guard as the census side: a token-less doc
      // scores as ABSENT (no rows), never from md5("")'s noise bucket
      .filter(length(col("__tok")) > 0)
      .withColumn("__b", pmod(hashBucket(col("__tok")), lit(buckets)))
      // LEFT: a bucket the census never saw (scoring NEW docs against a
      // historical census) takes the add-one default (c_t=c_r=0), the
      // same smoothing rule as seen buckets — an inner join would
      // silently drop those tokens from the mean
      .join(broadcast(ratios), Seq("__b"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__ratio", coalesce(col("__ratio"),
        (col("t_r") + B).cast(DoubleType) /
          (col("t_t") + B).cast(DoubleType)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        // Decimal(38,12) leaves 26 integral digits: a per-token ratio is
        // bounded by (t_r + B) ≈ corpus token count, so even a 10^15-token
        // corpus summed over 10^9 tokens stays within range — the earlier
        // (18,12) accumulator overflowed to NULL at ratio ≥ 10^6 (a tiny
        // target subcorpus) and silently skipped those tokens from the sum
        (sum(col("__ratio").cast(DecimalType(38, 12))).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("target_affinity"))
      .withColumn("keep", col("target_affinity") > 1.0)
  }

  // ------------------------------------------------ domain rebalancing

  /** Domain-rebalance plan (the published Pile / Gopher / LLaMA mixture
    * tables): per-domain token counts → the sampling rate and epoch
    * count that flatten the mixture to an equal per-domain share of a
    * `1/budgetDenom` token budget. Domains above their share downsample
    * (`sample_rate < 1`); domains below it repeat for `epochs` passes,
    * capped at `maxEpochs` (the published guardrail against overfitting
    * tiny domains).
    *
    * Exactness: the per-domain target is integer division of exact
    * BIGINTs, and rate/epochs are each ONE IEEE division of exact
    * integers, so the doubles reproduce cross-engine. Scale shape: one
    * map-side-partial groupBy to |domains| rows, then a broadcast of the
    * 1-row total — the plan any mixture table needs at 100 TB. */
  def domainBalance(
      df: DataFrame, domainCol: String, textCol: String,
      budgetDenom: Long = 2L, maxEpochs: Double = 4.0): DataFrame = {
    require(budgetDenom > 0 && maxEpochs > 0,
      s"budgetDenom/maxEpochs must be positive: $budgetDenom/$maxEpochs")
    val perDomain = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast(LongType))
          .cast(LongType).as("n_tokens"))
    val totals = perDomain.agg(
      sum(col("n_tokens")).cast(LongType).as("t_total"),
      count(lit(1)).as("n_domains"))
    perDomain.crossJoin(broadcast(totals))
      .withColumn("target_tokens",
        expr(s"t_total div ($budgetDenom * n_domains)"))
      .withColumn("sample_rate",
        least(lit(1.0), col("target_tokens").cast(DoubleType) /
          col("n_tokens").cast(DoubleType)))
      .withColumn("epochs",
        least(lit(maxEpochs), col("target_tokens").cast(DoubleType) /
          col("n_tokens").cast(DoubleType)))
      .select(col(domainCol), col("n_docs"), col("n_tokens"),
        col("target_tokens"), col("sample_rate"), col("epochs"))
  }

  /** EXECUTE a [[domainBalance]] plan: emit the rebalanced corpus with
    * an `epoch` column — over-represented domains downsample (keep a
    * doc iff its salted id-hash lands under the rate), under-represented
    * domains repeat for ⌊epochs⌋ full passes plus a deterministically
    * chosen extra-copy subset for the fractional pass. Selection depends
    * only on the doc id (salt "resample"), so the materialized mixture
    * is reproducible and append-stable like every sampler here — and an
    * independent engine recomputes it bit for bit, which is what lets
    * the gate exact-match the achieved counts instead of asserting a
    * noise tolerance.
    *
    * Scale shape: the plan is a |domains|-row broadcast; keep/copy is
    * row-local codegen; the only row expansion is `explode(sequence)`
    * bounded by `maxEpochs`. The corpus scans twice (plan + execute) —
    * the unavoidable two passes of any plan-then-apply rebalance. */
  def resampleToBalance(
      df: DataFrame, idCol: String, domainCol: String, textCol: String,
      budgetDenom: Long = 2L, maxEpochs: Double = 4.0): DataFrame = {
    val plan = domainBalance(df, domainCol, textCol, budgetDenom, maxEpochs)
      .select(col(domainCol), col("epochs"))
    df.join(broadcast(plan), Seq(domainCol))
      .withColumn("__copies",
        floor(col("epochs")).cast(IntegerType) +
          when(hashUniform(col(idCol), "resample") <=
            col("epochs") - floor(col("epochs")), 1).otherwise(0))
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("__copies"))))
      .drop("__copies", "epochs")
  }

  /** Epoch plan for a PUBLISHED mixture (the LLaMA/Pile-style table:
    * weight column + epochs column) under an explicit global token
    * budget: per domain, the budget share `budget × frac`, the
    * downsample rate for over-represented domains, and the repeat count
    * (capped at `maxEpochs`) for under-represented ones.
    * [[domainBalance]] is the equal-share special case; this takes the
    * arbitrary target fractions [[mixingWeights]] understands and adds
    * the repeat dimension mixingWeights lacks (it can only downsample).
    *
    * Fractions normalize to sum 1 driver-side (exact rational-free
    * arithmetic avoided by dividing each by the sum once — the same
    * doubles both engines then see as literals). rate/epochs are ONE
    * IEEE division of exact integers each, so the plan reproduces
    * cross-engine. Scale shape: one map-side-partial groupBy to
    * |domains| rows joined to a broadcast targets table.
    *
    * Scope is the INTERSECTION of `targets` and the corpus: corpus
    * domains not in `targets` get no plan row (they have no budget
    * share by definition), and a target domain with no corpus rows
    * yields no row either — its budget share is unplannable, so
    * Σ planned_tokens < budget signals the gap. Callers wanting a hard
    * failure on absent target domains should compare the plan's row
    * count against `targets.size`. */
  def epochPlan(
      df: DataFrame, domainCol: String, textCol: String,
      targets: Map[String, Double], budgetTokens: Long,
      maxEpochs: Double = 4.0): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      s"positive target fractions required: $targets")
    require(budgetTokens > 0 && maxEpochs > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val fracSum = targets.values.sum
    val tgt = targets.toSeq.sortBy(_._1)
      .map { case (dom, f) => (dom, f / fracSum) }
      .toDF(domainCol, "target_frac")
    df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast(LongType))
          .cast(LongType).as("n_tokens"))
      .join(broadcast(tgt), domainCol)
      .withColumn("target_tokens",
        floor(lit(budgetTokens).cast(DoubleType) * col("target_frac"))
          .cast(LongType))
      .withColumn("sample_rate",
        least(lit(1.0), col("target_tokens").cast(DoubleType) /
          col("n_tokens").cast(DoubleType)))
      .withColumn("epochs",
        least(lit(maxEpochs), col("target_tokens").cast(DoubleType) /
          col("n_tokens").cast(DoubleType)))
      .withColumn("planned_tokens",
        least(col("target_tokens").cast(DoubleType),
          col("n_tokens").cast(DoubleType) * lit(maxEpochs))
          .cast(LongType))
      .select(col(domainCol), col("n_docs"), col("n_tokens"),
        col("target_frac"), col("target_tokens"), col("sample_rate"),
        col("epochs"), col("planned_tokens"))
  }

  // ------------------------------------------------ corpus snapshot diff

  /** Content diff between two corpus snapshots (what changed between
    * crawls / releases): FULL OUTER join on the id comparing content
    * hashes — `added` (new only), `removed` (old only), `changed`
    * (both, different content), `unchanged`.
    *
    * Scale shape: the md5 is computed map-side, so the shuffle carries
    * (id, 32-char hash) per side — O(ids), never O(corpus bytes) — and
    * the join is a plain high-cardinality equi-join. This is the primer
    * for incremental reprocessing: downstream per-doc operators re-run
    * on `added ∪ changed` only. */
  def corpusDiff(
      oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // NULL text hashes as '' — md5(NULL) is NULL, which would make the
    // presence test read a present-but-NULL doc as absent ('added' /
    // 'removed'); NULL and empty text compare as the same content,
    // which is the right diff semantic for both. Ids must be unique per
    // snapshot (the usual corpus invariant — enforce upstream with
    // exactDuplicateGroups/keepFirst if in doubt).
    val o = oldDf.select(col(idCol),
      md5(coalesce(col(textCol), lit(""))).as("old_md5"))
    val n = newDf.select(col(idCol),
      md5(coalesce(col(textCol), lit(""))).as("new_md5"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_md5").isNull, "added")
          .when(col("new_md5").isNull, "removed")
          .when(col("old_md5") === col("new_md5"), "unchanged")
          .otherwise("changed"))
  }
}
