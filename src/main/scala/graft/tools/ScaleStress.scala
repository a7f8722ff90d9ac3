package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Corpus

/** Scale-stress harness: measured evidence that the gate operators'
  * plans survive a 100× data blow-up with injected skew — the claim
  * COVERAGE.md makes from plan shapes, converted into wall-clock data.
  *
  * What it does:
  *   1. REPLICATE the sf tables ×N into a scratch dir, remapping the
  *      fact keys per replica (new orders/rounds/users/docs — so
  *      CARDINALITIES scale, not just row copies) while dimension
  *      tables stay fixed, exactly how a lake grows.
  *   2. INJECT SKEW: ~30% of lineitem rows are forced onto one hot
  *      course (l_returnflag='R'), and ~30% of documents share one hot
  *      boilerplate phrase (the posting-list poison that df-caps exist
  *      for). Both knobs are off for plain scaling runs (`--no-skew`),
  *      which is also how the harness synthesizes an sf1-equivalent
  *      dataset (factor 10, no skew) for dual-scale benching.
  *   3. TIME the most expensive gate operators at 1× (median of 3) and
  *      at N× (single run — the run IS minutes long), compute the
  *      per-query slope tN / (t1 · N), and check skew-path engagement:
  *      the salted join must plan its __salt scatter, and a deliberately
  *      hot unsalted sort-merge join must trigger AQE's skew split
  *      (`skew=true` in the adaptive plan).
  *   4. WRITE scale_report.json (machine) — SCALE.md is derived from it.
  *
  * Run: `sbt "runMain graft.tools.ScaleStress 100 /root/testdata/sf0.1
  * /tmp/graft_stress/x100"` with SPARK_DRIVER_MEM=48g.
  */
object ScaleStress {

  /** The 10 most expensive gate operators (round-3 bench ranking), plus
    * the simhash128 scale path the stress campaign motivated. */
  val StressQueries: Seq[String] = Seq(
    "gm_coverage_audit", "l_simhash_near_dups", "l_simhash128_near_dups",
    "l_minhash_near_dups", "l_substring_runs", "l_winnow_overlap",
    "a14_mega_rollup", "gm_dim_round", "j10_salted_skew_join",
    "w7_sessionize", "l_seq_packing", "l_neardup_auto",
    // hot-boilerplate stress hits these directly: the planted phrase
    // makes its bigrams mega-hot census keys (fluency) and inflates
    // LSH candidate fan-out (incremental probe)
    "l_bigram_lm_score", "l_neardup_incremental", "l_shard_shuffle",
    // round-6 continuation: the new curation ops — the hot phrase makes
    // its hashed unigrams mega-hot census buckets (DSIR), stresses the
    // fluency census under ccnet's sample-cutoff path, and blows up the
    // leakage audit's LSH candidate fan-out
    "l_dsir_weights", "l_ccnet_buckets", "l_split_leakage",
    "l_domain_balance", "l_pipeline_funnel",
    // corpus-close additions: the incremental census (must ride
    // l_dsir_weights' plan), the bracket-bounded exact quantiles, and
    // the tfidf vocab-broadcast fix under the hot-token replica
    "l_dsir_incremental", "a25_quantile_2pass", "l_tfidf_topk",
    // round-6 post-close gates that shipped without a measured row,
    // plus round-7 additions: the graph-ANN probe, the incremental
    // restat (full-vs-incremental contrast is the claim under test),
    // the eval×train leak stream under the hot boilerplate phrase, and
    // the dashboard LAG-window rollup
    "l_threshold_sweep", "l_dedup_cluster_stats", "l_eval_leak_report",
    "l_dataset_card", "l_hnsw_topk", "m15_stats_skipping", "st_leak",
    "d8_round_progression_summary", "d16_pace_by_hole",
    "d15_global_pace_comparison",
    // round-7 additions: the boilerplate rewrite is the natural victim
    // of the hot planted line (its fingerprint shuffle and anti-join
    // both see a mega-hot key), the snapshot diff rides a narrow
    // (id, md5) shuffle, and the two new dashboard gates exercise the
    // two-level timestamp agg and the fatigue rollup under skew
    "l_boilerplate_strip", "l_corpus_diff", "l_fertility",
    "d19_hole_durations", "d20_nine_loop_pace",
    // round-9 additions: the embedding-graph gates — the auto-k cell
    // assignment must keep the within-cell candidate join linear as the
    // vector corpus scales (k ∝ n), and the pagerank chain's structural
    // caches must hold at a ×100 edge list
    "l_knn_density_prune", "l_knn_pagerank",
    // r10: convergence-mode PageRank — the per-block checkpoint + L1
    // probe must stay node-grain while iterations run to the tolerance —
    // and the k-core peel, whose per-round census + semi-join filters
    // must stay edge-grain while the round count is data-dependent
    "l_pagerank_converged", "l_kcore_prune",
    // star-contraction CC: replicas are disjoint 1e6-stride id blocks,
    // so ×100 holds diameter (~714) while multiplying component count
    // and edge volume ×100 — the slope measures edge-grain scaling at
    // fixed round count (diameter growth is GraphSpec's axis)
    "l_cc_deep_chain",
    // JL projection: map-only by claim — the slope IS the plan assertion
    "l_random_projection",
    // PCA: the dim²-key moment pass is the claim under test — generator
    // fan-out is n·dim² rows but the shuffle stays 2080 keys; the
    // driver eigen is O(dim³), scale-invariant
    "l_pca_variance",
    // round-7 corpus close: the dashboard tail's heavy hitters under
    // the hot course (the 16-metric conditional-agg composite, the
    // round-grain validation ladder, the full round listing — output-
    // bound by contract — and the ranking rollup), plus the unigram
    // tokenizer encode (corpus-grain Viterbi DP — embarrassingly
    // parallel, the claim under test)
    "d25_data_quality_score", "d41_round_validation", "d38_round_list",
    "d43_global_data_quality_ranking", "l_unigram_encode",
    // round-7 continuation: the WordPiece greedy encode (corpus-grain
    // max-munch, memoized per task like the other tokenizer encoders),
    // and the shard-merge census path (the hot boilerplate phrase makes
    // its words mega-hot census keys in every shard — the merge must
    // stay vocab-grain under that skew)
    "l_wordpiece_encode", "l_census_incremental",
    // round-7 continuation: the hot boilerplate phrase is the direct
    // adversary of all three — its words are mega-hot posting lists
    // (BM25's dfCap territory), mega-hot bigram census keys (KN's
    // discount path), and a mega-hot (bucket, word) census key (the
    // growth curve's one shuffle)
    "l_bm25_topk", "l_kneser_ney", "l_vocab_growth",
    // the hot phrase's tokens have corpus-sized posting lists — the
    // phrase gate's point-lookup claim under maximal posting skew — and
    // Moore–Lewis doubles the KN pipeline under the same hot bigrams
    "l_phrase_search", "l_moore_lewis",
    // hybrid = BM25 recall + cosine re-rank + RRF: the recall stage
    // inherits the hot-posting stress; the re-rank must stay bounded by
    // queries × recallN whatever the corpus does
    "l_hybrid_topk",
    // the hot phrase's words are mega-hot PER-SOURCE census keys (the
    // grouped sketch must absorb them map-side); CMS partials stay
    // KB-sized whatever the stream does; drift and the metrics harness
    // are one-pass corpus reductions
    "l_heavy_hitters_by_domain", "l_cms_counts", "l_embedding_drift",
    "l_retrieval_metrics",
    // triples ride the BM25 recall under hot postings; NEAR reads the
    // hot phrase's corpus-sized positional lists through its join chain
    "l_training_triples", "l_proximity_search",
    // classifier TRAINING under skew: the hot phrase makes a few
    // feature buckets mega-hot; both per-epoch aggregates must combine
    // them map-side
    "l_perceptron",
    // pairing and budget selection are bounded-aggregate designs: two
    // heaps per group, two driver-sized histograms — the claim is that
    // NOTHING grows with the corpus except the one scan
    "l_preference_pairs", "l_budget_select")

  /** Hot boilerplate phrase planted into ~30% of documents. */
  val HotPhrase =
    " click here to subscribe to our newsletter and follow us on social media today"

  /** Replicate the sf tables ×`factor` into `outDir`. Fact keys shift by
    * a per-replica stride so every replica contributes NEW orders /
    * rounds / users / docs; dims copy through unchanged. Idempotent via
    * a _READY marker. */
  def replicate(spark: SparkSession, sfDir: String, outDir: String,
      factor: Int, skew: Boolean): Unit = {
    val ready = Paths.get(outDir, "_READY")
    if (Files.exists(ready)) return
    Files.createDirectories(Paths.get(outDir))
    def reps(df: DataFrame): DataFrame =
      df.withColumn("__rep", explode(sequence(lit(0), lit(factor - 1))))
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    // Tables.load, not raw parquet: the source testdata stores
    // TIMESTAMP(NANOS) which the plain reader rejects; the replicated
    // output lands as normal micros timestamps (load is conditional, so
    // gates re-loading the stress dir pass through unchanged)
    def src(name: String): DataFrame = graft.core.Tables.load(spark, sfDir, name)

    // dims: copy through (a bigger lake has the same nations/parts)
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(n => write(src(n), n))

    val orderStride = 10000000L
    write(reps(src("orders"))
      .withColumn("o_orderkey", col("o_orderkey") + col("__rep") * orderStride)
      .drop("__rep"), "orders")

    val li0 = reps(src("lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("__rep") * orderStride)
    val li1 =
      if (!skew) li0
      // hot course: ~30% of ALL rows forced onto 'R' (on top of its
      // natural share) — deterministic row pick, not rand()
      else li0.withColumn("l_returnflag",
        when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(10)) < 3,
          lit("R")).otherwise(col("l_returnflag")))
    write(li1.drop("__rep"), "lineitem")

    write(reps(src("events"))
      .withColumn("event_id", col("event_id") + col("__rep") * 100000000L)
      .withColumn("user_id", col("user_id") + col("__rep") * 1000000L)
      .drop("__rep"), "events")

    // doc_id stride is a multiple of 20000 so gates that slice by
    // doc_id % 20000 keep their per-replica semantics; it is the SHARED
    // Tables.ReplicaStride constant so gates that pin fixed artifacts to
    // the base id block (l_eval_leak_report's eval set) stay in lockstep
    val docs0 = reps(src("documents"))
      .withColumn("doc_id",
        col("doc_id") + col("__rep") * graft.core.Tables.ReplicaStride)
      // per-replica token: replicas are near-dup families, not exact
      // clones of one giant duplicate class
      .withColumn("text", concat(col("text"), lit(" r"), col("__rep")))
    val docs1 =
      if (!skew) docs0
      else docs0.withColumn("text",
        when(pmod(col("doc_id"), lit(10)) < 3,
          concat(col("text"), lit(HotPhrase))).otherwise(col("text")))
    write(docs1.drop("__rep"), "documents")

    // replicas are NEW vectors, not verbatim clones: a deterministic
    // ±0.5-magnitude jitter per (replica, id, dim) pushes each replica
    // far outside any near-dup threshold. Verbatim copies would grow
    // duplicate FAMILIES instead of the corpus — every LSH/cluster
    // bucket then holds f exact clones and pair counts scale f², which
    // benchmarks the degenerate input, not the plan. (Exact-duplicate
    // masses are exact-dedup's job, upstream of any ANN pass.)
    write(reps(src("embeddings"))
      .withColumn("vec_id", col("vec_id") + col("__rep") * 1000000L)
      .withColumn("embedding",
        when(col("__rep") === 0, col("embedding"))
          .otherwise(transform(col("embedding"), (x, i) =>
            (x + sin(col("vec_id").cast("double") * 0.73 +
              i.cast("double") * 1.37) * 0.5).cast("float"))))
      .drop("__rep"), "embeddings")

    Files.write(ready, s"factor=$factor skew=$skew".getBytes)
    ()
  }

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def runQuery(spark: SparkSession, name: String, dir: String): Double =
    time {
      Corpus.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }

  /** Evidence that AQE's skew-join split engages in this engine config:
    * a deliberately hot sort-merge join (broadcast suppressed) must plan
    * at least one `skew=true` reader. The key distribution is one hot
    * key carrying ~30% of rows against a 100k-key long tail — AQE's
    * split rule is `partition > max(threshold, factor × median)`, so the
    * hot partition must dwarf the MEDIAN, not just be big (a 3-key
    * course column never triggers it: every partition is fat, median
    * included). */
  def aqeSkewEngages(spark: SparkSession, stressDir: String,
      skewThreshold: String = "16MB", advisorySize: String = "8MB"): Boolean = {
    // thresholds sized to the data under test (shuffle bytes are
    // compressed; the hot partition is tens of MB on the wire at ×100,
    // tens of KB in the CI replica) — what's under test is the split
    // MECHANISM, the byte thresholds are deployment config
    val tuned = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> skewThreshold,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> advisorySize,
      // enough partitions that the long-tail keys spread thin and the
      // hot partition dwarfs the MEDIAN (with very few partitions every
      // partition carries a fat tail slice and the ratio never trips)
      "spark.sql.shuffle.partitions" -> "32")
    val saved = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val hot = pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(10)) < 3
      // the payload must SURVIVE column pruning into the aggregate and
      // be incompressible (high-entropy hash): a pruned or constant-key
      // shuffle partition compresses to almost nothing, and AQE's
      // byte-based skew detection then literally cannot see a 30%-hot
      // partition (measured here — quantity payloads hid the skew)
      // repartition(16): AQE splits a skewed partition at MAPPER
      // boundaries — a small replica landing in one parquet file is one
      // mapper, and a one-mapper partition is unsplittable however hot
      val li = spark.read.parquet(s"$stressDir/lineitem.parquet")
        .select(when(hot, 0L).otherwise(pmod(xxhash64(col("l_orderkey")), lit(100000L)))
          .as("k"), xxhash64(col("l_orderkey"), col("l_linenumber"), lit(7)).as("v"))
        .repartition(16)
      val dim = spark.range(0, 100000).select(col("id").as("k"),
        (col("id") % 7).as("tag"))
      val joined = li.join(dim, "k")
        // max, not sum: summing random 64-bit hashes overflows under ANSI
        .groupBy(col("tag")).agg(count(lit(1)).as("n"), max(col("v")).as("mv"))
      // collect(), not a write: a write action plans through its OWN
      // QueryExecution, leaving joined.queryExecution un-executed (its
      // adaptive plan never finalizes, so no skew markers appear).
      // The aggregate output is 7 rows — collect is free.
      joined.collect()
      joined.queryExecution.executedPlan.toString.contains("skew=true")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** The salted-join gate must actually plan its salt scatter. */
  def saltEngages(spark: SparkSession, dir: String): Boolean =
    Corpus.queries("j10_salted_skew_join")(spark, dir)
      .queryExecution.optimizedPlan.toString.contains("__salt")

  final case class Row1(name: String, t1: Double, tN: Double, slope: Double)

  /** Streaming at scale: replay the ×N events table as date-bucketed,
    * TIME-ORDERED micro-batches through (a) the native session-window
    * stream and (b) the versioned-table refresh sink (IncrementalTable
    * manifest commits), recording per-batch latency and state-store
    * growth from the progress API. Answers the two questions a
    * 1000-executor deploy asks of the streaming path: does session
    * state stay bounded by the watermark (not by stream length), and
    * does per-batch commit latency stay flat as the manifest grows?
    * Slicing is by whole DATES so every micro-batch carries complete
    * date partitions — the refresh sink's documented contract. */
  def streamingStress(
      spark: SparkSession, stressDir: String, batches: Int = 20): String = {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    import graft.streaming.{ContinuousRefresh, StreamingTelemetry}

    val base = Paths.get("/tmp/graft_stress_streaming")
    graft.tables.FsUtil.deleteRec(base)
    val land = base.resolve("land")
    Files.createDirectories(land)

    val ev = graft.core.Tables.load(spark, stressDir, "events")
    val fixes = ev.select(
      col("user_id").cast("string").as("roundId"),
      lit("c1").as("courseId"),
      col("ts").as("fixTimestamp"),
      // replica-strided event ids exceed Int range — fold, don't cast
      pmod(col("event_id"), lit(1000000000L)).cast("int").as("locationIndex"),
      lit(1).as("holeNumber"),
      col("value").as("pace"),
      lit(false).as("isCache"))
    val bounds = fixes.agg(
      min(to_date(col("fixTimestamp"))).as("d0"),
      max(to_date(col("fixTimestamp"))).as("d1"),
      max(col("fixTimestamp")).as("tmax"),
      count(lit(1)).as("n")).collect()(0)
    val d0 = bounds.getDate(0)
    val days = java.time.temporal.ChronoUnit.DAYS.between(
      d0.toLocalDate, bounds.getDate(1).toLocalDate) + 1
    val maxTsMs = bounds.getTimestamp(2).getTime
    val nEvents = bounds.getLong(3)

    // one json file per time slice, mtime-ordered → maxFilesPerTrigger=1
    // replays them as an ordered stream of micro-batches
    fixes
      .withColumn("__b", expr(
        s"width_bucket(datediff(to_date(fixTimestamp), DATE '$d0'), 0, $days, $batches)"))
      .repartition(batches, col("__b"))
      .write.mode("overwrite").partitionBy("__b")
      .option("timestampFormat", StreamingTelemetry.FixTimestampFormat)
      .json(base.resolve("slices").toString)
    val t0 = System.currentTimeMillis()
    (1 to batches).foreach { b =>
      val dir = base.resolve("slices").resolve(s"__b=$b")
      if (Files.isDirectory(dir)) {
        graft.tables.FsUtil.listDir(dir)
          .filter(_.toString.endsWith(".json")).sortBy(_.toString)
          .zipWithIndex.foreach { case (p, i) =>
            val tgt = land.resolve(f"b$b%04d-$i%03d.json")
            Files.move(p, tgt)
            Files.setLastModifiedTime(tgt, FileTime.fromMillis(t0 + b * 1000L)); ()
          }
      }
    }
    // two flush slices drag the watermark past every real session end so
    // AvailableNow drains the session state (st_sessionize's trick)
    val sp = spark; import sp.implicits._
    (1 to 2).foreach { f =>
      val tmp = base.resolve(s"flush$f")
      Seq((s"__flush${f}__", "c1",
          new java.sql.Timestamp(maxTsMs + f * 86400000L), 0, 1, 0.0, false))
        .toDF("roundId", "courseId", "fixTimestamp", "locationIndex",
          "holeNumber", "pace", "isCache")
        .coalesce(1).write.mode("overwrite")
        .option("timestampFormat", StreamingTelemetry.FixTimestampFormat)
        .json(tmp.toString)
      val part = graft.tables.FsUtil.listDir(tmp)
        .find(_.toString.endsWith(".json")).get
      val tgt = land.resolve(s"zflush$f.json")
      Files.move(part, tgt)
      Files.setLastModifiedTime(tgt,
        FileTime.fromMillis(t0 + (batches + f) * 1000L)); ()
    }

    def latencies(ps: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress])
        : Seq[Double] =
      ps.map(p => Option(p.durationMs.get("triggerExecution"))
        .map(_.toLong / 1000.0).getOrElse(0.0))
    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    // (a) native session windows with merging session state
    val q1 = StreamingTelemetry.sessionizedPace(
        StreamingTelemetry.readFixStream(spark, land.toString, Some(1)),
        watermark = "10 minutes", gap = "30 minutes")
      .writeStream.format("parquet")
      .option("path", base.resolve("sess_sink").toString)
      .option("checkpointLocation", base.resolve("sess_ckpt").toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q1.awaitTermination()
    val p1 = q1.recentProgress.toSeq
    val sessLat = latencies(p1)
    val stateRows = p1.flatMap(_.stateOperators.headOption.map(_.numRowsTotal))
    val stateMem = p1.flatMap(_.stateOperators.headOption.map(_.memoryUsedBytes))
    val sessions = spark.read.parquet(base.resolve("sess_sink").toString)
      .filter(!col("roundId").startsWith("__flush")).count()

    // (b) versioned-table refresh sink: one manifest commit per batch
    val tablePath = base.resolve("vtable").toString
    val q2 = ContinuousRefresh.startVersioned(
      StreamingTelemetry.readFixStream(spark, land.toString, Some(1))
        .withColumn("fix_date", to_date(col("fixTimestamp"))),
      tablePath, Seq("fix_date"),
      base.resolve("vt_ckpt").toString,
      Some(Trigger.AvailableNow()))
    q2.awaitTermination()
    val p2 = q2.recentProgress.toSeq
    val refLat = latencies(p2)
    val versions = graft.tables.IncrementalTable.versions(tablePath)
    val live = graft.tables.IncrementalTable.read(spark, tablePath)
    val liveFiles = live.inputFiles.length
    val liveRows = live.filter(!col("roundId").startsWith("__flush")).count()

    val report =
      s"""{"events":$nEvents,"batches":$batches,
         |"sessionize":{"triggers":${p1.size},
         |"latency_sec":[${sessLat.map(num).mkString(",")}],
         |"state_rows":[${stateRows.mkString(",")}],
         |"state_mem_max_bytes":${if (stateMem.isEmpty) 0 else stateMem.max},
         |"state_rows_max":${if (stateRows.isEmpty) 0L else stateRows.max},
         |"sessions_out":$sessions},
         |"versioned_refresh":{"triggers":${p2.size},
         |"latency_sec":[${refLat.map(num).mkString(",")}],
         |"versions":${versions.size},"live_files":$liveFiles,
         |"rows":$liveRows}}""".stripMargin.replace("\n", "")
    Files.writeString(Paths.get("scale_report_streaming.json"), report)
    report
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(2).getOrElse(s"/tmp/graft_stress/x$factor")
    val skew = !args.contains("--no-skew")
    // optional query subset (positions 3+, ignoring flags) so a long
    // stress campaign can run in resumable chunks; each chunk appends to
    // scale_report_parts.jsonl
    val subset = args.drop(3).filterNot(_.startsWith("--")).toSet
    val queries =
      if (subset.isEmpty) StressQueries else StressQueries.filter(subset)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-stress")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.local.dir", "/tmp/graft_stress_spill")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(s"[stress] replicating $sfDir x$factor (skew=$skew) -> $outDir")
    val tRep = time(replicate(spark, sfDir, outDir, factor, skew))
    println(f"[stress] replication done in $tRep%.1f s")

    if (args.contains("--streaming")) {
      println("[stress] streaming stress over " + outDir)
      println(streamingStress(spark, outDir))
      spark.stop()
      return
    }

    // session warm-up, then 1x baselines (median of 3 — these are fast)
    spark.range(0, 1000000).selectExpr("sum(id * 2)")
      .write.mode("overwrite").format("noop").save()
    def median3(body: => Double): Double = {
      val ts = (1 to 3).map(_ => body)
      ts.sorted.apply(1)
    }
    val rows = queries.map { q =>
      val t1 = median3(runQuery(spark, q, sfDir))
      println(f"[stress] $q baseline $t1%.2f s")
      val tN = runQuery(spark, q, outDir)
      val slope = tN / (t1 * factor)
      println(f"[stress] $q x$factor $tN%.1f s  slope=$slope%.3f")
      val part = f"""{"name":"$q","t1_sec":$t1%.3f,"tN_sec":$tN%.3f,"slope":$slope%.4f}"""
      Files.writeString(Paths.get("scale_report_parts.jsonl"), part + "\n",
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
      Row1(q, t1, tN, slope)
    }
    val salt = saltEngages(spark, outDir)
    val aqe = aqeSkewEngages(spark, outDir)
    println(s"[stress] salt_path_planned=$salt aqe_skew_split=$aqe")

    val json = rows.map(r =>
      f"""{"name":"${r.name}","t1_sec":${r.t1}%.3f,"tN_sec":${r.tN}%.3f,"slope":${r.slope}%.4f}""")
      .mkString("[", ",", "]")
    val report =
      f"""{"factor":$factor,"skew":$skew,"sf_dir":"$sfDir","stress_dir":"$outDir",
         |"replicate_sec":$tRep%.1f,"salt_path_planned":$salt,"aqe_skew_split":$aqe,
         |"queries":$json}""".stripMargin.replace("\n", "")
    // subset chunks append to parts.jsonl only — a partial run must not
    // clobber the full-campaign report
    Files.writeString(Paths.get(
      if (subset.isEmpty) "scale_report.json" else "scale_report_subset.json"),
      report)
    println(report)
    spark.stop()
  }
}
