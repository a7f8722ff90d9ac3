package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import StreamingTelemetry._

/** TOP-LEVEL, not nested in the spec: an inner case class gives Spark's
  * encoder an outer-instance reference that whole-stage codegen can't
  * compile, so every use fell back to interpreted eval behind a WARN
  * storm that buried real codegen regressions in the test log. */
private[streaming] case class Doc(
    doc_id: Long, text: String, lang: String, source: String,
    ingest_ts: Timestamp)

/** Streaming semantics via MemoryStream + memory sink: watermarked dedup,
  * windowed aggregation, and stateful round summarization.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-15 10:$minute%02d:$second%02d")

  private def fix(round: String, minute: Int, idx: Int,
      pace: Option[Double] = Some(100.0), cache: Boolean = false) =
    Fix(round, "americanfalls", ts(minute), idx, Some(1), pace, cache)

  test("dropDuplicatesWithinWatermark collapses replayed fixes (streaming W1)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Fix]
    val q = dedupStream(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        fix("r1", 0, 0), fix("r1", 0, 0, cache = true), // duplicate key
        fix("r1", 1, 1), fix("r2", 1, 0))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
      assert(rows.length === 3)
    } finally q.stop()
  }

  test("windowed pace aggregation buckets by event time with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Fix]
    val q = windowedPace(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("window_out")
      .outputMode("append").start()
    try {
      input.addData(
        fix("r1", 0, 0, Some(100.0)), fix("r1", 2, 1, Some(200.0)), // window 10:00
        fix("r1", 7, 2, Some(300.0)),                                // window 10:05
        fix("r2", 1, 0, Some(400.0)))                                // window 10:00
      // advance the watermark far enough to close both windows
      input.addData(fix("r3", 40, 0))
      q.processAllAvailable()
      val out = spark.table("window_out")
        .select(col("window_start").cast("string"), col("fixes"), col("avg_pace"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(out("2024-01-15 10:00:00") === ((3L, (100.0 + 200.0 + 400.0) / 3)))
      assert(out("2024-01-15 10:05:00") === ((1L, 300.0)))
    } finally q.stop()
  }

  test("session windows merge within the gap and close past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Fix]
    val q = sessionizedPace(input.toDF(), "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("session_out")
      .outputMode("append").start()
    try {
      input.addData(
        fix("r1", 0, 0, Some(100.0)), fix("r1", 5, 1, Some(200.0)), // one session
        fix("r1", 30, 2, Some(300.0)), // > 10-min gap → new session
        fix("r2", 1, 0, Some(50.0)))
      // push the watermark far past every session end to flush them
      input.addData(fix("r3", 59, 0))
      q.processAllAvailable()
      val out = spark.table("session_out")
        .select(col("roundId"), col("session_start").cast("string"),
          col("fixes"), col("avg_pace"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      assert(out(("r1", "2024-01-15 10:00:00")) === ((2L, 150.0)))
      assert(out(("r1", "2024-01-15 10:30:00")) === ((1L, 300.0)))
      assert(out(("r2", "2024-01-15 10:01:00")) === ((1L, 50.0)))
      // batch twin computes the identical segmentation on the same rows
      val batch = graft.analytics.Sessions.sessionWindows(
          Seq(
            ("r1", ts(0)), ("r1", ts(5)), ("r1", ts(30)), ("r2", ts(1))
          ).toDF("roundId", "fixTimestamp"),
          "roundId", "fixTimestamp", "10 minutes")
        .select(col("roundId"), col("session_start").cast("string"), col("n_events"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(batch === out.map { case (k, v) => k -> v._1 })
    } finally q.stop()
  }

  test("continuous refresh lands micro-batches idempotently (foreachBatch + partition overwrite)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cr").toString
    val input = MemoryStream[Fix]
    val q = ContinuousRefresh.start(
      input.toDF().withColumn("part", col("courseId")),
      s"$dir/table", Seq("part"), s"$dir/ckpt")
    try {
      input.addData(fix("r1", 0, 0), fix("r1", 1, 1))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/table").count() === 2)
      // second batch: replay of the same partition's full contents plus a
      // second partition — replay must not duplicate
      input.addData(fix("r1", 0, 0), fix("r1", 1, 1),
        Fix("r2", "elsewhere", ts(2), 0, Some(1), Some(1.0), false))
      q.processAllAvailable()
      val table = spark.read.parquet(s"$dir/table")
      assert(table.count() === 3)
      assert(table.filter(col("part") === "americanfalls").count() === 2)
      assert(table.filter(col("part") === "elsewhere").count() === 1)
    } finally {
      q.stop()
      graft.tables.FsUtil.deleteRec(java.nio.file.Paths.get(dir))
    }
  }

  test("stateful round summaries emit on event-time quiescence (flatMapGroupsWithState)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Fix]
    val q = roundSummaries(spark, input.toDS(), "5 minutes")
      .writeStream.format("memory").queryName("rounds_out")
      .outputMode("append").start()
    try {
      input.addData(
        fix("r1", 0, 0, Some(100.0)), fix("r1", 2, 1, Some(300.0)),
        fix("r1", 4, 2, pace = None))
      q.processAllAvailable()
      // nothing emitted yet — round still live
      assert(spark.table("rounds_out").count() === 0)
      // an hour-later fix on another round pushes the watermark past r1's
      // 15-minute quiet horizon → r1's summary flushes
      input.addData(fix("r2", 59, 0))
      q.processAllAvailable()
      input.addData(Fix("r2", "americanfalls",
        Timestamp.valueOf("2024-01-15 12:00:00"), 1, Some(1), None, false))
      q.processAllAvailable()
      val out = spark.table("rounds_out").as[RoundSummary].collect()
        .map(r => r.roundId -> r).toMap
      assert(out.contains("r1"))
      val r1 = out("r1")
      assert(r1.fixCount === 3L)
      assert(r1.firstFix === ts(0) && r1.lastFix === ts(4))
      assert(r1.avgPace === Some(200.0))
    } finally q.stop()
  }

  test("streaming corpus: fingerprint dedup collapses cross-source copies") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingCorpus.dedupDocStream(input.toDF(), "1 hour")
      .writeStream.format("memory").queryName("docdedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1, "the cat sat on the mat", "en", "web", ts(0)),
        Doc(2, "THE  CAT   SAT ON THE MAT", "en", "crawl", ts(1)), // same normalized text
        Doc(3, "something else entirely here", "en", "web", ts(2)))
      q.processAllAvailable()
      assert(spark.table("docdedup_out").count() === 2)
    } finally q.stop()
  }

  test("streaming corpus: quality gate keeps prose, drops salad and repetition") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingCorpus.qualityGateStream(input.toDF(), minScore = 40.0)
      .writeStream.format("memory").queryName("docgate_out")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1, "the cat sat on the mat and it was a very happy cat that day " * 3,
          "en", "web", ts(0)),
        Doc(2, "xyzzy plugh qwerty zzz", "und", "web", ts(1)), // no stopwords → und
        Doc(3, ("spam " * 40) + "the end", "en", "web", ts(2))) // dominant-token salad
      q.processAllAvailable()
      val kept = spark.table("docgate_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L))
    } finally q.stop()
  }

  test("streaming corpus: stateless prep (PII scrub + chunking) stays append-only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingCorpus.prepStream(input.toDF(), chunkSize = 4, stride = 3)
      .writeStream.format("memory").queryName("docprep_out")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1, "contact me at a.b@example.com for the cat details now", "en", "web", ts(0)),
        Doc(2, "tiny doc", "en", "web", ts(1))) // < minWords → filtered to empty
      q.processAllAvailable()
      val rows = spark.table("docprep_out")
        .select("doc_id", "chunk_idx", "chunk_text").collect()
      val d1 = rows.filter(_.getLong(0) == 1L).map(_.getString(2)).mkString(" | ")
      assert(d1.contains("<EMAIL>"), s"PII survived: $d1")
      assert(!d1.contains("example.com"))
      // doc 1: 10 tokens → ceil((10-4)/3)+1 = 3 chunks
      assert(rows.count(_.getLong(0) == 1L) === 3)
      // doc 2 cleaned to empty text → dropped entirely (no phantom chunk)
      assert(!rows.exists(_.getLong(0) == 2L))
    } finally q.stop()
  }

  test("streaming corpus: windowed per-source stats") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingCorpus.sourceStats(input.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("docstats_out")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1, "the cat sat on the mat", "en", "web", ts(0)),
        Doc(2, "a dog ran in the park", "en", "web", ts(5)),
        Doc(3, "der hund ist nicht da", "de", "crawl", ts(3)))
      input.addData(Doc(9, "late watermark push", "en", "web",
        Timestamp.valueOf("2024-01-15 12:00:00")))
      q.processAllAvailable()
      val out = spark.table("docstats_out")
        .select(col("source"), col("docs"), col("tokens"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(out("web") === ((2L, 12L)))
      assert(out("crawl") === ((1L, 5L)))
    } finally q.stop()
  }

  test("streaming corpus: census maintenance merges per batch, replay-safe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_census").toString
    try {
      val b0 = Seq((1L, "the cat sat"), (2L, "the dog")).toDF("doc_id", "text")
      val b1 = Seq((3L, "the cat ran")).toDF("doc_id", "text")
      StreamingCorpus.applyCensusBatch(b0, "text", dir, 0L)
      StreamingCorpus.applyCensusBatch(b1, "text", dir, 1L)
      def census(): Map[String, Long] =
        graft.tables.IncrementalTable.read(spark, dir)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = Map("the" -> 3L, "cat" -> 2L, "sat" -> 1L,
        "dog" -> 1L, "ran" -> 1L)
      assert(census() == expected)
      // foreachBatch replay re-delivers batch 1 — the committed version
      // count proves it already applied, so the merge must NOT re-run
      // (re-merging would double batch 1's counts)
      StreamingCorpus.applyCensusBatch(b1, "text", dir, 1L)
      assert(census() == expected, "replayed batch double-counted")
      assert(graft.tables.IncrementalTable.versions(dir).size == 2)
      // an empty batch still commits (keeps version==batch alignment,
      // the invariant the replay skip rides on)
      StreamingCorpus.applyCensusBatch(
        Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", dir, 2L)
      assert(census() == expected)
      assert(graft.tables.IncrementalTable.versions(dir).size == 3)
    } finally graft.tables.FsUtil.deleteRec(java.nio.file.Paths.get(dir))
  }

  test("streaming corpus: inverted-index maintenance is replay-safe per table") {
    import spark.implicits._
    val it = graft.tables.IncrementalTable
    val dir = java.nio.file.Files.createTempDirectory("graft_sidx").toString
    try {
      val b0 = Seq((1L, "cat dog"), (2L, "cat cat fish")).toDF("doc_id", "text")
      val b1 = Seq((3L, "dog bird")).toDF("doc_id", "text")
      StreamingCorpus.applyIndexBatch(b0, "doc_id", "text", dir, 0L)
      StreamingCorpus.applyIndexBatch(b1, "doc_id", "text", dir, 1L)
      def dict(): Map[String, Long] =
        it.read(spark, s"$dir/dict")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def stats(): (Long, Long) = {
        val r = it.read(spark, s"$dir/stats").collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      def postings(): Set[(String, Long, Long, Long)] =
        it.read(spark, s"$dir/postings")
          .select("token", "doc_id", "tf", "dl").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
      val expDict = Map("cat" -> 2L, "dog" -> 2L, "fish" -> 1L, "bird" -> 1L)
      val expStats = (3L, 7L) // 3 docs, 2+3+2 tokens
      val expPost = Set(
        ("cat", 1L, 1L, 2L), ("dog", 1L, 1L, 2L),
        ("cat", 2L, 2L, 3L), ("fish", 2L, 1L, 3L),
        ("dog", 3L, 1L, 2L), ("bird", 3L, 1L, 2L))
      assert(dict() == expDict)
      assert(stats() == expStats)
      assert(postings() == expPost)
      // replay of batch 1: the dict/stats merges must skip (re-merging
      // double-counts); the segment refresh rewrites shard=1 to the same
      // content — everything stays bit-identical
      StreamingCorpus.applyIndexBatch(b1, "doc_id", "text", dir, 1L)
      assert(dict() == expDict, "replayed batch double-counted dict")
      assert(stats() == expStats, "replayed batch double-counted stats")
      assert(postings() == expPost)
      // live retrieval over the maintained index matches the batch build
      val qs = Seq((1, "cat dog")).toDF("query_id", "qtext")
      val docs = b0.unionByName(b1)
      val live = graft.llm.Retrieval.bm25TopKWithDict(
        it.read(spark, s"$dir/postings").drop("shard"),
        it.read(spark, s"$dir/dict"), it.read(spark, s"$dir/stats"),
        qs, "query_id", "qtext", k = 5)
      val direct = graft.llm.Retrieval.bm25TopKDirect(
        docs, "doc_id", "text", qs, "query_id", "qtext", k = 5)
      assert(live.exceptAll(direct).isEmpty && direct.exceptAll(live).isEmpty)
      // segment merge: one shard afterwards, retrieval unchanged, and
      // the pre-merge segment layout still time-travels
      val preVersion = it.versions(s"$dir/postings").max
      StreamingCorpus.compactIndex(spark, dir)
      val shards = it.read(spark, s"$dir/postings")
        .select("shard").distinct().collect().map(_.getLong(0)).toSeq
      assert(shards === Seq(-1L))
      assert(postings() == expPost)
      val liveC = graft.llm.Retrieval.bm25TopKWithDict(
        it.read(spark, s"$dir/postings").drop("shard"),
        it.read(spark, s"$dir/dict"), it.read(spark, s"$dir/stats"),
        qs, "query_id", "qtext", k = 5)
      assert(liveC.exceptAll(direct).isEmpty && direct.exceptAll(liveC).isEmpty)
      val preShards = it.read(spark, s"$dir/postings", Some(preVersion))
        .select("shard").distinct().count()
      assert(preShards == 2L, "pre-merge layout must still time-travel")
      // the replay fence: a restart re-delivering batch 1 AFTER its
      // shard was folded into the merged segment must NOT re-add its
      // rows — without the _compacted_through fence every one of its
      // postings would exist twice and BM25 scores would double
      StreamingCorpus.applyIndexBatch(b1, "doc_id", "text", dir, 1L)
      assert(postings() == expPost,
        "replay after compaction duplicated folded postings")
      assert(it.read(spark, s"$dir/postings")
        .select("shard").distinct().collect().map(_.getLong(0)).toSeq
        === Seq(-1L))
      assert(dict() == expDict && stats() == expStats)
    } finally graft.tables.FsUtil.deleteRec(java.nio.file.Paths.get(dir))
  }

  test("census maintenance: fresh checkpoint against an existing table " +
      "fails loudly instead of freezing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cmix").toString
    try {
      val b0 = Seq((1L, "the cat")).toDF("doc_id", "text")
      val b1 = Seq((2L, "the dog")).toDF("doc_id", "text")
      StreamingCorpus.applyCensusBatch(b0, "text", dir, 0L)
      StreamingCorpus.applyCensusBatch(b1, "text", dir, 1L)
      // a NEW checkpoint restarts batch ids at 0 against the version-2
      // table: applied (2) > batchId (0) + 1 is unreachable under the
      // contract — the old silent skip would freeze the census forever
      val e = intercept[IllegalArgumentException] {
        StreamingCorpus.applyCensusBatch(b0, "text", dir, 0L)
      }
      assert(e.getMessage.contains("checkpoint"))
      // the legitimate replay (applied == batchId + 1) still no-ops
      StreamingCorpus.applyCensusBatch(b1, "text", dir, 1L)
      assert(graft.tables.IncrementalTable.versions(dir).size == 2)
    } finally graft.tables.FsUtil.deleteRec(java.nio.file.Paths.get(dir))
  }

  test("index maintenance: dict/stats mismatch tripwire fires on a " +
      "fresh checkpoint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_imix").toString
    try {
      val b0 = Seq((1L, "cat dog")).toDF("doc_id", "text")
      val b1 = Seq((2L, "dog bird")).toDF("doc_id", "text")
      StreamingCorpus.applyIndexBatch(b0, "doc_id", "text", dir, 0L)
      StreamingCorpus.applyIndexBatch(b1, "doc_id", "text", dir, 1L)
      val e = intercept[IllegalArgumentException] {
        StreamingCorpus.applyIndexBatch(b0, "doc_id", "text", dir, 0L)
      }
      assert(e.getMessage.contains("mismatch"))
    } finally graft.tables.FsUtil.deleteRec(java.nio.file.Paths.get(dir))
  }

  test("compaction fence: pre-commit write and monotonicity close the " +
      "crash/replay windows") {
    import spark.implicits._
    val it = graft.tables.IncrementalTable
    val dir = java.nio.file.Files.createTempDirectory("graft_fence").toString
    try {
      val b0 = Seq((1L, "cat dog"), (2L, "cat fish")).toDF("doc_id", "text")
      val b1 = Seq((3L, "dog bird")).toDF("doc_id", "text")
      StreamingCorpus.applyIndexBatch(b0, "doc_id", "text", dir, 0L)
      StreamingCorpus.applyIndexBatch(b1, "doc_id", "text", dir, 1L)
      def postings(): Set[(String, Long)] =
        it.read(spark, s"$dir/postings").select("token", "doc_id")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val exp = postings()
      // crash window: fence landed but the merged commit did NOT — the
      // per-shard layout is live with fence=1. A replayed batch 1 must
      // skip its rewrite AND lose nothing (its rows already exist).
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/postings", "_compacted_through"), "1")
      StreamingCorpus.applyIndexBatch(b1, "doc_id", "text", dir, 1L)
      assert(postings() == exp, "fence-skip lost or doubled rows")
      // full compaction now folds everything; compacting AGAIN (all
      // shards already -1) must not regress the fence to -1
      StreamingCorpus.compactIndex(spark, dir)
      StreamingCorpus.compactIndex(spark, dir)
      val fence = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$dir/postings", "_compacted_through")).trim
      assert(fence === "1", s"fence regressed to $fence")
      // with the fence intact, replay of the folded batch stays clean
      StreamingCorpus.applyIndexBatch(b1, "doc_id", "text", dir, 1L)
      assert(postings() == exp)
      assert(it.read(spark, s"$dir/postings").select("shard").distinct()
        .collect().map(_.getLong(0)).toSeq === Seq(-1L))
    } finally graft.tables.FsUtil.deleteRec(java.nio.file.Paths.get(dir))
  }
}
