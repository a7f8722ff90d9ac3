package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Crash-path proofs for BOTH table formats: every interleaving a
  * writer death can produce must leave `read()` on a consistent
  * committed version, never wedge later writers, and leave only
  * debris that vacuum can reclaim.
  *
  * VersionedTable's commit steps are direct filesystem operations, so
  * crashes are simulated the honest way: construct ON DISK exactly the
  * state a writer dying between two steps leaves behind, then assert
  * recovery. IncrementalTable's metadata rides [[CommitStore]], so its
  * crash points are injected live via [[FaultyCommitStore]]
  * (CommitProtocolSpec covers mint-adjacent crashes; here: vacuum and
  * compaction interleavings). */
class FaultInjectionSpec extends SparkSpec {

  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_fi_spec", name)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      } finally walk.close()
    }
    p.toString
  }

  private def df(rows: (Long, String, String)*) = rows.toDF("k", "v", "part")
  private def sdf(rows: (Long, String)*) = rows.toDF("k", "v")

  // ---- VersionedTable: crash between snapshot rename and log append ----

  test("VT: a version dir the log never names is invisible and cannot wedge the next commit") {
    val path = freshPath("vt_orphan")
    val v1 = VersionedTable.commit(sdf((1L, "a")), path)
    assert(v1 === 1)

    // writer died AFTER renaming its snapshot to v00000002 but BEFORE
    // appending to the log: fabricate exactly that on-disk state
    val orphan = Paths.get(path, "_versions", "v00000002")
    sdf((9L, "ORPHAN")).write.parquet(orphan.toString)
    assert(Files.exists(orphan))

    // reads resolve from the LOG: the orphan is invisible
    assert(VersionedTable.versions(path) === Seq(1))
    assert(VersionedTable.read(spark, path)
      .select("k", "v").as[(Long, String)].collect().toSet === Set((1L, "a")))

    // the next OCC commit reclaims the debris instead of wedging on the
    // occupied rename target
    val r = VersionedTable.commitIfCurrent(sdf((2L, "b")), path, Some(1))
    assert(r === Right(2))
    assert(VersionedTable.read(spark, path)
      .select("k", "v").as[(Long, String)].collect().toSet === Set((2L, "b")))
  }

  // ---- VersionedTable: crash between log append and pointer flip -------

  test("VT: log appended but pointer not flipped — readers stay consistent, next commit heals") {
    val path = freshPath("vt_ptr")
    VersionedTable.commit(sdf((1L, "a")), path)
    VersionedTable.commit(sdf((2L, "b")), path)

    // writer died after appending v3 to the log but before the pointer
    // flip: v3's snapshot and log entry exist, pointer still says 2
    sdf((3L, "c")).write.parquet(
      Paths.get(path, "_versions", "v00000003").toString)
    val log = Paths.get(path, "_commits")
    Files.write(log, "1\n2\n3".getBytes(StandardCharsets.UTF_8))
    assert(VersionedTable.currentVersion(path) === Some(2))

    // reads on the pointer version are consistent; v3 is durable and
    // time-travelable (log = committed set)
    assert(VersionedTable.read(spark, path)
      .select("v").as[String].collect().toSeq === Seq("b"))
    assert(VersionedTable.versions(path) === Seq(1, 2, 3))
    assert(VersionedTable.read(spark, path, Some(3))
      .select("v").as[String].collect().toSeq === Seq("c"))

    // the next commit mints 4 and flips the pointer forward past the
    // stranded version — nothing is wedged
    assert(VersionedTable.commit(sdf((4L, "d")), path) === 4)
    assert(VersionedTable.currentVersion(path) === Some(4))
  }

  // ---- VersionedTable: crash mid-vacuum --------------------------------

  test("VT: vacuum dying between snapshot deletes and log rewrite converges on re-run") {
    val path = freshPath("vt_vac")
    (1 to 4).foreach(i => VersionedTable.commit(sdf((i.toLong, s"v$i")), path))

    // vacuum(keep=2) died after deleting v1's snapshot dir but before
    // rewriting the log: the log still names 1
    FsUtil.deleteRec(Paths.get(path, "_versions", "v00000001"))
    assert(VersionedTable.versions(path) === Seq(1, 2, 3, 4))

    // current reads fine; re-running vacuum converges log and disk
    assert(VersionedTable.read(spark, path)
      .select("v").as[String].collect().toSeq === Seq("v4"))
    VersionedTable.vacuum(path, keep = 2, stagingGraceMs = 0)
    assert(VersionedTable.versions(path) === Seq(3, 4))
    assert(VersionedTable.read(spark, path)
      .select("v").as[String].collect().toSeq === Seq("v4"))
    // and a fresh commit still works
    assert(VersionedTable.commit(sdf((5L, "v5")), path) === 5)
  }

  // ---- VersionedTable: abandoned staging directory ---------------------

  test("VT: a dead writer's staging dir is reclaimed by vacuum after the grace period") {
    val path = freshPath("vt_stage")
    VersionedTable.commit(sdf((1L, "a")), path)
    val staging = Paths.get(path, "_versions", ".staging-deadbeef")
    sdf((9L, "stage")).write.parquet(staging.toString)

    // young debris survives the grace window (could be an in-flight write)
    VersionedTable.vacuum(path, keep = 2, stagingGraceMs = 3600000)
    assert(Files.exists(staging))
    // quiet past the grace period → reclaimed
    VersionedTable.vacuum(path, keep = 2, stagingGraceMs = 0)
    assert(!Files.exists(staging))
    assert(VersionedTable.read(spark, path)
      .select("v").as[String].collect().toSeq === Seq("a"))
  }

  // ---- IncrementalTable: crash mid-compaction swap ---------------------

  test("IT: compaction dying before its manifest PUT leaves the table intact, debris collectable") {
    val path = freshPath("it_compact")
    val store = new FaultyCommitStore(LocalCommitStore)
    // 20 distinct keys hashed over 10 partitions → every hive dir holds
    // several fragment files, so the compactor always has work
    val frag = (1L to 20L).map(i => (i, s"v$i", if (i % 2 == 0) "p1" else "p2"))
    IncrementalTable.commitFull(
      frag.toDF("k", "v", "part").repartition(10, col("k")),
      path, Seq("part"), store = store)
    val before = IncrementalTable.read(spark, path, store = store)
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(before.size === 20)

    // the compactor rewrites fragments, adopts them into data/, then
    // dies at its manifest PUT
    store.armCrashBeforePut(_.contains("_manifests"))
    intercept[store.InjectedCrash] {
      IncrementalTable.compact(spark, path, Seq("part"), store = store)
    }

    // nothing committed; reads identical; fragments still live
    assert(IncrementalTable.versions(path, store) === Seq(1))
    assert(IncrementalTable.read(spark, path, store = store)
      .select("k", "v").as[(Long, String)].collect().toSet === before)

    // vacuum reclaims the compactor's adopted-but-unreferenced files,
    // then a retried compaction commits normally
    IncrementalTable.vacuum(path, keep = 1, store = store)
    val (b2, a2) = IncrementalTable.compact(spark, path, Seq("part"), store = store)
    assert(a2 <= b2)
    assert(IncrementalTable.read(spark, path, store = store)
      .select("k", "v").as[(Long, String)].collect().toSet === before)
  }

  // ---- IncrementalTable: crash mid-vacuum ------------------------------

  test("IT: vacuum dying after data deletes but before manifest drops converges on re-run") {
    val path = freshPath("it_vac")
    val store = new FaultyCommitStore(LocalCommitStore)
    IncrementalTable.commitFull(df((1L, "a", "p1")), path, Seq("part"), store = store)
    IncrementalTable.refreshPartitions(df((1L, "a2", "p1")), path, Seq("part"), store = store)
    IncrementalTable.refreshPartitions(df((1L, "a3", "p1")), path, Seq("part"), store = store)

    // vacuum(keep=1) died after deleting v1/v2's unreferenced data files
    // but before dropping their manifest objects: fabricate by deleting
    // exactly the files only old manifests name
    val liveFiles = {
      val (_, fs) = {
        val lines = new ManifestLog(store, path).manifest(3).get.split("\n")
        (lines.head, lines.tail.filter(_.nonEmpty).toSeq)
      }
      fs.toSet
    }
    FsUtil.parquetFiles(Paths.get(path, "data")).foreach { f =>
      if (!liveFiles.contains(Paths.get(path, "data").relativize(f).toString))
        Files.delete(f)
    }
    assert(IncrementalTable.versions(path, store) === Seq(1, 2, 3))

    // current version reads fine (its files are all live)
    assert(IncrementalTable.read(spark, path, store = store)
      .select("v").as[String].collect().toSeq === Seq("a3"))

    // re-running vacuum drops the stale manifests; reads stay identical
    IncrementalTable.vacuum(path, keep = 1, store = store)
    assert(IncrementalTable.versions(path, store) === Seq(3))
    assert(IncrementalTable.read(spark, path, store = store)
      .select("v").as[String].collect().toSeq === Seq("a3"))
    // and the table accepts new commits
    assert(IncrementalTable.refreshPartitions(
      df((1L, "a4", "p1")), path, Seq("part"), store = store) === 4)
  }

  // ---- vacuum vs the rollback pin --------------------------------------

  test("IT: vacuum never reclaims the rollback-pinned version — pinned reads survive") {
    val path = freshPath("it_vac_pin")
    (1 to 4).foreach(i =>
      IncrementalTable.commitFull(sdf((i.toLong, s"v$i")), path))
    IncrementalTable.rollback(path, 2)
    assert(IncrementalTable.currentVersion(path) === Some(2))

    // keep=1 would keep only {4} by recency; the live pin must ALSO
    // protect 2 (dropVersions protects currentVersion, which resolves
    // through the pin) — a vacuum that reclaimed the pinned version
    // would break every reader mid-rollback
    IncrementalTable.vacuum(path, keep = 1)
    assert(IncrementalTable.versions(path).contains(2))
    assert(IncrementalTable.read(spark, path)
      .select("v").as[String].collect().toSeq === Seq("v2"))
    // the un-pinned non-newest versions are reclaimed
    assert(IncrementalTable.versions(path) === Seq(2, 4))
  }

  test("IT: time-travel read of a vacuumed version fails cleanly, never partially") {
    val path = freshPath("it_vac_tt")
    (1 to 3).foreach(i =>
      IncrementalTable.commitFull(sdf((i.toLong, s"v$i")), path))
    IncrementalTable.vacuum(path, keep = 1)
    assert(IncrementalTable.versions(path) === Seq(3))
    // a vacuumed version is GONE from the committed set: the read is
    // refused up front (clean IllegalArgumentException), not answered
    // from whatever files happen to remain
    intercept[IllegalArgumentException] {
      IncrementalTable.read(spark, path, Some(1))
    }
    assert(IncrementalTable.read(spark, path)
      .select("v").as[String].collect().toSeq === Seq("v3"))
  }

  // ---- lockless readers vs a live commit+vacuum storm ------------------

  test("ML: manifest readers racing commits and dropVersions always see a complete payload") {
    // ManifestLog-level storm (no Spark in the loop, so hundreds of
    // interleavings run in seconds): one writer commits versions whose
    // payload encodes its own version (versions are dense at the top, so
    // render(cur) knows it will mint cur+1); one vacuum loop drops
    // everything but the newest two; three reader threads resolve
    // current → fetch its manifest. Lockless-deployment invariant: a
    // reader either gets the COMPLETE payload of the version it
    // resolved, or a clean miss (the version aged out between resolve
    // and fetch) — never a torn or mismatched payload.
    val path = freshPath("ml_storm")
    Files.createDirectories(Paths.get(path))
    val log = new ManifestLog(LocalCommitStore, path)
    val commits = 200
    val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val cleanMisses = new java.util.concurrent.atomic.AtomicInteger()
    val goodReads = new java.util.concurrent.atomic.AtomicInteger()
    val dropped = new java.util.concurrent.atomic.AtomicInteger()
    val writerDone = new java.util.concurrent.atomic.AtomicBoolean(false)

    val writer = new Thread(() => {
      (1 to commits).foreach { _ =>
        log.commit(cur => s"payload v${cur.map(_._1).getOrElse(0) + 1}")
      }
      writerDone.set(true)
    })
    val vacuumer = new Thread(() => {
      while (!writerDone.get()) {
        val vs = log.versions
        if (vs.size > 2) {
          val drop = vs.dropRight(2)
          log.dropVersions(drop)
          dropped.addAndGet(drop.size)
        }
      }
    })
    val readers = (1 to 3).map(_ => new Thread(() => {
      while (!writerDone.get()) {
        log.currentVersion.foreach { v =>
          log.manifest(v) match {
            case Some(p) =>
              if (p.trim != s"payload v$v")
                anomalies.add(s"v$v read '${p.trim}'")
              else goodReads.incrementAndGet()
            case None => cleanMisses.incrementAndGet() // aged out mid-read
          }
        }
      }
    }))
    val threads = Seq(writer, vacuumer) ++ readers
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(anomalies.isEmpty,
      s"torn/mismatched reads: ${anomalies.toArray.mkString("; ")}")
    assert(goodReads.get() > 0, "storm produced no successful reads")
    assert(dropped.get() > 0, "vacuum loop never engaged — storm vacuous")
    // the log itself converged: newest version is the last commit
    assert(log.currentVersion === Some(commits))
  }

  test("IT: Spark readers under a live commit+vacuum storm see only complete snapshots") {
    // The same invariant through the FULL read path (manifest → parquet
    // scan): a lockless reader either collects a complete committed
    // snapshot — all rows carry one version tag and the full row count —
    // or fails cleanly when its resolved version's files are vacuumed
    // mid-scan. A mixed-tag or short result would mean torn reads.
    val path = freshPath("it_storm")
    val rowsPerVersion = 8
    val commits = 6
    val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val cleanMisses = new java.util.concurrent.atomic.AtomicInteger()
    val goodReads = new java.util.concurrent.atomic.AtomicInteger()
    val writerDone = new java.util.concurrent.atomic.AtomicBoolean(false)

    IncrementalTable.commitFull(
      (1 to rowsPerVersion).map(k => (k.toLong, "v1")).toDF("k", "v"), path)
    val writer = new Thread(() => {
      (2 to commits).foreach { i =>
        IncrementalTable.commitFull(
          (1 to rowsPerVersion).map(k => (k.toLong, s"v$i")).toDF("k", "v"),
          path)
        IncrementalTable.vacuum(path, keep = 2)
      }
      writerDone.set(true)
    })
    val readers = (1 to 2).map(_ => new Thread(() => {
      while (!writerDone.get()) {
        try {
          val tags = IncrementalTable.read(spark, path)
            .select("v").as[String].collect().toSeq
          if (tags.distinct.size != 1 || tags.size != rowsPerVersion)
            anomalies.add(s"torn snapshot: ${tags.distinct.mkString(",")} (${tags.size} rows)")
          else goodReads.incrementAndGet()
        } catch {
          // resolved version vacuumed mid-scan → clean failure, allowed
          case _: Exception => cleanMisses.incrementAndGet()
        }
      }
    }))
    val threads = writer +: readers
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    assert(anomalies.isEmpty,
      s"torn snapshots: ${anomalies.toArray.mkString("; ")}")
    assert(goodReads.get() > 0, "storm produced no successful reads")
    assert(IncrementalTable.read(spark, path)
      .select("v").as[String].collect().toSet === Set(s"v$commits"))
  }
}
