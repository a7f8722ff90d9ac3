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
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
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
}
