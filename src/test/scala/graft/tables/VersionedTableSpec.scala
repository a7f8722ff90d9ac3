package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Commit / time-travel / rollback / vacuum semantics of the snapshot-
  * versioned table, including the crash-debris case (a complete-looking
  * snapshot directory the pointer never named must stay invisible). */
class VersionedTableSpec extends SparkSpec {

  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_vt_spec", name)
    FsUtil.deleteRec(p)
    p.toString
  }

  test("commit / read / time travel / rollback round-trip") {
    val path = freshPath("roundtrip")
    val v1 = VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    val v2 = VersionedTable.commit(Seq((1L, "a2"), (3L, "c")).toDF("k", "v"), path)
    assert(v1 === 1 && v2 === 2)
    assert(VersionedTable.currentVersion(path) === Some(2))
    assert(VersionedTable.versions(path) === Seq(1, 2))

    // current read sees v2; time travel sees v1
    assert(VersionedTable.read(spark, path).select("v").as[String].collect().toSet
      === Set("a2", "c"))
    assert(VersionedTable.read(spark, path, Some(1)).select("v").as[String].collect().toSet
      === Set("a", "b"))

    // rollback is metadata-only: current flips to v1, v2 stays readable
    VersionedTable.rollback(path, 1)
    assert(VersionedTable.read(spark, path).select("v").as[String].collect().toSet
      === Set("a", "b"))
    assert(VersionedTable.read(spark, path, Some(2)).select("v").as[String].collect().toSet
      === Set("a2", "c"))

    // a new commit after rollback becomes v3 on top of the restored state
    val v3 = VersionedTable.commit(Seq((9L, "z")).toDF("k", "v"), path)
    assert(v3 === 3)
    assert(VersionedTable.versions(path) === Seq(1, 2, 3))
  }

  test("commitIfCurrent: stale expectation conflicts, fresh one commits") {
    val path = freshPath("occ")
    val v1 = VersionedTable.commitIfCurrent(
      Seq((1L, "a")).toDF("k", "v"), path, expected = None)
    assert(v1 === Right(1))
    // a writer that read v1 commits fine
    val v2 = VersionedTable.commitIfCurrent(
      Seq((1L, "b")).toDF("k", "v"), path, expected = Some(1))
    assert(v2 === Right(2))
    // a writer still holding the v1 base must conflict, not clobber
    val stale = VersionedTable.commitIfCurrent(
      Seq((1L, "clobber")).toDF("k", "v"), path, expected = Some(1))
    assert(stale === Left(VersionedTable.CommitConflict(Some(1), Some(2))))
    assert(VersionedTable.read(spark, path).select("v")
      .collect()(0).getString(0) === "b")
    // no staging debris left behind, and vacuum clears any that were
    assert(!FsUtil.listDir(Paths.get(path, "_versions"))
      .exists(_.getFileName.toString.startsWith(".staging")))
  }

  test("commitIfCurrent: racing writers — exactly one wins per base version") {
    val path = freshPath("occ_race")
    VersionedTable.commitIfCurrent(Seq((0L, "base")).toDF("k", "v"), path, None)
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val results = Await.result(
        Future.sequence((1 to 4).map { i =>
          Future(VersionedTable.commitIfCurrent(
            Seq((i.toLong, s"w$i")).toDF("k", "v"), path, expected = Some(1)))
        }), 120.seconds)
      assert(results.count(_.isRight) === 1,
        s"exactly one racer must win: $results")
      assert(results.collect { case Right(v) => v } === Seq(2))
      assert(VersionedTable.currentVersion(path) === Some(2))
      assert(VersionedTable.versions(path) === Seq(1, 2))
    } finally pool.shutdown()
  }

  test("diff emits delete+insert pairs for changed rows only") {
    val path = freshPath("diff")
    VersionedTable.commit(Seq((1L, 10.0), (2L, 20.0), (3L, 0.0)).toDF("k", "bal"), path)
    VersionedTable.commit(Seq((1L, 10.0), (2L, 25.0), (4L, 40.0)).toDF("k", "bal"), path)
    val changes = VersionedTable.diff(spark, path, 1, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(changes === Set(
      (2L, 20.0, "delete"), (2L, 25.0, "insert"), // update = delete+insert
      (3L, 0.0, "delete"),                        // removed row
      (4L, 40.0, "insert")))                      // new row
    // unchanged row 1 appears in neither direction
    assert(!changes.exists(_._1 == 1L))
  }

  test("uncommitted snapshot directories are invisible until vacuumed") {
    val path = freshPath("debris")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), path)
    // simulate a crash mid-commit: a complete snapshot dir, pointer never flipped
    Seq((2L, "crash")).toDF("k", "v")
      .write.parquet(s"$path/_versions/v00000002")
    assert(VersionedTable.versions(path) === Seq(1))
    assert(VersionedTable.currentVersion(path) === Some(1))
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, path, Some(2)).collect()
    }
    VersionedTable.vacuum(path, keep = 2)
    assert(!Files.exists(Paths.get(s"$path/_versions/v00000002")),
      "crash debris survived vacuum")
    assert(VersionedTable.read(spark, path).count() === 1)
  }

  test("vacuum keeps the newest N snapshots and the current one") {
    val path = freshPath("vacuum")
    (1 to 5).foreach(i =>
      VersionedTable.commit(Seq((i.toLong, s"v$i")).toDF("k", "v"), path))
    VersionedTable.vacuum(path, keep = 2)
    assert(VersionedTable.versions(path) === Seq(4, 5))
    assert(VersionedTable.read(spark, path).select("v").as[String].collect().toSeq
      === Seq("v5"))
    // current version is protected even when keep would drop it
    VersionedTable.rollback(path, 4)
    VersionedTable.vacuum(path, keep = 1)
    assert(VersionedTable.versions(path).contains(4))
    assert(VersionedTable.read(spark, path).select("v").as[String].collect().toSeq
      === Seq("v4"))
  }
}
