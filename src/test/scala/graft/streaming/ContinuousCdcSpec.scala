package graft.streaming

import java.nio.file.Paths

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.{FsUtil, IncrementalTable}

/** Micro-batch semantics of the streaming CDC sink, tested through
  * [[ContinuousRefresh.applyCdcBatch]] directly (the foreachBatch body):
  * bootstrap on an empty table, partition pruning (untouched partitions
  * carry BY REFERENCE — their files are not rewritten), emptied
  * partitions committed as removals, and replay idempotence (the
  * exactly-once story: a checkpoint replay re-applies the same batch and
  * must not change content).
  */
class ContinuousCdcSpec extends SparkSpec {

  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_cdc_spec", name)
    FsUtil.deleteRec(p)
    p.toString
  }

  private def feed(rows: (Long, String, String, String, Long)*) =
    rows.toDF("k", "v", "part", "op", "seq")

  private def apply1(path: String, batch: org.apache.spark.sql.DataFrame): Unit =
    ContinuousRefresh.applyCdcBatch(
      batch, path, keys = Seq("k"), seqCol = "seq", opCol = "op",
      partitionCols = Seq("part"))

  private def content(path: String): Set[(Long, String, String)] =
    IncrementalTable.read(spark, path)
      .select("k", "v", "part").as[(Long, String, String)].collect().toSet

  test("bootstrap: the first batch's upserts create the partitioned table") {
    val path = freshPath("cdc_boot")
    apply1(path, feed((1L, "a", "p1", "upsert", 1L), (2L, "b", "p2", "upsert", 1L),
      // a delete for a row that never existed must not surface
      (9L, null, "p1", "delete", 1L)))
    assert(content(path) === Set((1L, "a", "p1"), (2L, "b", "p2")))
    assert(IncrementalTable.versions(path) === Seq(1))
  }

  test("partition pruning: a batch touching one partition does not rewrite the others' files") {
    val path = freshPath("cdc_prune")
    apply1(path, feed((1L, "a", "p1", "upsert", 1L), (2L, "b", "p2", "upsert", 1L)))
    val p2FilesBefore = FsUtil.parquetFiles(
      Paths.get(path, "data", "part=p2")).map(_.toString).toSet
    apply1(path, feed((1L, "a2", "p1", "upsert", 2L), (3L, "c", "p1", "upsert", 2L)))
    // p1 advanced, p2 untouched — same rows AND the same physical files
    assert(content(path) ===
      Set((1L, "a2", "p1"), (3L, "c", "p1"), (2L, "b", "p2")))
    val p2FilesAfter = FsUtil.parquetFiles(
      Paths.get(path, "data", "part=p2")).map(_.toString).toSet
    assert(p2FilesAfter === p2FilesBefore,
      "p2 files were rewritten by a batch that never touched p2")
  }

  test("a batch whose deletes empty a partition removes it completely") {
    val path = freshPath("cdc_empty")
    apply1(path, feed((1L, "a", "p1", "upsert", 1L), (2L, "b", "p1", "upsert", 1L),
      (3L, "c", "p2", "upsert", 1L)))
    apply1(path, feed((1L, null, "p1", "delete", 2L), (2L, null, "p1", "delete", 2L)))
    assert(content(path) === Set((3L, "c", "p2")))
    // and the table still accepts the next batch
    apply1(path, feed((4L, "d", "p1", "upsert", 3L)))
    assert(content(path) === Set((3L, "c", "p2"), (4L, "d", "p1")))
  }

  test("replay idempotence: re-applying a batch leaves content identical") {
    val path = freshPath("cdc_replay")
    apply1(path, feed((1L, "a", "p1", "upsert", 1L), (2L, "b", "p2", "upsert", 1L)))
    val b2 = feed((1L, "a2", "p1", "upsert", 2L), (2L, null, "p2", "delete", 2L))
    apply1(path, b2)
    val after = content(path)
    assert(after === Set((1L, "a2", "p1")))
    apply1(path, b2) // checkpoint replay
    assert(content(path) === after)
    // the replayed upsert rewrote an identical row; the replayed delete
    // found nothing — every version is still a complete readable state
    IncrementalTable.versions(path).foreach { v =>
      IncrementalTable.read(spark, path, Some(v)).collect()
    }
  }

  test("last-write-wins within one batch, delete preferred on sequence ties") {
    val path = freshPath("cdc_lww")
    apply1(path, feed(
      (1L, "first", "p1", "upsert", 1L),
      (1L, "second", "p1", "upsert", 2L),
      (2L, "x", "p1", "upsert", 1L),
      (2L, null, "p1", "delete", 1L)))
    assert(content(path) === Set((1L, "second", "p1")))
  }
}
