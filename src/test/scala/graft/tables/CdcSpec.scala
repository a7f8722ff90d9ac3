package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("id", "name", "bal")

  test("latestChanges: greatest seq wins; delete wins a same-seq tie") {
    val feed = Seq(
      (1L, "a1", 1.0, "upsert", 1L),
      (1L, "a2", 2.0, "upsert", 5L),
      (2L, "x", 0.0, "upsert", 3L),
      (2L, null.asInstanceOf[String], 0.0, "DELETE", 3L)) // same seq: tombstone wins
      .toDF("id", "name", "bal", "op", "seq")
    val latest = Cdc.latestChanges(feed, Seq("id"), "seq", "op")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(3))).toMap
    assert(latest(1L) === (("a2", "upsert")))
    assert(latest(2L)._2 === "delete") // ops normalize to lowercase
  }

  test("unknown op fails the job instead of silently upserting") {
    val feed = Seq((1L, "x", 0.0, "truncate", 1L))
      .toDF("id", "name", "bal", "op", "seq")
    val e = intercept[Exception] {
      Cdc.applyChanges(target, feed, Seq("id"), "seq", "op").collect()
    }
    assert(e.getMessage.contains("unknown op") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown op")))
  }

  test("applyChanges: upsert replaces, delete removes, absent keys pass through") {
    val feed = Seq(
      (1L, "a9", 99.0, "upsert", 1L),
      (3L, null.asInstanceOf[String], 0.0, "delete", 1L),
      (7L, "new", 70.0, "upsert", 1L))
      .toDF("id", "name", "bal", "op", "seq")
    val out = Cdc.applyChanges(target, feed, Seq("id"), "seq", "op")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      (1L, "a9", 99.0), (2L, "b", 20.0), (7L, "new", 70.0)))
  }

  test("last-write-wins: upsert then delete at higher seq nets to removal, and vice versa") {
    val feed = Seq(
      (1L, "a9", 99.0, "upsert", 1L),
      (1L, null.asInstanceOf[String], 0.0, "delete", 2L),
      (2L, null.asInstanceOf[String], 0.0, "delete", 1L),
      (2L, "b9", 88.0, "upsert", 2L))
      .toDF("id", "name", "bal", "op", "seq")
    val out = Cdc.applyChanges(target, feed, Seq("id"), "seq", "op")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq === Seq((2L, "b9", 88.0), (3L, "c", 30.0)))
  }

  test("applyToTable swap-writes the folded state") {
    val path = java.nio.file.Files.createTempDirectory("cdc").toString + "/t"
    target.write.parquet(path)
    val feed = Seq((2L, null.asInstanceOf[String], 0.0, "delete", 1L))
      .toDF("id", "name", "bal", "op", "seq")
    Cdc.applyToTable(spark, path, feed, Seq("id"), "seq", "op")
    assert(spark.read.parquet(path).count() === 2)
  }
}
