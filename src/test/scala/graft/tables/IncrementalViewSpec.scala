package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental view maintenance: the maintained rollup must stay
  * bit-identical to a from-scratch recompute of the current snapshot
  * across refreshes and deletes, honour the zero-vs-NULL trap, drop
  * emptied groups, and no-op when already current. */
class IncrementalViewSpec extends SparkSpec {

  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_iv_spec", name)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      } finally walk.close()
    }
    p.toString
  }

  private def rows(rs: (Long, String, java.lang.Double)*) =
    rs.toDF("id", "grp", "m")

  private def recompute(tablePath: String) =
    IncrementalTable.read(spark, tablePath)
      .groupBy($"grp")
      .agg(
        sum(when($"m".isNotNull,
          $"m".cast(org.apache.spark.sql.types.DecimalType(28, 4))))
          .cast("double").as("m_sum"),
        count(lit(1)).as("__rows"))

  private def assertMatches(tablePath: String, viewPath: String): Unit = {
    val maintained =
      IncrementalView.read(spark, viewPath, Seq("grp"), Seq("m"))
    val expected = recompute(tablePath)
    assert(maintained.exceptAll(expected).isEmpty &&
      expected.exceptAll(maintained).isEmpty,
      s"view diverged:\nview=${maintained.collect().toSeq}\n" +
        s"recompute=${expected.collect().toSeq}")
  }

  test("maintain tracks refresh + delete commits exactly") {
    val t = freshPath("t1"); val v = freshPath("v1")
    IncrementalTable.commitFull(
      rows((1L, "a", 1.5), (2L, "a", 2.5), (3L, "b", 10.0), (4L, "b", null)),
      t, Seq("grp"))
    val v0 = IncrementalView.build(spark, t, v, Seq("grp"), Seq("m"))
    assert(v0 === 1)
    assertMatches(t, v)

    // one-partition refresh rewrites group a
    IncrementalTable.refreshPartitions(
      rows((1L, "a", 100.0), (5L, "a", null)), t, Seq("grp"))
    // cross-partition delete
    IncrementalTable.deleteWhere(spark, t, Seq("grp"), $"id" === 3L)
    val reflects = IncrementalView.maintain(spark, t, v, Seq("grp"), Seq("m"))
    assert(reflects === IncrementalTable.currentVersion(t).get)
    assertMatches(t, v)
  }

  test("all-null group sums to NULL, emptied group leaves the view") {
    val t = freshPath("t2"); val v = freshPath("v2")
    IncrementalTable.commitFull(
      rows((1L, "a", 1.0), (2L, "a", null), (3L, "b", 5.0)), t, Seq("grp"))
    IncrementalView.build(spark, t, v, Seq("grp"), Seq("m"))

    // delete a's only non-null contribution: sum must become NULL (not 0)
    IncrementalTable.deleteWhere(spark, t, Seq("grp"), $"id" === 1L)
    // delete b entirely: the group must vanish from the view
    IncrementalTable.deleteWhere(spark, t, Seq("grp"), $"grp" === "b")
    IncrementalView.maintain(spark, t, v, Seq("grp"), Seq("m"))

    val out = IncrementalView.read(spark, v, Seq("grp"), Seq("m"))
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getLong(2)))
    assert(out.toSeq === Seq(("a", None, 1L)))
    assertMatches(t, v)
  }

  test("maintainGrouped: MIN/MAX stay exact under refresh + delete; groups vanish") {
    val t = freshPath("t4"); val v = freshPath("v4")
    def grpModel(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"grp").agg(
        min($"m").as("m_min"), max($"m").as("m_max"),
        countDistinct($"id").as("n_ids"))
    def assertGroupedMatches(): Unit = {
      val got = IncrementalTable.read(spark, v).drop("__src_version")
      val expected = grpModel(IncrementalTable.read(spark, t))
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        s"grouped view diverged:\nview=${got.collect().toSeq}\n" +
          s"recompute=${expected.collect().toSeq}")
    }
    IncrementalTable.commitFull(
      rows((1L, "a", 1.0), (2L, "a", 9.0), (3L, "b", 5.0), (4L, "b", 7.0)),
      t, Seq("grp"))
    IncrementalView.buildGrouped(spark, t, v, Seq("grp"), grpModel)
    assertGroupedMatches()

    // delete group a's MAX contributor: a signed merge cannot recover the
    // new max (8 is not derivable from state 9) — group re-aggregation can
    IncrementalTable.refreshPartitions(
      rows((1L, "a", 1.0), (6L, "a", 8.0)), t, Seq("grp"))
    IncrementalView.maintainGrouped(spark, t, v, Seq("grp"), grpModel)
    assertGroupedMatches()
    val a = IncrementalTable.read(spark, v).filter($"grp" === "a")
      .select("m_min", "m_max", "n_ids").head
    assert(a.getDouble(0) === 1.0 && a.getDouble(1) === 8.0 && a.getLong(2) === 2L)

    // untouched group b must carry forward byte-identically, and a group
    // deleted to zero rows must vanish
    IncrementalTable.deleteWhere(spark, t, Seq("grp"), $"grp" === "b")
    IncrementalView.maintainGrouped(spark, t, v, Seq("grp"), grpModel)
    assertGroupedMatches()
    assert(IncrementalTable.read(spark, v).select("grp")
      .collect().map(_.getString(0)).toSeq === Seq("a"))
  }

  test("maintainGrouped with derived keys attaches them to diff and base") {
    val t = freshPath("t5"); val v = freshPath("v5")
    // the table stores raw ids; the model's grain is id % 2 — the key
    // must be ATTACHED, the maintainGrouped(attachKeys) contract
    def attach(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("bucket", pmod($"id", lit(2L)))
    def model(df: org.apache.spark.sql.DataFrame) =
      attach(df).groupBy($"bucket").agg(max($"m").as("m_max"))
    IncrementalTable.commitFull(
      rows((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)), t, Seq("grp"))
    // the UNIFORM contract: the model reads pre-attached keys and the
    // SAME attachKeys goes to both the bootstrap and the maintenance
    val keyedModel = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy($"bucket").agg(max($"m").as("m_max"))
    IncrementalView.buildGrouped(spark, t, v, Seq("bucket"),
      keyedModel, attachKeys = attach)
    IncrementalTable.refreshPartitions(rows((5L, "b", 50.0)), t, Seq("grp"))
    IncrementalView.maintainGrouped(spark, t, v, Seq("bucket"),
      keyedModel, attachKeys = attach)
    val got = IncrementalTable.read(spark, v).drop("__src_version")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the refresh replaced partition b (dropping id 3, adding id 5), so
    // bucket 1 re-aggregates over {1, 5} while bucket 0 carries forward
    val expected = model(IncrementalTable.read(spark, t))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === expected)
  }

  test("maintainGrouped recovers after a batch empties the whole view") {
    val t = freshPath("t6"); val v = freshPath("v6")
    def grpModel(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"grp").agg(max($"m").as("m_max"))
    IncrementalTable.commitFull(rows((1L, "a", 1.0)), t, Seq("grp"))
    IncrementalView.buildGrouped(spark, t, v, Seq("grp"), grpModel)
    // delete EVERY group: the maintained view legitimately goes empty
    IncrementalTable.deleteWhere(spark, t, Seq("grp"), lit(true))
    IncrementalView.maintainGrouped(spark, t, v, Seq("grp"), grpModel)
    assert(IncrementalTable.read(spark, v).isEmpty)
    // the next batch lands rows; maintenance must rebuild, not NPE on
    // the empty view's NULL version watermark
    IncrementalTable.refreshPartitions(rows((2L, "b", 7.0)), t, Seq("grp"))
    val toV = IncrementalView.maintainGrouped(spark, t, v, Seq("grp"), grpModel)
    assert(toV === IncrementalTable.currentVersion(t).get)
    val got = IncrementalTable.read(spark, v).drop("__src_version")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === Seq(("b", 7.0)))
  }

  test("maintainGrouped recomputes NULL-key groups (null-safe key joins)") {
    val t = freshPath("t7"); val v = freshPath("v7")
    // derived grain that goes NULL for some source rows: grp 'x' → NULL
    def attach(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("k", when($"grp" === "x", lit(null)).otherwise($"grp"))
    def model(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"k").agg(max($"m").as("m_max"))
    IncrementalTable.commitFull(
      rows((1L, "x", 1.0), (2L, "x", 9.0), (3L, "b", 5.0)), t, Seq("grp"))
    IncrementalView.buildGrouped(spark, t, v, Seq("k"),
      df => model(attach(df)))
    // rewrite the NULL-key group's partition, dropping its MAX (9)
    IncrementalTable.refreshPartitions(
      rows((1L, "x", 1.0), (5L, "x", 4.0)), t, Seq("grp"))
    IncrementalView.maintainGrouped(spark, t, v, Seq("k"), model,
      attachKeys = attach)
    val got = IncrementalTable.read(spark, v).drop("__src_version")
      .collect().map(r => (Option(r.get(0)), r.getDouble(1))).toMap
    // a plain equi-join would never match the NULL key, leaving the
    // stale 9.0 in place
    assert(got === Map(None -> 4.0, Some("b") -> 5.0))
  }

  test("maintain is a no-op when the view is already current") {
    val t = freshPath("t3"); val v = freshPath("v3")
    IncrementalTable.commitFull(rows((1L, "a", 1.0)), t, Seq("grp"))
    IncrementalView.build(spark, t, v, Seq("grp"), Seq("m"))
    val viewV = IncrementalTable.currentVersion(v).get
    val reflects = IncrementalView.maintain(spark, t, v, Seq("grp"), Seq("m"))
    assert(reflects === 1)
    // no new commit was minted on the view table
    assert(IncrementalTable.currentVersion(v).get === viewV)
  }
}
