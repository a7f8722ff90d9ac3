package graft.tools

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch profiler for the st_fact_rounds gate (not driver contract):
  * times each stage — landing, the two maintenance micro-batches, the
  * full-model identity pin — so floor-shaving targets the real cost. */
object StFrProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("STFR_SHUF", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stfr] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = Files.createTempDirectory("stfr").toString
    val land = s"$base/land"; Files.createDirectories(Paths.get(land))
    val table = s"$base/table"; val view = s"$base/view"

    val li = graft.core.Tables.load(spark, sfDir, "lineitem").select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_shipdate"),
      when(col("l_linenumber") % 2 === 0 && col("l_orderkey") % 8 === 0,
        "d2").otherwise("d1").as("pday"))

    def landOne(df: DataFrame, name: String, mtimeMs: Long): Unit = {
      val tmp = Paths.get(land).resolve(s".tmp-$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val ls = Files.list(tmp)
      val part = try ls.iterator().asScala
        .find(_.toString.endsWith(".parquet")).get finally ls.close()
      val t = Paths.get(land).resolve(name)
      Files.move(part, t)
      Files.setLastModifiedTime(t, FileTime.fromMillis(mtimeMs)); ()
    }
    val t0 = System.currentTimeMillis()
    timed("land both slices (one pass, partitionBy)") {
      val tmp = Paths.get(land).resolve(".tmp-slices")
      li.withColumn("__slice", col("pday"))
        .repartition(col("__slice"))
        .write.mode("overwrite").partitionBy("__slice").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      Seq(("d1", "b1.parquet", t0), ("d2", "b2.parquet", t0 + 60000)).foreach {
        case (slice, name, mt) =>
          val dir = tmp.resolve(s"__slice=$slice")
          val ls = Files.list(dir)
          val part = try ls.iterator().asScala
            .find(_.toString.endsWith(".parquet")).get finally ls.close()
          val t = Paths.get(land).resolve(name)
          Files.move(part, t)
          Files.setLastModifiedTime(t, FileTime.fromMillis(mt)); ()
      }
    }

    // batch-form decomposition of the two foreachBatch bodies (same ops,
    // no streaming machinery) against a SEPARATE table/view pair
    if (args.contains("--decompose")) {
      val table2 = s"$base/table2"; val view2 = s"$base/view2"
      val it2 = graft.tables.IncrementalTable
      val model2: DataFrame => DataFrame = rows =>
        graft.gold.GoldModels.factRounds(
          graft.queries.GoldQueries.syntheticSilver(rows.drop("pday")))
      val attach2: DataFrame => DataFrame = rows => rows
        .withColumn("course_id", col("l_returnflag"))
        .withColumn("round_id", concat(lit("round"), col("l_orderkey")))
      val b1 = spark.read.parquet(s"$land/b1.parquet")
      val b2 = spark.read.parquet(s"$land/b2.parquet")
      timed("  b1 refreshPartitions") {
        it2.refreshPartitions(b1, table2, Seq("pday")) }
      timed("  b1 buildGrouped (full model over d1)") {
        graft.tables.IncrementalView.buildGrouped(
          spark, table2, view2, Seq("course_id", "round_id"), model2, attach2) }
      timed("  b2 refreshPartitions") {
        it2.refreshPartitions(b2, table2, Seq("pday")) }
      timed("  b2 maintainGrouped (diff + affected recompute + splice)") {
        graft.tables.IncrementalView.maintainGrouped(
          spark, table2, view2, Seq("course_id", "round_id"), model2, attach2) }
      // sub-stage costs of the same bodies, run standalone
      timed("  model-only over full table (noop)") {
        model2(it2.read(spark, table2)).write
          .mode("overwrite").format("noop").save() }
      timed("  diff v1->v2 + distinct keys (noop)") {
        attach2(it2.diff(spark, table2, 1, 2))
          .select(col("course_id"), col("round_id")).distinct()
          .write.mode("overwrite").format("noop").save() }
      timed("  commitFull of model output (stage+adopt+manifest)") {
        it2.commitFull(model2(it2.read(spark, table2)), s"$base/view3") }
      // maintainGrouped interior, replayed piecewise against view2@v2
      locally {
        val cur = it2.read(spark, s"$base/view2").drop("__src_version")
        val affected = attach2(it2.diff(spark, table2, 1, 2))
          .select(col("course_id"), col("round_id")).distinct()
        val baseT = it2.read(spark, table2)
        val baseK = attach2(baseT)
        def keyCond(l: DataFrame, r: DataFrame) =
          Seq("course_id", "round_id").map(k => l(k) <=> r(k)).reduce(_ && _)
        timed("  mg: cur read + max version") {
          it2.read(spark, s"$base/view2").agg(max(col("__src_version"))).head }
        timed("  mg: recomputed (semi + model, noop)") {
          model2(baseK.join(broadcast(affected), keyCond(baseK, affected),
            "left_semi")).write.mode("overwrite").format("noop").save() }
        timed("  mg: untouched (anti, noop)") {
          cur.join(broadcast(affected), keyCond(cur, affected), "left_anti")
            .write.mode("overwrite").format("noop").save() }
        timed("  mg: splice commit (union write)") {
          it2.commitFull(
            cur.join(broadcast(affected), keyCond(cur, affected), "left_anti")
              .unionByName(model2(baseK.join(broadcast(affected),
                keyCond(baseK, affected), "left_semi"))),
            s"$base/view4") }
        timed("  mg: splice commit, affected persisted") {
          val aff = affected.persist()
          aff.count()
          try it2.commitFull(
            cur.join(broadcast(aff), keyCond(cur, aff), "left_anti")
              .unionByName(model2(baseK.join(broadcast(aff),
                keyCond(baseK, aff), "left_semi"))),
            s"$base/view5")
          finally { aff.unpersist(); () }
        }
      }
    }

    val stream = spark.readStream
      .schema("l_orderkey LONG, l_partkey LONG, l_suppkey LONG, " +
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, " +
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, " +
        "l_shipdate TIMESTAMP, pday STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(land)
    val model: DataFrame => DataFrame = rows =>
      graft.gold.GoldModels.factRounds(
        graft.queries.GoldQueries.syntheticSilver(rows.drop("pday")))
    timed("stream (2 micro-batches: refresh+build, refresh+maintain)") {
      val q = graft.streaming.ContinuousRefresh.startModelMaintenance(
        stream, table, view, partitionCols = Seq("pday"),
        keys = Seq("course_id", "round_id"), model = model,
        checkpointDir = s"$base/ckpt",
        attachKeys = rows => rows
          .withColumn("course_id", col("l_returnflag"))
          .withColumn("round_id", concat(lit("round"), col("l_orderkey"))),
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination()
    }
    val it = graft.tables.IncrementalTable
    val got = it.read(spark, view).drop("__src_version")
    val recomputed = model(it.read(spark, table))
    timed("full-model pin (signed-union multiset)") {
      val cols = got.columns.toSeq
      val r = got.withColumn("__side", lit(1L))
        .unionByName(recomputed.select(cols.map(col): _*)
          .withColumn("__side", lit(-1L)))
        .groupBy(cols.map(col): _*)
        .agg(sum(col("__side")).as("__d"))
        .filter(col("__d") =!= 0L)
        .isEmpty
      println(s"[stfr] identical=$r")
    }
    timed("final rollup agg") {
      got.groupBy(col("course_id")).agg(count(lit(1)).as("n"))
        .write.mode("overwrite").format("noop").save()
    }
    graft.tables.FsUtil.deleteRec(Paths.get(base))
    spark.stop()
  }
}
