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
      .config("spark.sql.shuffle.partitions", "8")
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
      when(col("l_linenumber") % 2 === 1, "d1").otherwise("d2").as("pday"))

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
    timed("land b1 (coalesce1 parquet)") {
      landOne(li.filter(col("pday") === "d1"), "b1.parquet", t0) }
    timed("land b2 (coalesce1 parquet)") {
      landOne(li.filter(col("pday") === "d2"), "b2.parquet", t0 + 60000) }

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
