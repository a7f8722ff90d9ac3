package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.StatsIndex

/** Measured evidence for the incremental stats restat (m15's round-7
  * fix): on a ×N-replica lineitem table, time (a) the FULL stats build
  * — the only option before `buildIncremental` existed, re-scanning
  * every file on every call — against (b) the incremental restat after
  * a small daily-shaped append, which must cost O(appended files), not
  * O(table).
  *
  * Usage: runMain graft.tools.RestatScale [stressDir]
  * Prints one JSON line; append the numbers to SCALE.md.
  */
object RestatScale {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val stressDir = args.lift(0).getOrElse("/tmp/graft_stress/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = "/tmp/graft_restat_scale/t"
    graft.tables.FsUtil.deleteRec(Paths.get("/tmp/graft_restat_scale"))
    val li = graft.core.Tables.load(spark, stressDir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_quantity"))
    val (_, tWrite) = time {
      li.repartitionByRange(64, col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey"))
        .write.mode("overwrite").parquet(base)
    }
    val nRows = spark.read.parquet(base).count()
    val (files, tFull) = time(StatsIndex.build(spark, base, Seq("l_orderkey")))
    // daily-shaped append: 0.1% of the table in 2 new files
    li.filter(col("l_orderkey") % 1000 === 0)
      .select((col("l_orderkey") + (1L << 40)).as("l_orderkey"),
        col("l_extendedprice"), col("l_quantity"))
      .repartitionByRange(2, col("l_orderkey"))
      .write.mode("append").parquet(base)
    val ((statted, carried), tIncr) =
      time(StatsIndex.buildIncremental(spark, base, Seq("l_orderkey")))
    // the old behavior after the same append: full rebuild
    val (_, tFull2) = time(StatsIndex.build(spark, base, Seq("l_orderkey")))
    val out =
      f"""{"rows":$nRows,"files":$files,"write_sec":$tWrite%.2f,
         |"full_build_sec":$tFull%.2f,
         |"incremental_restat_sec":$tIncr%.2f,
         |"statted":$statted,"carried":$carried,
         |"full_rebuild_after_append_sec":$tFull2%.2f}"""
        .stripMargin.replace("\n", "")
    Files.writeString(Paths.get("restat_scale.json"), out)
    println(out)
    spark.stop()
  }
}
