package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the fact_rounds rollup (not driver contract). */
object FrProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[fr] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val silver = graft.queries.GoldQueries.silverView(spark, sfDir)
    timed("silver scan only") {
      silver.select(col("course_id"), col("round_id")).write
        .mode("overwrite").format("noop").save()
    }
    timed("silver full width") {
      silver.write.mode("overwrite").format("noop").save()
    }
    timed("factRounds") {
      graft.gold.GoldModels.factRounds(silver).write
        .mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
