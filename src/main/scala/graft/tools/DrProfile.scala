package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for dim_round (not driver contract). */
object DrProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"[dr] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val silver = graft.queries.GoldQueries.silverView(spark, sfDir)
    val dr = graft.gold.GoldModels.dimRound(silver)
    println("[dr] plan has ObjectHash=" +
      dr.queryExecution.executedPlan.toString.contains("ObjectHashAggregate") +
      " SortAgg=" + dr.queryExecution.executedPlan.toString.contains("SortAggregate"))
    timed("dimRound") {
      dr.write.mode("overwrite").format("noop").save()
    }
    // find which aggregate is sort-based
    dr.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("SortAggregate"))
      .take(2).foreach(l => println("[dr] " + l.take(200)))
    spark.stop()
  }
}
