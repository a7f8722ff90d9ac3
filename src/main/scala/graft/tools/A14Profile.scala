package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler decomposing a14_mega_rollup cost (not driver contract). */
object A14Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      // warm-ish: run twice, report second
      df.write.mode("overwrite").format("noop").save()
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[a14] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    println("[a14] rows=" + li.count())
    val base = li.groupBy(col("l_orderkey")).agg(
      count(lit(1)).as("n_lines"),
      min(col("l_shipdate")).as("first_ship"),
      sum(col("l_quantity")).as("q"))
    timed("plain rollup")(base)
    timed("plain rollup + orderBy")(base.orderBy(col("l_orderkey")))
    val dd = li.groupBy(col("l_orderkey")).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_sups"))
    timed("two countDistinct")(dd)
    val full = graft.queries.Corpus.queries("a14_mega_rollup")(spark, sfDir)
    timed("full a14")(full)
    spark.stop()
  }
}
