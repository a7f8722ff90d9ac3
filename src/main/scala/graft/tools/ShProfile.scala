package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the SimHash near-dup pipeline (not part of the
  * driver contract). */
object ShProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = graft.core.Tables.load(spark, sfDir, "documents")
    val docs = docs0.unionByName(docs0.select(
      (col("doc_id") + 20000).as("doc_id"),
      concat(col("text"), lit(" graftmarker")).as("text"),
      col("lang"), col("source"), col("n_chars")))

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sh] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val keyed = timed("simhash keys") {
      val k = graft.llm.Dedup.withSimHash64(
        docs.select(col("doc_id").as("id"), col("text")), "text")
        .select(col("id"), col("simhash").as("key")).persist()
      println("  keys=" + k.count()); k
    }
    timed("distinct keys") {
      println("  distinct=" + keyed.select(col("key")).distinct().count())
    }
    timed("block bucket sizes") {
      val blocked = keyed.select(col("id"),
        posexplode(array((0 to 7).map(q =>
          shiftright(col("key"), q * 8).bitwiseAND(0xFFL)): _*))
          .as(Seq("bi", "bv")))
      blocked.groupBy("bi", "bv").count().agg(
        count(lit(1)).as("buckets"),
        max(col("count")).as("max_bucket"),
        sum(col("count") * col("count")).as("sum_sq")).show()
    }
    timed("full pipeline count") {
      println("  pairs=" + graft.llm.Dedup.simHashNearDups(
        docs, "doc_id", "text", n = 1, maxDistance = 7).count())
    }
    spark.stop()
  }
}
