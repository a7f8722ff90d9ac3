package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the MinHash pipeline stages (not part of the
  * driver contract). */
object MhProfile {
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
      println(f"[mh] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val shingled = timed("shingle+count") {
      val s = docs.select(col("doc_id"),
        graft.llm.Dedup.wordShingles(col("text"), 2).as("sh"))
      println("  rows=" + s.count()); s
    }
    timed("avg shingles") {
      shingled.select(avg(size(col("sh")))).show()
    }
    val banded = timed("bands") {
      val b = graft.llm.Dedup.minHashBands(docs, "doc_id", "text", 2, 8, 8).persist()
      println("  banded rows=" + b.count()); b
    }
    timed("bucket skew") {
      banded.groupBy(col("band_idx"), col("band_hash")).count()
        .orderBy(desc("count")).show(10)
    }
    timed("full nearDups") {
      val nd = graft.llm.Dedup.minHashNearDups(docs, "doc_id", "text", 2, 8, 8, 0.7)
      println("  plan:\n" + nd.queryExecution.optimizedPlan.treeString.linesIterator.take(25).mkString("\n"))
      println("  nearDups=" + nd.count())
    }
    timed("candidates") {
      val a = banded.select(col("band_idx"), col("band_hash"), col("id").as("id_a"))
      val b = banded.select(col("band_idx").as("bi2"), col("band_hash").as("bh2"),
        col("id").as("id_b"))
      val c = a.join(b, col("band_idx") === col("bi2") && col("band_hash") === col("bh2")
        && col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
      println("  candidates=" + c.count())
    }
    spark.stop()
  }
}
