package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{Graph, Similarity}

/** Scratch profiler for the embedding-graph gates (not driver contract):
  * times each stage — assignment, candidate join, edge ranking,
  * density, pagerank iterations — so floor-shaving targets the real
  * cost. */
object GraphProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[graph] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val vecs = graft.core.Tables.load(spark, sfDir, "embeddings")
    val n = timed("count")(vecs.count())
    val k = math.max(8L, (n + 255) / 256).toInt
    val centroids = timed("train")(
      Similarity.trainIvfCentroids(vecs, "embedding", k))
    val cells = timed("assign+write") {
      val c = Similarity.withIvfList(
          vecs.select(col("vec_id").as("id"), col("embedding").as("v")),
          "v", centroids)
        .filter(col("__ivf_list") >= 0)
        .select(col("id"), col("__ivf_list").as("cell"))
      c.write.mode("overwrite").parquet("/tmp/graph_prof_cells")
      spark.read.parquet("/tmp/graph_prof_cells")
    }
    val cands = cells.select(col("cell"), col("id").as("id_a"))
      .join(cells.select(col("cell"), col("id").as("id_b")), "cell")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    timed("candidates count")(println(cands.count()))
    val edges = Graph.knnEdgesFromCandidates(cands, vecs, "vec_id", "embedding", 4)
    timed("edges noop")(
      edges.write.mode("overwrite").format("noop").save())
    timed("edges noop again")(
      edges.write.mode("overwrite").format("noop").save())
    val pr = timed("pageRank build (eager iterations)")(
      Graph.pageRank(edges, 3, 0.85))
    timed("pageRank consume")(
      pr.write.mode("overwrite").format("noop").save())
    timed("density")(
      Graph.knnDensityPrune(Graph.knnEdgesFromCandidates(
          cands, vecs, "vec_id", "embedding", 8), 1.02)
        .write.mode("overwrite").format("noop").save())

    // synthetic control: same node/edge cardinality, no construction
    // upstream — isolates the iteration machinery's own cost
    val synth = spark.range(0, 8000).selectExpr(
      "id % 2000 as src", "(id * 7 + 13) % 2000 as dst")
    timed("pageRank synthetic 2000 nodes/8000 edges") {
      Graph.pageRank(synth, 3, 0.85)
        .write.mode("overwrite").format("noop").save()
    }
    // inline replica of the loop with per-stage timing
    locally {
      import org.apache.spark.sql.types._
      val e = synth.select(col("src"), col("dst")).persist()
      timed("  inline: e materialize")(e.count())
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val nodes = e.select(col("src").as("id")).distinct()
      val n1 = nodes.agg(count(lit(1)).as("n"))
      var ranks = nodes.crossJoin(broadcast(n1))
        .select(col("id"), col("n"), (lit(1.0) / col("n")).as("r")).persist()
      timed("  inline: r0 materialize")(ranks.count())
      for (i <- 1 to 3) {
        val contrib = e.join(deg, "src")
          .join(ranks.select(col("id").as("src"), col("r")), "src")
          .groupBy(col("dst").as("id"))
          .agg(sum((col("r") / col("outdeg")).cast(DecimalType(38, 18)))
            .cast(DoubleType).as("__s"))
        val next = ranks.select(col("id"), col("n"))
          .join(contrib, Seq("id"), "left")
          .select(col("id"), col("n"),
            ((lit(1.0) - lit(0.85)) / col("n") +
              lit(0.85) * coalesce(col("__s"), lit(0.0))).as("r"))
          .persist()
        timed(s"  inline: iter $i count")(next.count())
        ranks = next
      }
    }
    // same inline loop + per-iteration unpersist of the parent (what
    // Graph.pageRank does) — isolates the CacheManager-cascade cost
    locally {
      import org.apache.spark.sql.types._
      val synth2 = spark.range(0, 8000).selectExpr(
        "id % 2000 as src", "(id * 11 + 5) % 2000 as dst")
      val e = synth2.select(col("src"), col("dst")).persist()
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val nodes = e.select(col("src").as("id")).distinct()
      val n1 = nodes.agg(count(lit(1)).as("n"))
      var ranks = nodes.crossJoin(broadcast(n1))
        .select(col("id"), col("n"), (lit(1.0) / col("n")).as("r")).persist()
      var previous: Option[org.apache.spark.sql.DataFrame] = None
      for (i <- 1 to 3) {
        val contrib = e.join(deg, "src")
          .join(ranks.select(col("id").as("src"), col("r")), "src")
          .groupBy(col("dst").as("id"))
          .agg(sum((col("r") / col("outdeg")).cast(DecimalType(38, 18)))
            .cast(DoubleType).as("__s"))
        val next = ranks.select(col("id"), col("n"))
          .join(contrib, Seq("id"), "left")
          .select(col("id"), col("n"),
            ((lit(1.0) - lit(0.85)) / col("n") +
              lit(0.85) * coalesce(col("__s"), lit(0.0))).as("r"))
          .persist()
        timed(s"  unp-variant: iter $i count")(next.count())
        timed(s"  unp-variant: iter $i unpersist") {
          previous.foreach(_.unpersist())
        }
        previous = Some(ranks)
        ranks = next
      }
    }
    spark.stop()
  }
}
