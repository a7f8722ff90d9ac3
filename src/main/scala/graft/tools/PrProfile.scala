package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Graph

/** Scratch phase profiler for the PageRank / CC / k-core fixpoint gates
  * (not driver contract): times edge construction, setup, the iteration
  * chain and the finish separately, so optimization targets the real
  * cost inside the 10 s l_pagerank_converged median instead of guessing. */
object PrProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the session like Bench does
    spark.range(0, 1000000).selectExpr("sum(id * 2)", "count(distinct id % 7)")
      .write.mode("overwrite").format("noop").save()
    graft.queries.GraphQueries.prewarmSharedCells(spark, sfDir)

    for (rep <- 1 to 2) {
      println(s"=== repetition $rep ===")
      for (sp <- Seq("32", "8", "1")) {
        spark.conf.set("spark.sql.shuffle.partitions", sp)
        val fn = graft.SparkEntry.queries("l_knn_pagerank")
        timed(s"sp=$sp l_knn_pagerank full")(
          fn(spark, sfDir).write.mode("overwrite").format("noop").save())
        val edges = graft.queries.GraphQueries.profEdges(spark, sfDir)
        val (pr, it) = timed(s"sp=$sp pageRankUntilConvergence (eager)")(
          Graph.pageRankUntilConvergence(edges, 0.5, 1e-5, 24, 4))
        println(s"[prprof] iters=$it")
        timed(s"sp=$sp pr finish consume")(
          pr.write.mode("overwrite").format("noop").save())
        val fnCc = graft.SparkEntry.queries("l_cc_deep_chain")
        timed(s"sp=$sp l_cc_deep_chain full")(
          fnCc(spark, sfDir).write.mode("overwrite").format("noop").save())
      }
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
      // size-based AQE coalescing (parallelismFirst=false): post-shuffle
      // partitions coalesce to advisory byte size instead of stopping at
      // defaultParallelism — the scale-adaptive setting the guide (§2.2)
      // recommends; measures what the bench session would see.
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      val edges2 = graft.queries.GraphQueries.profEdges(spark, sfDir)
      val (pr2, it2) = timed("pf=false sp=32 pageRankUntilConvergence")(
        Graph.pageRankUntilConvergence(edges2, 0.5, 1e-5, 24, 4))
      println(s"[prprof] iters=$it2")
      timed("pf=false pr finish consume")(
        pr2.write.mode("overwrite").format("noop").save())
      val fn2 = graft.SparkEntry.queries("l_knn_pagerank")
      timed("pf=false l_knn_pagerank full")(
        fn2(spark, sfDir).write.mode("overwrite").format("noop").save())
      val fnCc2 = graft.SparkEntry.queries("l_cc_deep_chain")
      timed("pf=false l_cc_deep_chain full")(
        fnCc2(spark, sfDir).write.mode("overwrite").format("noop").save())
      val fnK = graft.SparkEntry.queries("l_kcore_prune")
      timed("pf=false l_kcore_prune full")(
        fnK(spark, sfDir).write.mode("overwrite").format("noop").save())
      val fnPca = graft.SparkEntry.queries("l_pca_variance")
      timed("pf=false l_pca_variance full")(
        fnPca(spark, sfDir).write.mode("overwrite").format("noop").save())
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    }
    spark.stop()
  }
}
