package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.gold.GoldModels
import graft.analytics.DashboardQueries2
import graft.llm.Dedup

/** Drift-immune A/B for the round-11 narrow-scan spread (not driver
  * contract): this sandbox shows co-tenant CPU bursts that corrupt
  * cross-run comparisons, so both variants of each probe run
  * INTERLEAVED in one JVM — A,B,A,B… — and the burst hits both sides
  * equally. Probes reconstruct representative gate bodies over
  * (a) the raw single-task scan and (b) the spread scan. */
object SpreadAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPREAD_AB_REPS", "7").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 1000000).selectExpr("sum(id * 2)", "count(distinct id % 7)")
      .write.mode("overwrite").format("noop").save()

    def li(spreadIt: Boolean): DataFrame = {
      val t = Tables.load(spark, sfDir, "lineitem")
      if (spreadIt) Tables.spreadIfNarrow(t) else t
    }
    def silver(spreadIt: Boolean): DataFrame =
      graft.queries.GoldQueries.syntheticSilver(li(spreadIt))
    def durS(spreadIt: Boolean): DataFrame =
      silver(spreadIt).withColumn("round_duration_minutes",
        col("goal_time") / 60.0 + col("current_section") * 5)
    def docs(spreadIt: Boolean): DataFrame = {
      val t = Tables.load(spark, sfDir, "documents")
      val dd = if (spreadIt) Tables.spreadIfNarrow(t) else t
      dd.unionByName(dd.select(
        (col("doc_id") + 20000).as("doc_id"),
        concat(col("text"), lit(" graftmarker")).as("text"),
        col("lang"), col("source"), col("n_chars")))
    }
    def docsSpreadAfter(): DataFrame = {
      val t = Tables.load(spark, sfDir, "documents")
      Tables.spreadIfNarrow(t.unionByName(t.select(
        (col("doc_id") + 20000).as("doc_id"),
        concat(col("text"), lit(" graftmarker")).as("text"),
        col("lang"), col("source"), col("n_chars"))))
    }

    val probes: Seq[(String, Boolean => DataFrame)] = Seq(
      ("gm_dim_round", b => GoldModels.dimRound(silver(b))
        .orderBy(col("course_id"), col("round_id"))),
      ("d41_round_validation", b => DashboardQueries2.roundValidation(durS(b))),
      ("d2_completion_rates", b => DashboardQueries2.globalCompletionRates(silver(b))),
      ("gm_time_patterns", b => GoldModels
        .globalTimePatterns(silver(b), exactPercentiles = true)
        .orderBy(col("course_id"), col("day_type"), col("time_bucket"),
          col("hour_of_day"))),
      ("minhash_pipeline", b => {
        val dd = if (b) docsSpreadAfter() else docs(false)
        Dedup.verifyJaccard(
          Dedup.minHashCandidates(dd, "doc_id", "text", 2, 8, 8),
          dd, "doc_id", "text", 2, 0.7)
      }),
      ("pca_moments", b => {
        val t = Tables.load(spark, sfDir, "embeddings")
        graft.llm.Pca.momentPairsPlan(
          if (b) Tables.spreadIfNarrow(t) else t, "embedding")
      }),
      ("substring_runs", b => {
        val dd = if (b) docsSpreadAfter() else docs(false)
        Dedup.sharedTokenRuns(dd, "doc_id", "text", 8, 16, Some(500L))
      }),
      ("winnow_postings", b => {
        val dd = (if (b) docsSpreadAfter() else docs(false))
          .filter(col("doc_id") % 20000 < 500)
        Dedup.winnowPostings(dd, "doc_id", "text", 8, 4, Some(500L))
      }),
      ("a14_rollup", b => {
        val l = li(b)
        val base = l.groupBy(col("l_orderkey")).agg(
          count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("decimal(18,4)")).as("q"),
          sum(when(col("l_returnflag") === "R", 1).otherwise(0)).as("r"))
        val dist = l.groupBy(col("l_orderkey")).agg(
          countDistinct(col("l_partkey")).as("p"),
          countDistinct(col("l_suppkey")).as("s"))
        base.join(dist, "l_orderkey")
      }),
      ("a23_percentile", b => li(b).groupBy(col("l_returnflag")).agg(
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("pa"),
        count(lit(1)).as("n")))
    )
    val results = scala.collection.mutable.Map[(String, Boolean), Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (r <- 1 to reps; (name, fn) <- probes; b <- Seq(false, true)) {
      val t0 = System.nanoTime()
      try fn(b).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[ab] $name spread=$b failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      results((name, b)) :+= dt
    }
    def med(xs: Seq[Double]) = xs.sorted.apply((xs.size - 1) / 2)
    for ((name, _) <- probes) {
      val a = results((name, false)).drop(2)
      val b = results((name, true)).drop(2)
      println(f"[ab] $name%-24s narrow=${med(a)}%6.3f spread=${med(b)}%6.3f " +
        f"ratio=${med(b) / med(a)}%5.2f  (narrow=${a.map(x => f"$x%.2f").mkString(",")} " +
        f"spread=${b.map(x => f"$x%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
