package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{Graph, Similarity}

/** Measured evidence for [[graft.llm.Graph.pageRankUntilConvergence]]'s
  * bounded-plan-depth claim at graph scale: on the ×factor stress
  * replica's embedding k-NN graph, a 25-iteration convergence-mode run
  * (tol=0 forces the full unroll through the block/checkpoint machinery)
  * must cost ~5× a 5-iteration run — LINEAR in iterations. An unbounded
  * lazy unroll fails this two ways long before 25 iterations: plan
  * compile time grows super-linearly with depth, and past ~30 levels
  * the driver stalls building plan strings (the 2^iters teleport trap's
  * milder cousin). A real-tolerance run reports where the fixpoint
  * actually lands, so the 25-iteration depth is shown to be the regime
  * convergence-length runs genuinely reach, not a synthetic worst case.
  *
  * Edge construction mirrors the l_knn_pagerank gate's shape (cell-keyed
  * k-NN inside IVF cells) built from public APIs: two-level quantizer at
  * the stress scale (the >64-cell regime the gate itself switches to),
  * k=4 neighbors. The edge build is timed separately and excluded from
  * the per-iteration claim.
  *
  * Usage: runMain graft.tools.PrConvScale [stressDir] [out.json]
  * (default /tmp/graft_stress/x100). Prints one JSON line; append the
  * numbers to SCALE.md.
  */
object PrConvScale {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val stressDir = args.headOption.getOrElse("/tmp/graft_stress/x100")
    val outPath = args.lift(1).getOrElse("prconv_scale.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-prconv-scale")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/tmp/graft_stress_spill")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs = graft.core.Tables.load(spark, stressDir, "embeddings")
    val n = vecs.count()
    val kk = math.max(8L, (n + 255) / 256).toInt
    println(s"[prconv] $n vectors -> $kk cells")
    val spread = vecs
      .select(col("vec_id").as("id"), col("embedding").as("v"))
      .repartition(spark.sparkContext.defaultParallelism)
    val (edges, tEdges) = time {
      val cells =
        if (kk <= 64)
          Similarity.withIvfList(spread, "v",
            Similarity.trainIvfCentroids(vecs, "embedding", kk))
        else {
          val (coarse, subs) =
            Similarity.trainTwoLevelIvf(vecs, "embedding", kk)
          Similarity.withTwoLevelIvfList(spread, "v", coarse, subs)
        }
      val e = Graph.knnEdgesWithinCells(
        cells.filter(col("__ivf_list") >= 0)
          .select(col("id"), col("__ivf_list").as("cell"), col("v")),
        k = 4)
        .select(col("src"), col("dst"))
        .persist()
      e.count() // materialize: iteration timings must not absorb the build
      e
    }
    println(f"[prconv] edge build $tEdges%.1f s")

    def run(maxIters: Int, tol: Double): (Int, Double) = {
      val ((_, iters), t) = time {
        val (pr, it) = Graph.pageRankUntilConvergence(
          edges, damping = 0.85, tol = tol, maxIters = maxIters,
          checkEvery = 10)
        pr.write.mode("overwrite").format("noop").save()
        // release the run's structural persists so the next timing
        // doesn't inherit this run's cache (edge frame above persists
        // OUTSIDE persistOnce and survives)
        (pr, it)
      }
      Graph.clearRetainedCaches(spark)
      (iters, t)
    }

    // warm-up (codegen + the first-touch costs), then the two fixed-
    // depth runs the linearity claim compares, then the real-tolerance
    // run that shows where convergence actually lands.
    run(2, 0.0)
    val (i5, t5) = run(5, 0.0)
    println(f"[prconv] 5 iters: $t5%.1f s")
    val (i25, t25) = run(25, 0.0)
    println(f"[prconv] 25 iters: $t25%.1f s")
    val (iConv, tConv) = run(200, 1e-12)
    println(f"[prconv] tol=1e-12 converged at $iConv iters in $tConv%.1f s")
    val perIterRatio = (t25 / 25.0) / (t5 / 5.0)
    val json =
      f"""{"stress_dir":"$stressDir","n_vectors":$n,"cells":$kk,
         |"edge_build_sec":$tEdges%.1f,
         |"iters_5_sec":$t5%.2f,"iters_25_sec":$t25%.2f,
         |"per_iter_ratio_25_vs_5":$perIterRatio%.3f,
         |"converged_iters_tol1e12":$iConv,"converged_sec":$tConv%.2f,
         |"heap_gb":${Runtime.getRuntime.maxMemory / (1L << 30)}}"""
        .stripMargin.replace("\n", "")
    Files.writeString(Paths.get(outPath), json)
    println(json)
    assert(i5 == 5 && i25 == 25, "tol=0 must run the full maxIters")
    spark.stop()
  }
}
