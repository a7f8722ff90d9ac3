package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.SparkSpec
import graft.core.Tables

/** Value-level checks for the embedding-graph operators (the corpus
  * gates l_knn_density_prune / l_knn_pagerank verify the LSH-candidate
  * path against DuckDB; this spec pins the exact-vs-candidate
  * equivalence and the analytic invariants DuckDB can't express).
  */
class GraphSpec extends SparkSpec {

  private lazy val vecs =
    Tables.load(spark, sfDir, "embeddings").filter(col("vec_id") < 120)

  test("knnEdgesFromCandidates over ALL canonical pairs equals exact knnEdges") {
    val ids = vecs.select(col("vec_id").as("id_a"))
    val allPairs = ids.crossJoin(vecs.select(col("vec_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    val fromCands = Graph.knnEdgesFromCandidates(
      allPairs, vecs, "vec_id", "embedding", k = 5)
    val exact = Graph.knnEdges(vecs, "vec_id", "embedding", k = 5)
    assert(fromCands.exceptAll(exact).isEmpty &&
      exact.exceptAll(fromCands).isEmpty)
  }

  test("knnEdgesWithinCells equals the candidates-then-fetch form per cell") {
    val cells = vecs.select(col("vec_id").as("id"),
      (col("vec_id") % 3).as("cell"), col("embedding").as("v"))
    val viaHeap = Graph.knnEdgesWithinCells(cells, k = 5)
    val cands = cells.select(col("cell"), col("id").as("id_a"))
      .join(cells.select(col("cell"), col("id").as("id_b")), "cell")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val viaWindow = Graph.knnEdgesFromCandidates(
      cands, vecs, "vec_id", "embedding", k = 5)
    assert(viaHeap.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaHeap).isEmpty,
      "bounded-heap ranking must match the window ranking edge-for-edge")
  }

  test("pageRank over a symmetric k-NN graph conserves rank mass") {
    val edges = Graph.knnEdges(vecs, "vec_id", "embedding", k = 4)
    val pr = Graph.pageRank(edges, iters = 3, damping = 0.85)
    // every dst of a symmetrized k-NN graph is also a src, so no rank
    // mass leaks: sum r == 1 up to float addition error
    val total = pr.agg(sum(col("r").cast(DecimalType(38, 18)))
      .cast(DoubleType)).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"rank mass $total != 1")
    val n = pr.count()
    assert(n == vecs.count(), "every node keeps a rank row")
    // teleport floor: no rank below (1-d)/n
    val floor = 0.15 / n - 1e-12
    assert(pr.filter(col("r") < floor).isEmpty)
  }

  test("pageRank is deterministic across partitionings") {
    val edges = Graph.knnEdges(vecs, "vec_id", "embedding", k = 4)
    val a = Graph.pageRank(edges, iters = 3, damping = 0.85)
    val b = Graph.pageRank(edges.repartition(7), iters = 3, damping = 0.85)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "decimal-accumulated iterations must be partitioning-invariant")
  }

  test("knnDensityPrune flags a strict, non-trivial dense subset") {
    val edges = Graph.knnEdges(vecs, "vec_id", "embedding", k = 8)
    val den = Graph.knnDensityPrune(edges, marginFactor = 1.0)
    val n = den.count()
    assert(n == vecs.count())
    // densities are cosines: bounded
    assert(den.filter(col("density") < -1.0 || col("density") > 1.0).isEmpty)
    // with marginFactor 1.0 the threshold is the mean: some node is
    // above it and some is not (constant density would need a perfectly
    // regular geometry the synthetic embeddings don't have)
    val pruned = den.filter(col("pruned")).count()
    assert(pruned > 0 && pruned < n, s"pruned $pruned of $n")
  }
}
