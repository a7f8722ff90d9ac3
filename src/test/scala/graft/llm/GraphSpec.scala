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

  test("pageRankUntilConvergence with tol=0 is bit-identical to the unrolled form") {
    val edges = Graph.knnEdges(vecs, "vec_id", "embedding", k = 4)
    // tol=0 never satisfies `l1 < tol`, so exactly maxIters run — and
    // checkEvery=2 forces uneven blocks (2+2+1), exercising the block
    // boundary / localCheckpoint seams
    val (conv, it) = Graph.pageRankUntilConvergence(
      edges, damping = 0.85, tol = 0.0, maxIters = 5, checkEvery = 2)
    assert(it === 5)
    val unrolled = Graph.pageRank(edges, iters = 5, damping = 0.85)
    assert(conv.exceptAll(unrolled).isEmpty && unrolled.exceptAll(conv).isEmpty,
      "shared prStep must make both entry points bit-identical at equal iters")
  }

  test("pageRankUntilConvergence stops early under a real tolerance") {
    val edges = Graph.knnEdges(vecs, "vec_id", "embedding", k = 4)
    val (conv, it) = Graph.pageRankUntilConvergence(
      edges, damping = 0.85, tol = 1e-7, maxIters = 100, checkEvery = 5)
    assert(it < 100, s"expected early stop, ran all $it iterations")
    assert(it % 5 === 0, "iterations advance in whole blocks")
    // the converged vector is still a proper rank vector
    val total = conv.agg(sum(col("r").cast(DecimalType(38, 18)))
      .cast(DoubleType)).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"rank mass $total != 1")
    // and genuinely converged: one more unrolled step barely moves it
    val more = Graph.pageRank(edges, iters = it + 1, damping = 0.85)
    val drift = conv.select(col("id"), col("r"))
      .join(more.select(col("id"), col("r").as("r2")), "id")
      .agg(sum(abs(col("r") - col("r2")).cast(DecimalType(38, 18)))
        .cast(DoubleType)).head.getDouble(0)
    assert(drift < 1e-7, s"post-stop step moved L1 by $drift")
  }

  test("pageRankUntilConvergence holds 25 iterations with bounded plan depth") {
    val edges = Graph.knnEdges(vecs, "vec_id", "embedding", k = 4)
    // ≥20 iterations across 3 checkpointed blocks: the per-block
    // localCheckpoint keeps every lazy segment ≤ checkEvery levels deep
    // no matter how long convergence takes
    val (conv, it) = Graph.pageRankUntilConvergence(
      edges, damping = 0.85, tol = 0.0, maxIters = 25, checkEvery = 10)
    assert(it === 25)
    val unrolled = Graph.pageRank(edges, iters = 25, damping = 0.85)
    assert(conv.exceptAll(unrolled).isEmpty && unrolled.exceptAll(conv).isEmpty)
  }

  test("non-converged connectedComponents still yields ONE label row per id") {
    import spark.implicits._
    // a 64-deep chain needs ~8 contraction rounds; cap at 2 to force the
    // non-converged exit, which must collapse to one (possibly stale)
    // label per id — a multi-row-per-id frame would break every
    // downstream join grain (canonicalizeNearDups' left join)
    val n = 64
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = Graph.ccWithRounds(edges, maxRounds = 2)
    assert(rounds === 2)
    val perId = labels.groupBy(col("id")).agg(count(lit(1)).as("c"))
    assert(perId.filter(col("c") > 1).isEmpty,
      "non-converged exit must stay node-grain")
    assert(labels.count() === n.toLong, "every incident node keeps a label")
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

  // ------------------------------------------- connected components

  /** Driver-side union-find ground truth for small random graphs. */
  private def unionFind(
      nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-id labeling: the root chosen above is always the smaller id
    nodes.map(n => n -> find(n)).toMap
  }

  test("connectedComponents matches union-find on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 10
      val nodes = (0L until n).toSeq
      val m = rnd.nextInt(2 * n) + n / 2
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val expected = unionFind(nodes, edges)
      val got = Dedup.canonicalizeNearDups(
          nodes.toDF("id"), edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial: n=$n m=$m")
      // independent engine baseline: label propagation (O(diameter)
      // rounds — fine at this scale) must agree edge-for-edge
      val lp = Dedup.canonicalizeNearDupsLabelProp(
          nodes.toDF("id"), edges.toDF("id_a", "id_b"), maxIter = 100)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lp === expected, s"label-prop baseline diverged on trial $trial")
    }
  }

  test("star contraction converges in O(log d) rounds on a 200-deep path") {
    import spark.implicits._
    val n = 200
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = Graph.ccWithRounds(edges, maxRounds = 20)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === n)
    assert(got.values.forall(_ == 0L), "all labels must reach the chain min")
    // ⌈log₂ 200⌉ = 8; allow slack for the contraction constant. Label
    // propagation would need 199 rounds on this graph — the point.
    assert(rounds <= 12, s"contraction took $rounds rounds on diameter $n")
  }

  test("connectedComponents handles self-loops, duplicates and orientation") {
    import spark.implicits._
    val edges = Seq(
      (5L, 5L),          // self-loop: dropped
      (3L, 1L), (1L, 3L),// both orientations of one edge
      (2L, 1L), (2L, 1L) // duplicate
    ).toDF("src", "dst")
    val got = Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 5 had only a self-loop: absent from edge-incident labels —
    // the caller (canonicalizeNearDups) owns singleton labeling
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val canon = Dedup.canonicalizeNearDups(
        Seq(1L, 2L, 3L, 5L, 9L).toDF("id"),
        Seq((5L, 5L), (3L, 1L), (2L, 1L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 9L -> 9L))
  }

  /** Driver-side reference peel for small graphs. */
  private def refKCore(
      edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var es = edges.filter(e => e._1 != e._2).distinct
    var changed = true
    while (changed) {
      val deg = es.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (id, xs) => id -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != es.size
      es = next
    }
    es.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (id, xs) => id -> xs.size }
  }

  test("kCore matches the driver reference peel on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val n = 40 + trial * 15
      val edges = Seq.fill(3 * n)(
          (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .distinct
      val expected = refKCore(edges, 3)
      val (core, rounds, converged) =
        Graph.kCore(edges.toDF("src", "dst"), coreK = 3)
      assert(converged, s"trial $trial must reach the fixpoint")
      val got = core.collect()
        .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got === expected, s"trial $trial: n=$n m=${edges.size}")
      assert(rounds <= edges.size, "rounds bounded by removals")
    }
  }

  test("kCore peels a fringe chain off a clique and respects maxRounds") {
    import spark.implicits._
    // K5 clique (degree 4 each) + a 6-node path hanging off one corner:
    // the 2-core keeps the clique, peels the whole path end-inward
    val clique = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val path = (0 until 6).map(i => (4L + i, 5L + i)) // 4-5-6-...-10
    val all = (clique ++ path).toDF("src", "dst")
    val (core, rounds, converged) = Graph.kCore(all, coreK = 2)
    assert(converged)
    val ids = core.collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(0L, 1L, 2L, 3L, 4L), "only the clique survives")
    assert(rounds >= 5, "a 6-node path peels one end-pair per round")
    // the same graph under a too-small cap exits unconverged, still
    // one row per id
    val (partial, r2, c2) = Graph.kCore(all, coreK = 2, maxRounds = 2)
    assert(!c2 && r2 === 2)
    val perId = partial.groupBy(col("id")).agg(count(lit(1)).as("c"))
    assert(perId.filter(col("c") > 1).isEmpty)
  }

  test("kCore canonicalizes both-orientations and duplicate edge input") {
    import spark.implicits._
    // K4 on {0..3}: canonical one-row-per-pair form vs the common
    // both-orientations representation PLUS duplicate rows. Without
    // input canonicalization the latter doubles every degree and the
    // 3-core keeps nodes whose true degree is below 3.
    val canonical = (for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b))
      .toDF("src", "dst")
    val noisy = (for (a <- 0L to 3L; b <- 0L to 3L; if a != b)
      yield (a, b)).toDF("src", "dst")
      .unionAll((for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b))
        .toDF("src", "dst"))
    val (c1, _, ok1) = Graph.kCore(canonical, coreK = 3)
    val (c2, _, ok2) = Graph.kCore(noisy, coreK = 3)
    assert(ok1 && ok2)
    val r1 = c1.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val r2 = c2.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(r1.toSeq === r2.toSeq)
    assert(r1.map(_._2).forall(_ === 3L), "K4's 3-core degree is 3")
    // and a graph that ONLY looks core-worthy with doubled degrees
    // (a triangle, coreK=3) cores out empty under either representation
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val triBoth = (tri ++ tri.map(_.swap)).toDF("src", "dst")
    val (c3, _, _) = Graph.kCore(triBoth, coreK = 3)
    assert(c3.isEmpty, "double-counted orientations must not fake a 3-core")
  }

  test("pageRankUntilConvergence on an empty edge frame exits gracefully") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val (pr, it) = Graph.pageRankUntilConvergence(
      empty, damping = 0.85, tol = 1e-6, maxIters = 12, checkEvery = 4)
    assert(pr.isEmpty, "no nodes, no ranks — same as the fixed-iters path")
    assert(it === 4, "the first block's zero drift converges it")
  }

  test("kCore of an empty or all-self-loop list is empty and converged") {
    import spark.implicits._
    val (c1, r1, ok1) = Graph.kCore(
      Seq.empty[(Long, Long)].toDF("src", "dst"), coreK = 2)
    assert(ok1 && r1 === 0 && c1.isEmpty)
    val (c2, r2, ok2) = Graph.kCore(
      Seq((7L, 7L)).toDF("src", "dst"), coreK = 1)
    assert(ok2 && r2 === 0 && c2.isEmpty)
  }

  test("connectedComponents of an empty pair list labels nothing") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.connectedComponents(empty).isEmpty)
  }
}
