package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.{Graph, Similarity}

/** Embedding-graph gates: k-NN-graph density pruning (the D4-style
  * "drop the over-represented regions" diversification step) and damped
  * PageRank centrality over the same graph (representative / canonical
  * selection inside similarity neighborhoods) — the corpus' first
  * iterative-fixpoint operator.
  *
  * Graph construction is CLUSTER-BOUNDED, the SemDeDup/D4 recipe and
  * the only shape that stays linear on a uniform embedding corpus:
  * an auto-k IVF assignment (k ∝ n, mean cell size pinned — exactly
  * `semanticDedupPairsAuto`'s argument; the testdata embeddings are
  * uniform on the unit sphere, where E2LSH buckets are fixed spatial
  * regions and their occupancy — hence candidate pairs — grows n²)
  * caps each node's candidate set at its own cell, then exact cosine +
  * per-node top-k rank inside the cell. The quantizer is seed/engine-
  * specific, so the gates materialize the (id, cell) ASSIGNMENT — a
  * linear artifact, never the quadratic pair list — and DuckDB derives
  * the within-cell pairs, the ranking, and everything downstream
  * independently. */
object GraphQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  private val OracleScratch = QueryDef.oracleScratch

  private def materialize(df: DataFrame, name: String): DataFrame = {
    val path = s"$OracleScratch/$name"
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Mean cell size the auto-k quantizer targets: small enough that a
    * cell's all-pairs cosine block stays cheap, large enough that every
    * node sees well over k candidates. Within-cell pair volume is
    * ~n·CellTarget/2 — linear in the corpus. */
  private val CellTarget = 256L

  /** Skew guard (the bucketCap/dfCap discipline applied to cells):
    * auto-k pins the MEAN cell size, but a skewed embedding mass — one
    * mega-cluster holding most of the corpus — still lands in one cell
    * and its within-cell join goes quadratic. Cells above this cap
    * split deterministically by id-hash into ⌈size/cap⌉ sub-cells;
    * neighborhoods inside a mega-cell become approximate (each node
    * ranks within its sub-cell — the capped-cluster approximation
    * SemDeDup-family pipelines make), and candidate volume stays
    * ≤ size·cap per cell. At 4×CellTarget the cap never binds on a
    * balanced assignment, so unskewed results are exact. */
  private val CellCap = 4 * CellTarget

  /** Mean cell size for the FORCED two-level assignment
    * ([[twoLevelCellAssignment]]): small enough that kk far exceeds the
    * production two-level threshold (64) at EVERY verify scale — at
    * sf0.01's 500 vectors, kk = ⌈500/6⌉ = 84 — so the scale path runs
    * under the driver's DuckDB hash check, not only in ScalaTest and
    * the unchecked ×100 harness. */
  private val TwoLevelCellTarget = 6L

  private val cellsCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  /** Shared assignment builder: auto-k (k ∝ n/cellTarget) quantization
    * of the embeddings table into (id, cell), oversize cells sub-split,
    * materialized to scratch under `name` and persisted — the quantizer
    * is an INDEX by production contract (`cachedIndex` /
    * `cachedFactRounds` discipline): built once, probed by every graph
    * query. The materialized copy is what the DuckDB oracles derive
    * their pairs from (sub-splitting included — the oracle sees only
    * the final cell key). */
  private def buildAssignment(
      s: SparkSession, d: String, name: String, cellTarget: Long,
      cellCap: Long, forceTwoLevel: Boolean): DataFrame =
    cellsCache.computeIfAbsent((s, d, name), { k =>
      val vecs = t(k._1, k._2, "embeddings")
      val n = vecs.count()
      val kk = math.max(8L, (n + cellTarget - 1) / cellTarget).toInt
      // The assignment kernel runs per ROW over a byte-compact columnar
      // input: a single 50 MB parquet file is one scan task by
      // maxPartitionBytes, which serializes ~10¹⁰ multiply-adds on one
      // core at ×100. Repartition to the session's parallelism first —
      // a node-grain shuffle, trivial next to the compute it unblocks.
      val spread = vecs.select(col("vec_id").as("id"), col("embedding").as("v"))
        .repartition(k._1.sparkContext.defaultParallelism)
      // Auto-k makes the FLAT quantizer's assignment O(n·k·dim) =
      // O(n²·dim/CellTarget) — measured ×100 slope 1.41 on this gate.
      // Above the small-corpus regime, switch to the two-level
      // (IVF-in-IVF) quantizer: (√k + √k)·dim per row, which holds the
      // assignment below the gate's linear terms through ~10⁸ vectors.
      // The threshold keeps verify-scale corpora (sf ≤ 0.1 → kk ≤ 20)
      // on the flat path for the DEFAULT assignment, so its
      // materialized cells — and every oracle derivation downstream —
      // are bit-identical to before; the forced gate exercises the
      // two-level path at every scale.
      val listed =
        if (!forceTwoLevel && kk <= 64)
          Similarity.withIvfList(spread, "v",
            Similarity.trainIvfCentroids(vecs, "embedding", kk))
        else {
          val (coarse, subs) =
            Similarity.trainTwoLevelIvf(vecs, "embedding", kk)
          Similarity.withTwoLevelIvfList(spread, "v", coarse, subs)
        }
      val assigned = listed
        .filter(col("__ivf_list") >= 0) // unassignable: no pseudo-cluster
        .select(col("id"), col("__ivf_list").as("cell"))
      // cell-size census is cell-grain (tiny) — broadcast back for the
      // oversize sub-split; balanced assignments take sub = 0 everywhere
      val sizes = assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("__csz"))
      materialize(
        assigned.join(broadcast(sizes), "cell")
          .select(col("id"),
            concat(col("cell"), lit(":"),
              when(col("__csz") <= cellCap, lit(0L)).otherwise(
                pmod(xxhash64(col("id")),
                  ceil(col("__csz") / lit(cellCap.toDouble))
                    .cast("long")))).as("cell")),
        name).persist()
    })

  /** The production auto-k assignment every standing graph gate reads
    * (flat quantizer below the 64-cell threshold). */
  private[queries] def cellAssignment(s: SparkSession, d: String): DataFrame =
    buildAssignment(s, d, "knn_cells", CellTarget, CellCap,
      forceTwoLevel = false)

  /** The FORCED two-level assignment (`trainTwoLevelIvf` →
    * `withTwoLevelIvfList`, the ≥10⁸-vector scale path) at a cell
    * target small enough that kk > 64 at verify scale — built so a
    * driver-hash-checked gate exercises the exact code the big-corpus
    * branch of [[cellAssignment]] runs. */
  private[queries] def twoLevelCellAssignment(
      s: SparkSession, d: String): DataFrame =
    buildAssignment(s, d, "twolevel_cells", TwoLevelCellTarget,
      4 * TwoLevelCellTarget, forceTwoLevel = true)

  /** Bench hook, same contract as `LlmQueries.prewarmSharedIndexes`: the
    * assignment is production-materialized, so no gate's median should
    * absorb its cold build. */
  def prewarmSharedCells(s: SparkSession, d: String): Unit = {
    cellAssignment(s, d).write.mode("overwrite").format("noop").save()
    twoLevelCellAssignment(s, d).write.mode("overwrite").format("noop").save()
  }

  /** Lifecycle hook, the prewarm's twin: evict this session's cached
    * cell assignments (unpersist the frames, drop the map entries). The
    * cache is keyed by (session, sfDir) and deliberately never evicts on
    * its own — correct for the bench/verify lifecycle where the JVM ends
    * with the run, but a LONG-LIVED multi-tenant session iterating over
    * many sfDirs would accumulate node-grain persisted frames without
    * bound. Verify/Bench call the aggregate hook
    * ([[graft.SparkEntry.clearSharedCaches]]) when their query phase
    * ends; embedding sessions should do the same between workloads. */
  def clearSharedCells(s: SparkSession): Unit = {
    val it = cellsCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) { // both assignments: keys are (session, dir, name)
        try e.getValue.unpersist() catch { case _: Throwable => () }
        it.remove()
      }
    }
  }

  /** The materialized assignment re-joined with its vectors — the
    * (id, cell, v) frame [[Graph.knnEdgesWithinCells]] consumes. One
    * node-grain equi-join; the cell self-join downstream then carries
    * the payloads in its single shuffle. */
  private def cellsWithVectors(s: SparkSession, d: String): DataFrame =
    withVectors(s, d, cellAssignment(s, d))

  /** Profiling hook (tools.PrProfile): the 4-NN edge frame the graph
    * gates consume, exposed so phase timings can split edge
    * construction from the fixpoint iteration. Not driver contract. */
  private[graft] def profEdges(s: SparkSession, d: String): DataFrame =
    Graph.knnEdgesWithinCells(cellsWithVectors(s, d), k = 4)

  private def twoLevelCellsWithVectors(s: SparkSession, d: String): DataFrame =
    withVectors(s, d, twoLevelCellAssignment(s, d))

  private def withVectors(
      s: SparkSession, d: String, cells: DataFrame): DataFrame =
    cells.join(
      t(s, d, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("v")),
      "id")

  /** Shared oracle prefix: read the materialized assignment, derive
    * directed within-cell pairs, exact cosine, per-src top-k rank. */
  private def edgeSql(cells: String, k: Int): String =
    s"""v AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         FROM embeddings
       ),
       cells AS (SELECT id, cell FROM read_parquet('$OracleScratch/$cells/*.parquet')),
       ce AS (
         SELECT a.id AS src, b.id AS dst
         FROM cells a JOIN cells b ON a.cell = b.cell AND a.id <> b.id
       ),
       p AS (
         SELECT ce.src, ce.dst,
           list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i])) /
             (SQRT(list_sum(list_transform(a.e, x -> x * x))) *
              SQRT(list_sum(list_transform(b.e, x -> x * x)))) AS cosine
         FROM ce JOIN v a ON a.vec_id = ce.src JOIN v b ON b.vec_id = ce.dst
       ),
       e AS (
         SELECT src, dst, cosine FROM (
           SELECT src, dst, cosine, ROW_NUMBER() OVER (PARTITION BY src
             ORDER BY cosine DESC NULLS LAST, dst ASC NULLS LAST) AS rk
           FROM p
         ) WHERE rk <= $k
       )"""

  /** Generated oracle for the CONVERGENCE-mode PageRank gate: unrolls
    * `maxIters` power-iteration levels (the l_knn_pagerank CTE shape),
    * computes the consecutive-level L1 drift at every `checkEvery`
    * block boundary with the same decimal-exact arithmetic the engine
    * uses, picks the FIRST boundary whose drift is below `tol` (else
    * `maxIters`) — i.e. the oracle re-derives the STOPPING DECISION
    * itself, not just the rank values — and reads the final ranks off
    * that boundary's level. `maxIters` must be a multiple of
    * `checkEvery` so the no-convergence fallback is itself a boundary
    * level. `dampingSql`/`tolSql` are the exact literals the Spark side
    * passes as doubles (both engines parse to the same IEEE double, so
    * the `< tol` comparisons agree bit-for-bit). */
  private def prConvSql(cells: String, k: Int, dampingSql: String,
      tolSql: String, maxIters: Int, checkEvery: Int): String = {
    require(maxIters % checkEvery == 0)
    // Every generated CTE is MATERIALIZED: each level references its
    // predecessor twice (the contribution join + the teleport LEFT
    // JOIN), and DuckDB inlines plain CTEs per reference — the same
    // 2^iters expansion trap the engine's lazy plan avoids by design
    // (Graph.pageRank scaladoc). Un-materialized, binding 24 levels
    // exhausted the binder before ever executing.
    val levels = (1 to maxIters).map { i =>
      s"""s$i AS MATERIALIZED (
            SELECT em.dst AS id,
              CAST(SUM(CAST(r.r / deg.outdeg AS DECIMAL(38,18))) AS DOUBLE) AS s
            FROM em JOIN r${i - 1} r ON r.id = em.src JOIN deg ON deg.src = em.src
            GROUP BY em.dst
          ),
          r$i AS MATERIALIZED (
            SELECT r${i - 1}.id, r${i - 1}.n,
              (1.0e0 - $dampingSql) / r${i - 1}.n +
                $dampingSql * COALESCE(s$i.s, 0e0) AS r
            FROM r${i - 1} LEFT JOIN s$i ON s$i.id = r${i - 1}.id
          )""".stripMargin
    }.mkString(",\n")
    val boundaries = checkEvery to maxIters by checkEvery
    val deltas = boundaries.map { b =>
      s"""d$b AS MATERIALIZED (
            SELECT CAST(SUM(CAST(ABS(cur.r - prv.r) AS DECIMAL(38,18)))
              AS DOUBLE) AS l
            FROM r$b cur JOIN r${b - 1} prv ON prv.id = cur.id
          )"""
    }.mkString(",\n")
    val convCase = boundaries
      .map(b => s"WHEN (SELECT l FROM d$b) < $tolSql THEN $b")
      .mkString(" ")
    val fin = boundaries
      .map(b => s"SELECT id, r FROM r$b WHERE (SELECT it FROM conv) = $b")
      .mkString(" UNION ALL ")
    s"""WITH ${edgeSql(cells, k)},
        em AS MATERIALIZED (SELECT src, dst FROM e),
        deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM em GROUP BY src),
        nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM em),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        r0 AS MATERIALIZED (SELECT id, n, 1.0e0 / n AS r FROM nodes CROSS JOIN nn),
        $levels,
        $deltas,
        conv AS MATERIALIZED (SELECT CASE $convCase ELSE $maxIters END AS it),
        fin AS MATERIALIZED ($fin),
        indeg AS (SELECT dst AS id, COUNT(*) AS c FROM em GROUP BY dst)
        SELECT pr_rank, vec_id, in_deg, pagerank, iters FROM (
          SELECT fin.id AS vec_id,
            CAST(COALESCE(indeg.c, 0) AS BIGINT) AS in_deg,
            ROUND(fin.r, 9) AS pagerank,
            CAST((SELECT it FROM conv) AS INT) AS iters,
            ROW_NUMBER() OVER (
              ORDER BY fin.r DESC NULLS LAST, fin.id ASC) AS pr_rank
          FROM fin LEFT JOIN indeg ON indeg.id = fin.id
        ) WHERE pr_rank <= 20
        ORDER BY pr_rank"""
  }

  /** Generated oracle for the k-core gate: unrolls `rounds` peel steps
    * (each = a degree census HAVING >= coreK + an endpoint filter) as
    * MATERIALIZED CTEs (same inlining-blowup rationale as
    * [[prConvSql]]), re-derives the ROUND COUNT from the first step
    * whose edge count stops shrinking (peeling is idempotent at the
    * fixpoint, so the final level is always g_rounds), and emits the
    * survivors with their in-core degree. A removal round always
    * strictly shrinks the edge list (every node in it has degree ≥ 1),
    * so "edge count unchanged" ⟺ "the engine's probe found nothing to
    * remove" — the convergence flag is (rounds < maxRounds) on both
    * engines. */
  private def kCoreSql(cells: String, k: Int, coreK: Int,
      rounds: Int): String = {
    val gs = (1 to rounds).map { i =>
      s"""n$i AS MATERIALIZED (
            SELECT id FROM (
              SELECT u AS id FROM g${i - 1}
              UNION ALL SELECT v AS id FROM g${i - 1}
            ) GROUP BY id HAVING COUNT(*) >= $coreK
          ),
          g$i AS MATERIALIZED (
            SELECT g.u, g.v FROM g${i - 1} g
            JOIN n$i a ON a.id = g.u JOIN n$i b ON b.id = g.v
          )"""
    }.mkString(",\n")
    val ec = (0 to rounds)
      .map(i => s"ec$i AS (SELECT COUNT(*) AS c FROM g$i)")
      .mkString(",\n")
    val convCase = (1 to rounds).map(i =>
      s"WHEN (SELECT c FROM ec$i) = (SELECT c FROM ec${i - 1}) THEN ${i - 1}")
      .mkString(" ")
    s"""WITH ${edgeSql(cells, k)},
        g0 AS MATERIALIZED (
          SELECT a.src AS u, a.dst AS v
          FROM e a JOIN e b ON b.src = a.dst AND b.dst = a.src
          WHERE a.src < a.dst
        ),
        $gs,
        $ec,
        conv AS (SELECT CASE $convCase ELSE $rounds END AS r)
        SELECT id, CAST(COUNT(*) AS BIGINT) AS degree,
          CAST((SELECT r FROM conv) AS INT) AS rounds,
          (SELECT r FROM conv) < $rounds AS converged
        FROM (SELECT u AS id FROM g$rounds
              UNION ALL SELECT v AS id FROM g$rounds)
        GROUP BY id ORDER BY id"""
  }

  val defs: Seq[QueryDef] = Seq(

    // k-NN density prune (D4-style diversification): per-node mean
    // cosine to its 8 nearest within-cell neighbors; nodes denser than
    // 1.02× the corpus mean are flagged for pruning. Density and
    // threshold decimal-accumulate; the flag compares the rounded
    // density both engines see.
    QueryDef(
      "l_knn_density_prune",
      (s, d) => {
        val edges = Graph.knnEdgesWithinCells(cellsWithVectors(s, d), k = 8)
        Graph.knnDensityPrune(edges, marginFactor = 1.02)
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH ${edgeSql("knn_cells", 8)},
               den AS (
                 SELECT src AS vec_id,
                   ROUND(CAST(SUM(CAST(cosine AS DECIMAL(38,18))) AS DOUBLE)
                     / COUNT(*), 9) AS density
                 FROM e GROUP BY src
               ),
               thr AS (
                 SELECT CAST(SUM(CAST(density AS DECIMAL(38,18))) AS DOUBLE)
                   / COUNT(*) AS m
                 FROM den
               )
               SELECT vec_id, density, density > m * 1.02e0 AS pruned
               FROM den CROSS JOIN thr
               ORDER BY vec_id""")),

    // The SAME density-prune semantics over the FORCED two-level
    // (IVF-in-IVF) assignment — the ≥10⁸-vector scale path of
    // cellAssignment, which the 64-cell threshold otherwise keeps off
    // every verify-scale corpus (kk ≤ 20 at sf ≤ 0.1). TwoLevelCellTarget
    // drives kk to 84+ here, so trainTwoLevelIvf → withTwoLevelIvfList
    // (the codegen two-level nearest-centroid kernel) runs END-TO-END
    // under the DuckDB hash check: the materialized (id, cell)
    // assignment is the engine-specific artifact, and the oracle
    // independently derives within-cell pairs, exact cosines, per-node
    // top-4 neighborhoods, densities, and the prune flags from it —
    // any drift in the assignment kernel (list arithmetic, sub-split,
    // unassignable filter) lands as a hash mismatch.
    QueryDef(
      "l_twolevel_density_prune",
      (s, d) => {
        val edges =
          Graph.knnEdgesWithinCells(twoLevelCellsWithVectors(s, d), k = 4)
        Graph.knnDensityPrune(edges, marginFactor = 1.02)
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH ${edgeSql("twolevel_cells", 4)},
               den AS (
                 SELECT src AS vec_id,
                   ROUND(CAST(SUM(CAST(cosine AS DECIMAL(38,18))) AS DOUBLE)
                     / COUNT(*), 9) AS density
                 FROM e GROUP BY src
               ),
               thr AS (
                 SELECT CAST(SUM(CAST(density AS DECIMAL(38,18))) AS DOUBLE)
                   / COUNT(*) AS m
                 FROM den
               )
               SELECT vec_id, density, density > m * 1.02e0 AS pruned
               FROM den CROSS JOIN thr
               ORDER BY vec_id""")),

    // PageRank centrality over the 4-NN graph: three unrolled damped
    // (0.85) power iterations from the uniform vector, teleport mass to
    // every SOURCE node, in-degree-0 nodes keep the teleport term only.
    // Output: the 20 most-central nodes (rank value rounded to 9, ties
    // broken by id). Every iteration decimal-accumulates its per-dst
    // rank mass, so the fixpoint is bit-identical across engines.
    QueryDef(
      "l_knn_pagerank",
      (s, d) => {
        val edges = Graph.knnEdgesWithinCells(cellsWithVectors(s, d), k = 4)
        val pr = Graph.pageRank(edges, iters = 3, damping = 0.85)
        // top-20 via TakeOrderedAndProject (k-row heap merge — never a
        // global sort), then rank by broadcast self-join over the bounded
        // 20-row frame (the w5 discipline: no unpartitioned window, ever)
        val top = pr
          .orderBy(desc_nulls_last("r"), asc_nulls_last("id"))
          .limit(20)
          .select(col("id").as("vec_id"), col("in_deg"),
            round(col("r"), 9).as("pagerank"), col("r"))
        val o = top.select(col("vec_id").as("o_id"), col("r").as("o_r"))
        top.join(broadcast(o),
            col("o_r") > col("r") ||
              (col("o_r") === col("r") && col("o_id") < col("vec_id")),
            "left")
          .groupBy(col("vec_id"), col("in_deg"), col("pagerank"))
          .agg((count(col("o_id")) + 1).cast("int").as("pr_rank"))
          .select(col("pr_rank"), col("vec_id"), col("in_deg"),
            col("pagerank"))
          .orderBy(col("pr_rank"))
      },
      Some(s"""WITH ${edgeSql("knn_cells", 4)},
               deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
               nodes AS (SELECT DISTINCT src AS id FROM e),
               nn AS (SELECT COUNT(*) AS n FROM nodes),
               r0 AS (SELECT id, n, 1.0e0 / n AS r FROM nodes CROSS JOIN nn),
               s1 AS (
                 SELECT e.dst AS id,
                   CAST(SUM(CAST(r.r / deg.outdeg AS DECIMAL(38,18))) AS DOUBLE) AS s
                 FROM e JOIN r0 r ON r.id = e.src JOIN deg ON deg.src = e.src
                 GROUP BY e.dst
               ),
               r1 AS (
                 SELECT r0.id, r0.n,
                   (1.0e0 - 0.85e0) / r0.n + 0.85e0 * COALESCE(s1.s, 0e0) AS r
                 FROM r0 LEFT JOIN s1 ON s1.id = r0.id
               ),
               s2 AS (
                 SELECT e.dst AS id,
                   CAST(SUM(CAST(r.r / deg.outdeg AS DECIMAL(38,18))) AS DOUBLE) AS s
                 FROM e JOIN r1 r ON r.id = e.src JOIN deg ON deg.src = e.src
                 GROUP BY e.dst
               ),
               r2 AS (
                 SELECT r1.id, r1.n,
                   (1.0e0 - 0.85e0) / r1.n + 0.85e0 * COALESCE(s2.s, 0e0) AS r
                 FROM r1 LEFT JOIN s2 ON s2.id = r1.id
               ),
               s3 AS (
                 SELECT e.dst AS id,
                   CAST(SUM(CAST(r.r / deg.outdeg AS DECIMAL(38,18))) AS DOUBLE) AS s
                 FROM e JOIN r2 r ON r.id = e.src JOIN deg ON deg.src = e.src
                 GROUP BY e.dst
               ),
               r3 AS (
                 SELECT r2.id, r2.n,
                   (1.0e0 - 0.85e0) / r2.n + 0.85e0 * COALESCE(s3.s, 0e0) AS r
                 FROM r2 LEFT JOIN s3 ON s3.id = r2.id
               ),
               indeg AS (SELECT dst AS id, COUNT(*) AS c FROM e GROUP BY dst)
               SELECT pr_rank, vec_id, in_deg, pagerank FROM (
                 SELECT r3.id AS vec_id,
                   CAST(COALESCE(indeg.c, 0) AS BIGINT) AS in_deg,
                   ROUND(r3.r, 9) AS pagerank,
                   ROW_NUMBER() OVER (
                     ORDER BY r3.r DESC NULLS LAST, r3.id ASC) AS pr_rank
                 FROM r3 LEFT JOIN indeg ON indeg.id = r3.id
               ) WHERE pr_rank <= 20
               ORDER BY pr_rank""")),

    // CONVERGENCE-mode PageRank: iterate until the consecutive-level L1
    // drift drops below tol (blocked lazy unrolls, per-block node-grain
    // checkpoints — plan depth stays bounded however long convergence
    // takes), and emit the top-20 ranks PLUS the iteration count the
    // stop landed on, so the STOPPING DECISION itself is hash-checked:
    // the oracle unrolls every level, recomputes each block boundary's
    // drift with the identical decimal arithmetic, and re-derives the
    // first-converged boundary in SQL. Damping 0.5 (not the centrality
    // gate's 0.85) so the tolerance path, not the maxIters cap, decides
    // within an oracle-unrollable horizon: the L1 step delta contracts
    // by ≥ the damping factor per iteration, so 0.85 needs ~80
    // iterations to reach 1e-5 while 0.5 lands near iteration 16.
    QueryDef(
      "l_pagerank_converged",
      (s, d) => {
        val edges = Graph.knnEdgesWithinCells(cellsWithVectors(s, d), k = 4)
        val (pr, it) = Graph.pageRankUntilConvergence(
          edges, damping = 0.5, tol = 1e-5, maxIters = 24, checkEvery = 4)
        val top = pr
          .orderBy(desc_nulls_last("r"), asc_nulls_last("id"))
          .limit(20)
          .select(col("id").as("vec_id"), col("in_deg"),
            round(col("r"), 9).as("pagerank"), col("r"))
        val o = top.select(col("vec_id").as("o_id"), col("r").as("o_r"))
        top.join(broadcast(o),
            col("o_r") > col("r") ||
              (col("o_r") === col("r") && col("o_id") < col("vec_id")),
            "left")
          .groupBy(col("vec_id"), col("in_deg"), col("pagerank"))
          .agg((count(col("o_id")) + 1).cast("int").as("pr_rank"))
          .select(col("pr_rank"), col("vec_id"), col("in_deg"),
            col("pagerank"), lit(it).cast("int").as("iters"))
          .orderBy(col("pr_rank"))
      },
      Some(prConvSql("knn_cells", k = 4, dampingSql = "0.5e0",
        tolSql = "1e-5", maxIters = 24, checkEvery = 4))),

    // k-core of the MUTUAL 4-NN similarity graph (Seidman; Batagelj–
    // Zaveršnik peel): keep an edge only when BOTH endpoints rank each
    // other in their top-4 (the mutual-proximity graph near-dup
    // pipelines cluster on — one-directional edges are exactly how
    // fringe docs attach to clone clusters), then strip nodes with
    // fewer than 2 in-core mutual neighbors until nothing strips. This
    // is the cluster-CORING step between near-dup labeling and "keep
    // one per cluster": the core holds the genuinely-replicated mass,
    // the peel discards chain fringe CC labeling would keep. Emits
    // survivors with their in-core degree plus the peel-round count and
    // convergence flag, so the fixpoint decision itself is hash-checked
    // (the prConvSql discipline). Parameter note: on the directed 4-NN
    // graph every node has undirected degree ≥ 4 by construction, so
    // cores there are all-or-nothing (coreK ≤ 4 keeps everything,
    // coreK = 5 cascades to empty at verify scale) — the mutual graph's
    // degree spectrum (1..4) is where a core is informative.
    QueryDef(
      "l_kcore_prune",
      (s, d) => {
        val knn = Graph.knnEdgesWithinCells(cellsWithVectors(s, d), k = 4)
        val e = knn.select(col("src"), col("dst"))
        val mutual = e.as("a").join(e.as("b"),
            col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
          .filter(col("a.src") < col("a.dst"))
          .select(col("a.src").as("src"), col("a.dst").as("dst"))
        val (core, rounds, converged) =
          Graph.kCore(mutual, coreK = 2, maxRounds = 12)
        core
          .select(col("id"), col("degree"),
            lit(rounds).cast("int").as("rounds"),
            lit(converged).as("converged"))
          .orderBy(col("id"))
      },
      Some(kCoreSql("knn_cells", k = 4, coreK = 2, rounds = 12))),

    // Connected components on a DEEP graph — the star-contraction
    // fixpoint (Graph.connectedComponents, O(log d) rounds) on exactly
    // the shape min-label propagation cannot run: stride-7 chains over
    // the doc-id line (~n/7 nodes deep — 714 at sf0.1) bridged every
    // 100 ids so residue-class chains merge into two multi-chain
    // components. Label propagation at the default 25-iteration cap
    // would leave these labels hundreds of hops stale; contraction
    // converges in ~⌈log₂ d⌉ + 2 rounds (GraphSpec pins the round
    // count). Oracle: min-id transitive closure via recursive CTE over
    // the same arithmetically-derived edge list.
    QueryDef(
      "l_cc_deep_chain",
      (s, d) => {
        val ids = t(s, d, "documents").select(col("doc_id"))
        val present = ids.select(col("doc_id").as("id_b"))
        val chain = ids
          .select(col("doc_id").as("id_a"), (col("doc_id") + 7).as("id_b"))
          .join(present, Seq("id_b"), "left_semi")
        val bridges = ids.filter(pmod(col("doc_id"), lit(100)) === 0)
          .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
          .join(present, Seq("id_b"), "left_semi")
        graft.llm.Dedup.canonicalizeNearDups(
            ids, chain.unionByName(bridges))
          .orderBy(col("id"))
      },
      Some("""WITH RECURSIVE ids AS (SELECT doc_id FROM documents),
              chain AS (
                SELECT a.doc_id AS src, a.doc_id + 7 AS dst FROM ids a
                WHERE EXISTS (SELECT 1 FROM ids b WHERE b.doc_id = a.doc_id + 7)
                UNION ALL
                SELECT a.doc_id, a.doc_id + 1 FROM ids a
                WHERE a.doc_id % 100 = 0
                  AND EXISTS (SELECT 1 FROM ids b WHERE b.doc_id = a.doc_id + 1)
              ),
              edges AS (
                SELECT src, dst FROM chain UNION ALL SELECT dst, src FROM chain
              ),
              reach(id, r) AS (
                SELECT doc_id, doc_id FROM ids
                UNION
                SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
              )
              SELECT id, MIN(r) AS canonical_id FROM reach
              GROUP BY id ORDER BY id"""))
  )
}
