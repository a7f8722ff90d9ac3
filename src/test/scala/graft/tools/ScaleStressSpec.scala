package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Corpus

/** Downsized CI form of the scale-stress harness (tools.ScaleStress):
  * replicate sf0.001 ×5 with the same skew injection (hot course at
  * ~30% of lineitem rows, hot boilerplate phrase in ~30% of documents)
  * and pin the properties the full ×100 campaign measures —
  * completion of every stress operator on the skewed replica, the
  * salted join actually planning its salt scatter, and AQE's skew-join
  * split engaging on a deliberately hot join (thresholds tuned down so
  * the split triggers at CI scale). */
class ScaleStressSpec extends SparkSpec {

  private val factor = 5
  private lazy val stressDir: String = {
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft_stress_ci").toString
    // fresh replica per run: the replicate marker makes reuse silent
    // otherwise, and a stale dir could mask generator changes
    graft.tables.FsUtil.deleteRec(Paths.get(dir))
    ScaleStress.replicate(spark, sfDir, dir, factor, skew = true)
    dir
  }

  test("replication scales fact cardinalities and injects both skews") {
    val li = spark.read.parquet(s"$stressDir/lineitem.parquet")
    val li1 = graft.core.Tables.load(spark, sfDir, "lineitem")
    assert(li.count() === li1.count() * factor)
    // keys remap per replica: distinct orders scale too
    assert(li.select("l_orderkey").distinct().count()
      === li1.select("l_orderkey").distinct().count() * factor)
    // hot course: 'R' holds well above its natural ~25% share
    val rShare = li.filter(col("l_returnflag") === "R").count().toDouble / li.count()
    assert(rShare > 0.4, s"hot-course share $rShare")
    // hot phrase: ~30% of documents carry it
    val docs = spark.read.parquet(s"$stressDir/documents.parquet")
    val hot = docs.filter(col("text").contains("subscribe to our newsletter")).count()
    val share = hot.toDouble / docs.count()
    assert(share > 0.25 && share < 0.35, s"hot-phrase share $share")
    // replica embeddings are NEW vectors, not clones: verbatim copies
    // made every LSH bucket hold f exact duplicates (pairs ∝ f²) — the
    // first sf1 bench measured that as a 90× blow-up before the jitter
    val emb = spark.read.parquet(s"$stressDir/embeddings.parquet")
    val emb1 = graft.core.Tables.load(spark, sfDir, "embeddings")
    assert(emb.count() === emb1.count() * factor)
    assert(emb.select(md5(col("embedding").cast("string"))).distinct().count()
      === emb.count(), "replicated embedding vectors must be distinct")
  }

  test("every stress operator completes on the skewed replica") {
    ScaleStress.StressQueries.foreach { q =>
      val n = Corpus.queries(q)(spark, stressDir).count()
      assert(n >= 0, s"$q failed on the stress replica")
    }
  }

  test("salted join plans its salt scatter on the stress replica") {
    assert(ScaleStress.saltEngages(spark, stressDir))
  }

  test("AQE skew-join split engages on a deliberately hot join") {
    // CI data is far below the production skew thresholds — pass
    // CI-sized ones so the split logic itself is exercised end to end
    val factorKey = "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    val savedFactor = spark.conf.getOption(factorKey)
    spark.conf.set(factorKey, "1.2")
    try assert(
      ScaleStress.aqeSkewEngages(spark, stressDir,
        skewThreshold = "20KB", advisorySize = "8KB"),
      "adaptive plan shows no skew=true join")
    finally savedFactor match {
      case Some(v) => spark.conf.set(factorKey, v)
      case None => spark.conf.unset(factorKey)
    }
  }
}
