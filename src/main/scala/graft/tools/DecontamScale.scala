package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Curation

/** Measured evidence for the Bloom decontamination scale path: times the
  * exact (explode-join-regroup) and Bloom-prefiltered plans over the
  * SAME fixed eval set as the train corpus grows ×factor, and reports
  * the suspect fraction the Bloom stage lets through — the quantity the
  * whole design rides on (the exact stage's cost is proportional to it).
  *
  * Two train corpora per scale:
  *   - "seeded": the gate's construction (10% of rows are shifted
  *     copies of eval docs — heavily contaminated, worst-ish case);
  *   - "clean": replicated NON-eval docs only — the realistic 100 TB
  *     regime where contamination is rare and the Bloom stage should
  *     turn the exact stage into a near-no-op.
  *
  * Measured per shingle length n: contamination screens in practice use
  * LONG n-grams (8–13 words — an overlap that long is evidence of the
  * benchmark itself, not of shared phrasing), while the oracle gate uses
  * n=3 for DuckDB parity. At n=3 on this small-vocabulary synthetic
  * corpus the eval UNION covers nearly the whole trigram space, so
  * ~everything is a suspect and the prefilter cannot pay — the suspect
  * fraction, now measured and reported, is exactly the quantity that
  * decides whether the Bloom plan wins.
  *
  * Usage: runMain graft.tools.DecontamScale [sfDir] [factor] [outDir] [ns]
  * (ns = comma-separated shingle lengths, default "3,8").
  * Prints one JSON line; append the numbers to SCALE.md.
  */
object DecontamScale {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Replicate documents ×factor with the ScaleStress stride + per-replica
    * token (replicas are near-dup families, not exact clones). */
  private def replicateDocs(docs: DataFrame, factor: Int): DataFrame =
    if (factor <= 1) docs
    else docs
      .withColumn("__rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("doc_id", col("doc_id") + col("__rep") * 1000000L)
      .withColumn("text", concat(col("text"), lit(" r"), col("__rep")))
      .drop("__rep")

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val outDir = args.lift(2).getOrElse("/tmp/graft_decontam_scale")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val evalDocs = docs.filter(col("doc_id") % 10 === 0).cache()
    evalDocs.count()

    // Materialize each train corpus to parquet so both paths SCAN the
    // same files — otherwise the replication explode would be re-run
    // inside every timed query and dominate the measurement.
    def landTrain(name: String, df: DataFrame): DataFrame = {
      val p = s"$outDir/$name.parquet"
      if (!Files.exists(Paths.get(p, "_SUCCESS")))
        df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    val nonEval = docs.filter(col("doc_id") % 10 =!= 0)
    val seeded = nonEval.unionByName(
      evalDocs.select((col("doc_id") + 50000).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars")))

    val ns = args.lift(3).getOrElse("3,8").split(",").map(_.trim.toInt).toSeq

    val configs = Seq(
      ("seeded_x1", landTrain("seeded_x1", seeded)),
      (s"seeded_x$factor", landTrain(s"seeded_x$factor", replicateDocs(seeded, factor))),
      ("clean_x1", landTrain("clean_x1", nonEval)),
      (s"clean_x$factor", landTrain(s"clean_x$factor", replicateDocs(nonEval, factor))))

    val rows = for (n <- ns; (name0, train) <- configs) yield {
      val name = s"${name0}_n$n"
      val nTrain = train.count()
      val bits = Curation.evalBloom(evalDocs, "text", n)
      val (nSuspects, tSuspects) = time {
        Curation.bloomSuspects(train, bits, "text", n, 0.2).count()
      }
      val (_, tExact) = time {
        Curation.decontaminate(train, evalDocs, "doc_id", "text", n = n)
          .write.mode("overwrite").format("noop").save()
      }
      val (_, tBloom) = time {
        Curation.decontaminateBloom(train, evalDocs, "doc_id", "text", n = n)
          .write.mode("overwrite").format("noop").save()
      }
      val frac = nSuspects.toDouble / nTrain
      println(f"[decontam] $name%-16s train=$nTrain%8d suspects=$nSuspects%7d " +
        f"(${frac * 100}%6.2f%%) exact=$tExact%7.2fs bloom=$tBloom%7.2fs " +
        f"(suspect-count probe $tSuspects%5.2fs)")
      (name, nTrain, nSuspects, frac, tExact, tBloom)
    }

    def num(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val json = rows.map { case (name, nT, nS, frac, tE, tB) =>
      s""""$name":{"train":$nT,"suspects":$nS,"suspect_frac":${num(frac)},""" +
        s""""exact_sec":${num(tE)},"bloom_sec":${num(tB)}}"""
    }.mkString("{", ",", s""","factor":$factor,"sf":"$sfDir"}""")
    println(json)
    try Files.writeString(Paths.get("decontam_scale.json"), json)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
