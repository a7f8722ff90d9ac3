package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Curation

/** Measured evidence for the eval-leak report's scale path, at the
  * PRODUCTION shape: a FIXED eval suite (eval suites do not grow with
  * the corpus — that is what makes leak auditing tractable at all)
  * against a train corpus growing ×factor, with a hot boilerplate
  * phrase planted on both sides — the input that makes the naive gram
  * join quadratic (each hot gram matches hot_train × hot_eval pairs;
  * the ×100 gate-shaped attempt filled the disk mid-join twice before
  * the hot-gram cap existed).
  *
  * Planting detail: the eval suite is the doc_id % 10 == 0 slice and
  * the plant rule is pmod(doc_id, 10) < 3, so EVERY eval doc carries
  * the phrase (residue 0) and ~22% of train docs do (residues 1-2 of
  * the 9 train residues). That is the MOST adversarial eval shape for
  * the pair join — every eval doc contributes hot grams — and slightly
  * milder than 30% on the train side; the measured naive blow-up and
  * capped slopes are under exactly this shape.
  *
  * Measures, per scale factor:
  *   - the CAPPED plan (hot grams pair-free, output exact);
  *   - the NAIVE plan only at small factors (its cost is the measured
  *     motivation, not a viable configuration — at ×100 it runs out
  *     of disk, which is reported as the finding rather than timed).
  *
  * Usage: runMain graft.tools.LeakScale [sfDir] [factors] [naiveMax]
  * (factors = comma-separated, default "1,10,100"; naiveMax = largest
  * factor the naive plan runs at, default 10).
  * Prints one JSON line; append the numbers to SCALE.md.
  */
object LeakScale {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private val HotPhrase = ScaleStress.HotPhrase

  private def plant(df: DataFrame): DataFrame =
    df.withColumn("text",
      when(pmod(col("doc_id"), lit(10)) < 3,
        concat(col("text"), lit(HotPhrase))).otherwise(col("text")))

  private def replicate(docs: DataFrame, factor: Int): DataFrame =
    if (factor <= 1) docs
    else docs
      .withColumn("__rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("doc_id", col("doc_id") + col("__rep") * 1000000L)
      .withColumn("text", concat(col("text"), lit(" r"), col("__rep")))
      .drop("__rep")

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val naiveMax = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/tmp/graft_leak_spill")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    // FIXED suite: the base corpus's %10 slice, boilerplate planted
    val evalSuite = plant(docs.filter(col("doc_id") % 10 === 0))
      .select(col("doc_id"), col("text")).cache()
    val nEval = evalSuite.count()
    val trainBase = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), col("text"))

    def run(train: DataFrame, cap: Option[Long]): Double = {
      val (_, t) = time {
        Curation.evalContaminationReport(
            train, evalSuite, "doc_id", "text", n = 3, hotGramDf = cap)
          .write.mode("overwrite").format("noop").save()
      }
      t
    }

    val rows = factors.flatMap { f =>
      val scratch = s"/tmp/graft_leak_train_x$f"
      if (!Files.exists(Paths.get(scratch, "_SUCCESS")))
        plant(replicate(trainBase, f))
          .write.mode("overwrite").parquet(scratch)
      val train = spark.read.parquet(scratch)
      val nTrain = train.count()
      val cap = Some(math.max(5L, nTrain / 100))
      val tCapped = run(train, cap)
      println(f"[leak] x$f capped $tCapped%.1f s (train=$nTrain eval=$nEval)")
      val capped =
        f"""{"factor":$f,"plan":"capped","t_sec":$tCapped%.3f,"train_docs":$nTrain}"""
      val naive =
        if (f > naiveMax) Nil
        else {
          val tNaive = run(train, None)
          println(f"[leak] x$f naive $tNaive%.1f s")
          Seq(f"""{"factor":$f,"plan":"naive","t_sec":$tNaive%.3f,"train_docs":$nTrain}""")
        }
      capped +: naive
    }
    val out = s"""{"eval_docs":$nEval,"rows":[${rows.mkString(",")}]}"""
    Files.writeString(Paths.get("leak_scale.json"), out)
    println(out)
    spark.stop()
  }
}
