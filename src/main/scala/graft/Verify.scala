package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Count IEEE negative-zero values across top-level double/float columns.
    * -0.0 is float-equal to +0.0 but bit-distinct, so the driver's hash
    * compare flags it; the string cast preserves the sign bit ("-0.0")
    * without tripping ANSI division-by-zero. */
  def negZeroCount(df: org.apache.spark.sql.DataFrame): Long =
    countAndNegZero(df)._2

  /** (row count, -0.0 count) in ONE evaluation of the plan — the corpus
    * spec asserts both per gate, and a second pass would double `sbt
    * test`'s corpus cost. */
  def countAndNegZero(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    import org.apache.spark.sql.functions.{count, lit, sum, when}
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val cols = df.schema.fields
      .filter(f => f.dataType == DoubleType || f.dataType == FloatType)
    // df.col (not functions.col): immune to dots/spaces in names
    val conds = count(lit(1)) +: cols.toSeq.map { f =>
      sum(when(df.col(f.name).cast("string") === "-0.0", 1L).otherwise(0L))
    }
    val row = df.agg(conds.head, conds.tail: _*).head()
    val nz = cols.indices
      .map(i => if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)).sum
    (row.getLong(0), nz)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Write timestamps as TIMESTAMP_MICROS (not INT96) so DuckDB reads
      // back exactly what Spark computed.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Session TZ is UTC, so TIMESTAMP → TIMESTAMP_NTZ is wall-clock
    // identity; without it Spark stamps isAdjustedToUTC=true into parquet
    // and the driver's DuckDB compare sees TIMESTAMPTZ vs the oracle's
    // naive TIMESTAMP.
    def ntz(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
      df.select(df.schema.fields.map { f =>
        if (f.dataType == TimestampType) col(f.name).cast(TimestampNTZType).as(f.name)
        else col(f.name)
      }.toSeq: _*)
    }
    // Optional comma-separated subset for local iteration; the driver
    // leaves it unset and gets every query.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val negZero = scala.collection.mutable.ArrayBuffer.empty[String]
    selected.foreach { case (name, fn) =>
      try {
        ntz(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // Signed-zero audit (round 8, after d16): a rounded difference can
        // emit IEEE -0.0 where the oracle emits +0.0 — float-equal, hash-
        // different. Scan the (small) written result for -0.0 doubles so
        // the hazard surfaces here instead of as an opaque hash mismatch.
        // Its own try: the parquet already landed, so a scan hiccup must
        // not mislabel the query as failed.
        try {
          val n = negZeroCount(spark.read.parquet(s"$outDir/$name"))
          if (n > 0) {
            negZero += name
            System.err.println(
              s"[verify] $name emits $n negative-zero double(s) — " +
                "normalize with `+ lit(0.0)` after the round/diff")
          }
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name neg-zero scan errored " +
            s"(result still written): ${e.getMessage}")
        }
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // Corpus-integrity assertion (round 5: crashed gates silently VANISHED
    // from the report). On a full run, overwrite the corpus_complete gate
    // with the counts this harness actually observed — any crash makes
    // that gate hash-mismatch its (n, n, 0) oracle instead of shrinking
    // the report — and print declared-vs-reported for the round log.
    val declared = SparkEntry.queries.size
    val written = selected.size - failed.size
    if (only.isEmpty) {
      import spark.implicits._
      Seq((declared.toLong, written.toLong, failed.size.toLong))
        .toDF("declared", "written", "failed")
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/corpus_complete")
    }
    val auditLine = s"""{"declared":$declared,"reported":$written,"failed":[${
      failed.map("\"" + _ + "\"").mkString(",")}],"neg_zero":[${
      negZero.map("\"" + _ + "\"").mkString(",")}]}"""
    println(auditLine)
    // Standing artifact (r9): the signed-zero audit persists next to the
    // results so each round's record carries it, not just the stdout tail.
    Files.writeString(Paths.get(s"$outDir/neg_zero.json"), auditLine)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Query phase over: release the session-keyed shared caches (index /
    // fact_rounds / cell frames) so the JVM's teardown isn't holding
    // gigabytes it no longer needs — and so the hook itself stays
    // exercised on every driver run, not just in a scaladoc promise.
    SparkEntry.clearSharedCaches(spark)
    spark.stop()
  }
}
