package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Reads plain parquet; column pruning and filter pushdown reach the scan
  * because every downstream query is declared via the DataFrame API and
  * Catalyst prunes/pushes automatically. At 100 TB these would be
  * partitioned Delta/Iceberg tables registered in a catalog; the loader is
  * the only place that would change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-replica doc_id stride used by the scale-campaign replicator
    * (ScaleStress.replicate) — and therefore the boundary of the BASE id
    * block. Gates that pin a fixed artifact to the base corpus (the
    * eval-leak report's eval set) derive their bound from THIS constant,
    * in both the engine filter and the interpolated oracle SQL, so the
    * replicator and the gates can never silently disagree. If the base
    * corpus ever approaches this size, raising the stride here moves
    * every consumer at once. */
  val ReplicaStride: Long = 1000000L

  /** Declared timestamp columns, normalized to session-TZ `TimestampType`
    * WHATEVER the parquet physical type. The generator has shipped three
    * physical encodings across rounds — TIMESTAMP(NANOS) (read as raw
    * longs via legacy.parquet.nanosAsLong), TIMESTAMP_MICROS without TZ
    * (read as TIMESTAMP_NTZ), and TIMESTAMP_MICROS UTC-adjusted (read as
    * TIMESTAMP directly) — and every downstream operator assumes plain
    * `TimestampType`. Pinning the normalization HERE means a physical-type
    * change in the data can never again break three operators in three
    * different files (the round-5 NTZ regression).
    *
    * Losslessness: nanos-long → `ns div 1000` is exact integer division
    * (the generator never uses sub-microsecond precision; FLOATING-POINT
    * division would corrupt, epoch-nanos exceed a double's 2^53 range);
    * NTZ → TimestampType interprets the wall-clock in the session TZ,
    * which every entrypoint pins to UTC, so the instant is the identity.
    */
  private val timestampCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    timestampCols.getOrElse(name, Nil).foldLeft(df) { (acc, c) =>
      if (!acc.schema.fieldNames.contains(c)) acc
      else acc.schema(c).dataType match {
        case LongType =>
          acc.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
        case TimestampNTZType =>
          acc.withColumn(c, col(c).cast(TimestampType))
        case _ => acc // already TimestampType (UTC-adjusted micros)
      }
    }
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Spread a NARROW scan across the session's cores: when the plan's
    * scan parallelism is below defaultParallelism — a single-file /
    * single-row-group input, which parquet cannot split, so every
    * downstream map-side stage (wide projections, generators, partial
    * aggregation) serializes on ONE core — insert one round-robin
    * repartition right after the read (guide §2.5: "Input skew: one
    * huge unsplittable file … otherwise repartition immediately after
    * the read"). Scale-adaptive by construction: the condition is
    * MEASURED scan parallelism, so a corpus that arrives as many
    * files/row-groups (any real 100 TB layout) never pays the extra
    * exchange — this fires only on the degenerate testdata shape.
    * Catalyst pushes column pruning AND predicate pushdown through
    * Repartition, so PushedFilters/ReadSchema at the scan are
    * unchanged. Use on paths whose per-row work dwarfs a row shuffle
    * (the silver projection, explode-heavy text kernels) — a plain
    * column-count-preserving filter gate gains nothing and should not
    * pay the exchange. */
  def spreadIfNarrow(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val parts =
      try df.rdd.getNumPartitions
      catch { case _: Throwable => Int.MaxValue }
    if (parts >= sc.defaultParallelism) df
    else df.repartition(sc.defaultParallelism)
  }
}
