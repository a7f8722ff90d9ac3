package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** The testdata parquet stores timestamps as TIMESTAMP(NANOS), which the
    * Spark parquet reader rejects outright. We read them as raw nanos
    * (legacy.parquet.nanosAsLong) and rebuild TimestampType with exact
    * integer division — the generator never uses sub-microsecond precision,
    * so `ns div 1000` is lossless. Floating-point division would corrupt
    * the value (epoch-nanos exceed a double's 2^53 integer range).
    */
  private val nanosTimestampCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    nanosTimestampCols.getOrElse(name, Nil).foldLeft(df) { (acc, c) =>
      if (acc.schema.fieldNames.contains(c) && acc.schema(c).dataType == LongType)
        acc.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
      else acc
    }
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
