package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One correctness-gate entry: a Spark query over the testdata tables plus
  * (when SQL-expressible) an equivalent DuckDB oracle.
  *
  * Conventions that make the hash compare deterministic across engines:
  *   - every computed column is aliased identically on both sides;
  *   - double-valued SUM/AVG inputs are cast to DECIMAL before summing
  *     (floating-point summation is order-dependent under partial
  *     aggregation, decimal summation is exact), then cast back to DOUBLE;
  *   - integer sums are cast to BIGINT on the DuckDB side (DuckDB widens
  *     to HUGEINT, Spark to LONG);
  *   - orderings always carry a unique tiebreaker and explicit NULLS
  *     FIRST/LAST (Spark and DuckDB have different defaults).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  /** Scratch root for gates that materialize a sketch stage for the
    * oracle to re-read. Unique PER JVM by default (pid suffix), so NO
    * two concurrent runs — Verify vs `sbt test`, or two Verifies — can
    * ever clobber each other's files; `-Dgraft.oracle.scratch` pins it
    * when a stable path is wanted. The resolved value is interpolated
    * into BOTH the write path and the oracle SQL at defs-construction
    * time, so the two always agree within a JVM, and the oracle-side
    * consumer (the driver's DuckDB compare) reads the path from the
    * dumped oracle_sql.json, never from a convention. */
  val oracleScratch: String = {
    val root = sys.props.getOrElse("graft.oracle.scratch",
      s"/tmp/graft_oracle_${ProcessHandle.current().pid()}")
    // the files must OUTLIVE the JVM (the driver's DuckDB replay runs
    // after Verify exits), so no exit hook can clean them; instead each
    // JVM sweeps SIBLING scratch dirs that are provably abandoned: the
    // name must match the DEFAULT pid pattern (a `-Dgraft.oracle.scratch`
    // pin with any other name is never touched), the owning pid must be
    // dead (a live run's files are never swept, however old — the root
    // dir's mtime does not advance when files land in nested subdirs),
    // AND the dir must be a day old (so a replay pending right after a
    // Verify exit still finds its files).
    val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    val defaultPat = "graft_oracle_(\\d+)".r
    try {
      val dir = new java.io.File("/tmp")
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter { f =>
          f.isDirectory && f.lastModified() < cutoff &&
          f.getAbsolutePath != root &&
          (f.getName match {
            case defaultPat(pid) =>
              try {
                val h = ProcessHandle.of(pid.toLong)
                !(h.isPresent && h.get.isAlive)
              } catch { case _: Exception => false }
            case _ => false
          })
        }
        .foreach(f => graft.tables.FsUtil.deleteRec(f.toPath))
    } catch { case _: Exception => () } // best-effort
    root
  }

  /** Exact, order-independent sum of a double column: decimal-accumulate
    * then return DOUBLE. Mirrors `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS
    * DOUBLE)` in the oracle. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Oracle-side rendering of [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Exact order-independent average of a double column. */
  def davg(c: Column, scale: Int = 4): Column =
    (sum(c.cast(DecimalType(18, scale))).cast(DoubleType) /
      count(when(c.isNotNull, lit(1))))

  def davgSql(expr: String, scale: Int = 4): String =
    s"(${dsumSql(expr, scale)} / COUNT(CASE WHEN $expr IS NOT NULL THEN 1 END))"

  /** Exact multiset equality in ONE evaluation of each side and ONE
    * driver action. The `a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty`
    * idiom evaluates both plans twice and shuffles four times — for
    * identity pins whose sides are full recomputes, the pair doubles the
    * gate's cost (guide §1.2: don't compute things you throw away).
    * Signed union + groupBy over every column: any nonzero residue means
    * a row whose multiplicities differ. (groupBy normalizes NaN and -0.0
    * in keys the same way exceptAll does, so the semantics match.)
    * Hoisted from StreamingQueries (round 9) for the batch identity pins
    * (round 11). */
  def multisetEqual(a: DataFrame, b: DataFrame): Boolean = {
    // Fail LOUDLY on schema drift (like the exceptAll idiom did):
    // b.select(a's columns) would silently ignore a column only b has, so
    // a recompute that GAINS a column could pass the identity pin unseen.
    require(a.columns.toSet == b.columns.toSet,
      s"multisetEqual schema drift: a=${a.columns.sorted.mkString(",")} " +
        s"b=${b.columns.sorted.mkString(",")}")
    val cols = a.columns.toSeq
    a.withColumn("__side", lit(1L))
      .unionByName(b.select(cols.map(col): _*).withColumn("__side", lit(-1L)))
      .groupBy(cols.map(col): _*)
      .agg(sum(col("__side")).as("__d"))
      .filter(col("__d") =!= 0L)
      .isEmpty
  }
}
