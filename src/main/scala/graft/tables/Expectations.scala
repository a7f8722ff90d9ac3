package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime data-quality expectations — the dbt-test / Delta-CHECK-
  * constraint surface as library operators (the reference runs its
  * equivalents as dbt data tests: unique grains, non_negative,
  * between_0_and_100; gold/models/gold/schema.yml).
  *
  * Row-level expectations audit in ONE conditional-aggregation pass over
  * the table (no per-test scan); a NULL predicate counts as a violation,
  * matching SQL CHECK semantics where only TRUE passes. Grain
  * (uniqueness) checks are their own aggregation since they need a
  * shuffle on the key.
  */
object Expectations {

  /** One row per expectation: (test_name, n_rows, n_violations, pass) —
    * single scan, conditional counts, then an unpivot of the 1-row
    * summary. */
  def audit(df: DataFrame, expectations: Seq[(String, Column)]): DataFrame = {
    require(expectations.nonEmpty)
    val counts = df.agg(
      count(lit(1)).as("__total"),
      expectations.map { case (name, pred) =>
        sum(when(pred, 0L).otherwise(1L)).as(name)
      }: _*)
    counts
      .unpivot(
        Array(col("__total")),
        expectations.map(e => col(e._1)).toArray,
        "test_name", "n_violations")
      .select(col("test_name"), col("__total").as("n_rows"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        (coalesce(col("n_violations"), lit(0L)) === 0L).as("pass"))
  }

  /** Grain check: (test_name, n_rows, n_violations, pass) where a
    * violation is a ROW belonging to a duplicated key (the dbt `unique`
    * test counts rows, not keys). */
  def auditUniqueGrain(df: DataFrame, keyCols: Seq[String],
      testName: String = "unique_grain"): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        sum(col("__n")).as("n_rows"),
        coalesce(sum(when(col("__n") > 1, col("__n"))), lit(0L))
          .as("n_violations"))
      .select(lit(testName).as("test_name"), col("n_rows"),
        col("n_violations"), (col("n_violations") === 0L).as("pass"))

  /** Enforcement: split rows into (passing, violating) — the quarantine
    * move silver ETL applies to coordinates, generalized. Each side is a
    * plain filter, so pushdown/codegen apply; violating rows carry the
    * names of the failed expectations. */
  def enforce(
      df: DataFrame, expectations: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    require(expectations.nonEmpty)
    val allPass = expectations.map(e => e._2 <=> lit(true)).reduce(_ && _)
    val failedNames = array_compact(array(expectations.map { case (n, p) =>
      when(!(p <=> lit(true)), n)
    }: _*))
    (df.filter(allPass),
      df.filter(!allPass).withColumn("failed_expectations", failedNames))
  }
}
