package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Expectations semantics: NULL counts as a violation (CHECK rule),
  * single-scan audit counts, enforce() split + failure labeling.
  */
class ExpectationsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(10.0), "a"),
    (2L, Some(-5.0), "b"),   // violates positive
    (3L, None: Option[Double], "c"), // NULL → violates positive (CHECK rule)
    (4L, Some(3.0), "")      // violates nonempty
  ).toDF("id", "amount", "tag")

  private val rules = Seq(
    "amount_positive" -> (col("amount") > 0),
    "tag_nonempty" -> (length(col("tag")) > 0))

  test("audit counts violations per rule in one pass; NULL violates") {
    val out = Expectations.audit(df, rules)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("amount_positive") === ((4L, 2L, false))) // -5 and NULL
    assert(out("tag_nonempty") === ((4L, 1L, false)))
  }

  test("auditUniqueGrain counts rows of duplicated keys, dbt-style") {
    val dup = df.unionByName(df.filter(col("id") === 1L))
    val r = Expectations.auditUniqueGrain(dup, Seq("id")).collect()(0)
    assert(r.getLong(1) === 5L)
    assert(r.getLong(2) === 2L) // both rows of the duplicated key
    assert(!r.getBoolean(3))
    val clean = Expectations.auditUniqueGrain(df, Seq("id")).collect()(0)
    assert(clean.getBoolean(3))
  }

  test("enforce splits rows and names the failed expectations") {
    val (good, bad) = Expectations.enforce(df, rules)
    assert(good.select("id").collect().map(_.getLong(0)).toSet === Set(1L))
    val failures = bad.select(col("id"), col("failed_expectations"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(failures(2L) === Set("amount_positive"))
    assert(failures(3L) === Set("amount_positive"))
    assert(failures(4L) === Set("tag_nonempty"))
  }
}
