package graft.tables

import java.nio.file.Paths

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-located joins: same-bucket-count tables must join AND
  * re-aggregate on the bucket key with zero Exchange, and the
  * exchange-free plan must produce the same multiset as the plain
  * shuffled join. */
class BucketedTableSpec extends SparkSpec {

  import spark.implicits._

  private def path(name: String): String =
    Paths.get(sys.props("java.io.tmpdir"), "graft_bt_spec", name).toString

  test("co-located join + same-key agg plan with zero Exchange") {
    val left = (1L to 200L).map(k => (k % 40, k.toDouble)).toDF("k", "x")
    val right = (1L to 60L).map(k => (k % 40, s"v$k")).toDF("k", "v")
    BucketedTable.write(left, "bt_spec_left", path("l"), buckets = 4,
      bucketCols = Seq("k"), sortCols = Seq("k"))
    BucketedTable.write(right, "bt_spec_right", path("r"), buckets = 4,
      bucketCols = Seq("k"), sortCols = Seq("k"))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val l = BucketedTable.table(spark, "bt_spec_left")
      val r = BucketedTable.table(spark, "bt_spec_right")
      val agg = l.join(r, "k").groupBy($"k")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free plan:\n$plan")

      // same multiset as the plain (shuffled) formulation
      val expected = left.join(right, "k").groupBy($"k")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"))
      assert(agg.exceptAll(expected).isEmpty && expected.exceptAll(agg).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("mismatched bucket counts stay correct (with a shuffle)") {
    val left = (1L to 100L).map(k => (k % 10, k)).toDF("k", "a")
    val right = (1L to 30L).map(k => (k % 10, k * 2)).toDF("k", "b")
    BucketedTable.write(left, "bt_spec_l8", path("l8"), buckets = 8,
      bucketCols = Seq("k"))
    BucketedTable.write(right, "bt_spec_r3", path("r3"), buckets = 3,
      bucketCols = Seq("k"))
    val joined = BucketedTable.table(spark, "bt_spec_l8")
      .join(BucketedTable.table(spark, "bt_spec_r3"), "k")
    val expected = left.join(right, "k")
    assert(joined.exceptAll(expected).isEmpty &&
      expected.exceptAll(joined).isEmpty)
  }
}
