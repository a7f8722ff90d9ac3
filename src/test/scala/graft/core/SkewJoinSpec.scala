package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted skew join: row-identical to the plain join, with the hot key
  * actually scattered across salts. */
class SkewJoinSpec extends SparkSpec {

  import spark.implicits._

  // 10k rows, 90% on one hot key — the shape that melts a plain hash join
  private lazy val skewed = spark.range(0, 10000)
    .select(
      when(col("id") % 10 < 9, 1L).otherwise(col("id") % 100).as("k"),
      (col("id") * 2).as("v"))
  private lazy val dim = (0L until 100L).map(i => (i, s"name$i")).toDF("k", "name")

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Any, Any, Any)] =
    df.select(col("k"), col("v"), col("name"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet

  test("salted inner join equals the plain inner join row-for-row") {
    val plain = skewed.join(dim, Seq("k"), "inner")
    val salted = SkewJoin.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8, "inner")
    assert(canon(salted) === canon(plain))
  }

  test("salted left join preserves unmatched skewed rows") {
    val dimMissingHot = dim.filter(col("k") =!= 1L) // hot key has no match
    val plain = skewed.join(dimMissingHot, Seq("k"), "left")
    val salted = SkewJoin.saltedJoin(skewed, dimMissingHot, Seq("k"), 8, "left")
    assert(canon(salted) === canon(plain))
    assert(salted.filter(col("name").isNull).count() === skewed.filter(col("k") === 1L).count())
  }

  test("NULL keys follow plain-join semantics: never match, null-padded on left") {
    val withNulls = spark.range(0, 100)
      .select(
        when(col("id") % 4 === 0, lit(null).cast("long")).otherwise(col("id") % 10).as("k"),
        col("id").as("v"))
    val dimWithNull = dim.unionByName(
      Seq((null.asInstanceOf[java.lang.Long], "null-row")).toDF("k", "name")
        .select(col("k").cast("long").as("k"), col("name")))
    for (jt <- Seq("inner", "left")) {
      val plain = withNulls.join(dimWithNull, Seq("k"), jt)
      val salted = SkewJoin.saltedJoin(withNulls, dimWithNull, Seq("k"), 4, jt)
      assert(canon(salted) === canon(plain), s"divergence under $jt with NULL keys")
    }
  }

  test("the hot key scatters across multiple salts") {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8L)).cast("int"))
    val spread = salted.filter(col("k") === 1L)
      .select(countDistinct(col("__salt"))).collect()(0).getLong(0)
    assert(spread >= 6, s"hot key landed on only $spread of 8 salts")
  }
}
