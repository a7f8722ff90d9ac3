package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val base = Files.createTempDirectory("statsidx").toString + "/t"
    // 4 range-clustered files over id 0..3999
    spark.range(0, 4000)
      .select(col("id"), (col("id") * 2).as("v"))
      .repartitionByRange(4, col("id"))
      .sortWithinPartitions("id")
      .write.parquet(base)
    base
  }

  test("build writes one manifest row per data file") {
    val base = freshTable()
    val n = StatsIndex.build(spark, base, Seq("id", "v"))
    assert(n === 4)
    val stats = spark.read.parquet(s"$base/_stats")
    assert(stats.columns.sorted.toSeq ===
      Seq("file", "max_id", "max_v", "min_id", "min_v"))
    // ranges tile 0..3999 without gaps
    val covered = stats.agg(min("min_id"), max("max_id")).collect()(0)
    assert(covered.getLong(0) === 0L && covered.getLong(1) === 3999L)
  }

  test("scanBetween skips files and loses no rows") {
    val base = freshTable()
    StatsIndex.build(spark, base, Seq("id"))
    val (df, read, total) = StatsIndex.scanBetween(spark, base, "id", 100L, 900L)
    assert(total === 4)
    assert(read < total, s"expected a file cut, read $read of $total")
    val expected = spark.read.parquet(base)
      .filter(col("id").between(100, 900))
      .agg(count(lit(1)), sum("v")).collect()(0)
    val got = df.agg(count(lit(1)), sum("v")).collect()(0)
    assert(got === expected)
  }

  test("the manifest is invisible to a plain scan of the table") {
    val base = freshTable()
    val before = spark.read.parquet(base).count()
    StatsIndex.build(spark, base, Seq("id"))
    assert(spark.read.parquet(base).count() === before)
  }

  test("empty intersection returns an empty frame, not an error") {
    val base = freshTable()
    StatsIndex.build(spark, base, Seq("id"))
    val (df, read, _) = StatsIndex.scanBetween(spark, base, "id", 50000L, 60000L)
    assert(read === 0 && df.count() === 0)
  }

  test("membership sketch: point lookup reads fewer files, loses no rows") {
    val base = freshTable()
    val files = StatsIndex.buildMemberIndex(spark, base, Seq("id"))
    assert(files === 4)
    // id=7 lives in exactly one range-clustered file
    val (df, read, total) = StatsIndex.scanPoint(spark, base, "id", 7L)
    assert(total === 4)
    assert(read < total, s"no files skipped ($read/$total)")
    assert(df.select("id", "v").as[(Long, Long)].collect().toSeq === Seq((7L, 14L)))
    // a value NOT in the table: correct empty result either way
    val (miss, _, _) = StatsIndex.scanPoint(spark, base, "id", 999999L)
    assert(miss.count() === 0)
    // sketch invisible to plain scans
    assert(spark.read.parquet(base).count() === 4000)
  }

  test("buildIncremental stats only new files, carries the rest, drops deleted") {
    val base = freshTable()
    assert(StatsIndex.build(spark, base, Seq("id", "v")) === 4)
    val before = spark.read.parquet(s"$base/_stats")
      .orderBy("file").collect().toSeq
    // append 2 new range-clustered files beyond the statted range
    spark.range(10000, 12000)
      .select(col("id"), (col("id") * 2).as("v"))
      .repartitionByRange(2, col("id"))
      .sortWithinPartitions("id")
      .write.mode("append").parquet(base)
    val (statted, carried) = StatsIndex.buildIncremental(spark, base, Seq("id", "v"))
    assert(statted === 2 && carried === 4)
    val after = spark.read.parquet(s"$base/_stats").collect()
    assert(after.length === 6)
    // carried rows are byte-identical to the original build's
    val afterByFile = after.map(r => r.getString(r.fieldIndex("file")) -> r).toMap
    before.foreach { r =>
      assert(afterByFile(r.getString(r.fieldIndex("file"))).toSeq === r.toSeq)
    }
    // pruning works across carried + fresh rows
    val (oldScan, oldRead, total) = StatsIndex.scanBetween(spark, base, "id", 100L, 900L)
    assert(total === 6 && oldRead < total)
    assert(oldScan.count() === 801)
    val (newScan, newRead, _) = StatsIndex.scanBetween(spark, base, "id", 10500L, 11000L)
    assert(newRead < total && newScan.count() === 501)
    // delete one data file -> its manifest row is dropped on the next pass
    val victim = java.nio.file.Paths.get(new java.net.URI(
      before.head.getString(before.head.fieldIndex("file"))))
    Files.delete(victim)
    val (statted2, carried2) = StatsIndex.buildIncremental(spark, base, Seq("id", "v"))
    assert(statted2 === 0 && carried2 === 5)
    assert(spark.read.parquet(s"$base/_stats").count() === 5)
    // column-set change falls back to a full rebuild
    val (statted3, carried3) = StatsIndex.buildIncremental(spark, base, Seq("id"))
    assert(statted3 === 5 && carried3 === 0)
  }

  test("stats are a superset guarantee: stale stats still return correct rows") {
    val base = freshTable()
    StatsIndex.build(spark, base, Seq("id"))
    // predicate re-applied on the scan: a range inside one file returns
    // exactly that range even though the file covers more
    val (df, _, _) = StatsIndex.scanBetween(spark, base, "id", 10L, 20L)
    assert(df.count() === 11)
    assert(df.agg(min("id"), max("id")).collect()(0).toSeq === Seq(10L, 20L))
  }
}
