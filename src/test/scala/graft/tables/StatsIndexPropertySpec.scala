package graft.tables

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Pruning-soundness property for the data-skipping index: for ANY data
  * layout and ANY probe, the stats-pruned scan must return exactly the
  * rows of a blind full scan with the same predicate — a false prune at
  * 100 TB is a silently wrong answer, the worst failure class a skipping
  * index has. Random multi-file layouts (clustered and shuffled, with
  * NULLs and duplicate values straddling file boundaries), random range
  * and point probes, both index families (min/max ranges, membership
  * sketch). StatsIndexSpec pins the targeted scenarios; this walks the
  * layout×probe space. */
class StatsIndexPropertySpec extends SparkSpec {

  import spark.implicits._

  private val caseId = new java.util.concurrent.atomic.AtomicInteger(0)
  private val root =
    Paths.get(sys.props("java.io.tmpdir"), "graft_sidx_prop",
      s"pid${ProcessHandle.current.pid}")

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(minSuccessful)
        .withMaxDiscardRatio(10f)
        .withMinSize(1).withMaxSize(10),
      prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  private val rowGen: Gen[(Option[Long], String)] =
    for {
      k <- Gen.frequency(
        9 -> Gen.choose(-20L, 20L).map(Some(_)),
        1 -> Gen.const(None)) // all-null chunks must never be pruned
      s <- Gen.oneOf("x", "y", "z")
    } yield (k, s)

  private val caseGen: Gen[(List[(Option[Long], String)], Boolean,
      List[(Long, Long)], List[Long])] =
    for {
      rows <- Gen.nonEmptyListOf(rowGen).map(_.take(60))
      clustered <- Gen.oneOf(true, false)
      ranges <- Gen.listOfN(3, Gen.zip(
        Gen.choose(-25L, 25L), Gen.choose(-25L, 25L)))
      points <- Gen.listOfN(3, Gen.choose(-25L, 25L))
    } yield (rows, clustered, ranges, points)

  test("property: range and point skipping scans equal blind scans on any layout") {
    check(Prop.forAll(caseGen) { case (rows0, clustered, ranges, points) =>
      val rows = if (rows0.nonEmpty) rows0 else List((Some(1L), "x"))
      val path = root.resolve(s"case${caseId.incrementAndGet()}").toString
      val df0 = rows.map { case (k, s) =>
        (k.map(Long.box).orNull: java.lang.Long, s)
      }.toDF("k", "s")
      // clustered = files carry tight disjoint ranges (skipping bites);
      // shuffled = ranges overlap everywhere (skipping must NOT lose rows)
      val laid =
        if (clustered) df0.repartitionByRange(4, col("k"))
        else df0.repartition(4)
      laid.write.mode("overwrite").parquet(path)
      StatsIndex.build(spark, path, Seq("k"))
      StatsIndex.buildMemberIndex(spark, path, Seq("k"), buckets = 64)
      val blind = spark.read.parquet(path)

      val rangesOk = ranges.forall { case (a, b) =>
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        val (pruned, nRead, nTotal) =
          StatsIndex.scanBetween(spark, path, "k", lo, hi)
        val expected = blind.filter(col("k") >= lo && col("k") <= hi)
        nRead <= nTotal &&
          pruned.exceptAll(expected).isEmpty &&
          expected.exceptAll(pruned).isEmpty
      }
      val pointsOk = points.forall { v =>
        val (pruned, nRead, nTotal) = StatsIndex.scanPoint(spark, path, "k", v)
        val expected = blind.filter(col("k") === v)
        nRead <= nTotal &&
          pruned.exceptAll(expected).isEmpty &&
          expected.exceptAll(pruned).isEmpty
      }
      FsUtil.deleteRec(Paths.get(path))
      rangesOk && pointsOk
    }, minSuccessful = 8)
  }

  override def afterAll(): Unit = {
    FsUtil.deleteRec(root)
    super.afterAll()
  }
}
