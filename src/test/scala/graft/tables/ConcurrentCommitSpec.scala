package graft.tables

import java.nio.file.Paths
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Executable local twin of the documented object-store conditional-PUT
  * contract (CommitStore scaladoc: S3 `If-None-Match: *` / `If-Match`,
  * GCS generation preconditions, Azure ETags). The Delta/Iceberg swap
  * seam's 100 TB correctness rests on exactly two store-side guarantees
  * — create-if-absent admits ONE winner, CAS swaps ONCE per observed
  * value — plus the protocol-level consequence that racing table
  * committers serialize into a dense version chain with no torn
  * manifest and no lost update. This spec drives all three through
  * LocalCommitStore under racing writers, property-style (randomized
  * writer counts / contention shapes via scalacheck, raw runner — no
  * scalatestplus bridge in the offline cache).
  */
class ConcurrentCommitSpec extends SparkSpec {

  import spark.implicits._

  private def check(prop: Prop, minSuccessful: Int = 15): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(minSuccessful)
        .withMaxDiscardRatio(10f)
        .withMinSize(1).withMaxSize(12),
      prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  private val specRoot =
    Paths.get(sys.props("java.io.tmpdir"), "graft_ccs", s"pid${ProcessHandle.current.pid}")

  private val caseId = new java.util.concurrent.atomic.AtomicInteger(0)

  private def freshPath(name: String): String = {
    val p = specRoot.resolve(s"$name-${caseId.incrementAndGet()}")
    FsUtil.deleteRec(p)
    p.toString
  }

  /** Run `n` concurrent tasks through a start latch (maximal overlap);
    * returns the per-task results, propagating the first failure. */
  private def race[T](n: Int)(task: Int => T): Seq[T] = {
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val out = new java.util.concurrent.ConcurrentHashMap[Int, T]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (0 until n).foreach { i =>
      pool.execute { () =>
        start.await()
        try { out.put(i, task(i)); () }
        catch { case t: Throwable => errs.add(t); () }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "race timed out")
    if (!errs.isEmpty) throw errs.peek()
    (0 until n).map(out.get)
  }

  // ---- primitive properties ---------------------------------------------

  test("property: create-if-absent admits exactly one of N racing writers") {
    // the If-None-Match: * mapping — any writer count, any payload set:
    // one true, and the durable object is exactly the winner's payload
    // (complete, never torn or interleaved)
    val gen = for {
      n <- Gen.choose(2, 16)
      salt <- Gen.choose(0, Int.MaxValue)
    } yield (n, salt)
    check(Prop.forAll(gen) { case (n, salt) =>
      val key = s"${freshPath("pia")}/k$salt"
      val results = race(n)(i => LocalCommitStore.putIfAbsent(key, s"w$i-${"x" * 64}"))
      val winners = results.zipWithIndex.collect { case (true, i) => i }
      val stored = LocalCommitStore.get(key)
      winners.size == 1 &&
        stored.contains(s"w${winners.head}-${"x" * 64}")
    })
  }

  test("property: CAS swaps exactly once per observed value under racing writers") {
    // the If-Match mapping — N writers all read the same current value
    // and CAS against it: exactly one swap lands; the losers observe
    // failure, never a silent overwrite of the winner
    val gen = Gen.choose(2, 12)
    check(Prop.forAll(gen) { n =>
      val key = s"${freshPath("cas")}/ptr"
      assert(LocalCommitStore.putIfAbsent(key, "v0"))
      val expected = Some("v0")
      val results = race(n)(i => LocalCommitStore.putIfMatch(key, s"v1-by-$i", expected))
      val winners = results.zipWithIndex.collect { case (true, i) => i }
      winners.size == 1 &&
        LocalCommitStore.get(key).contains(s"v1-by-${winners.head}")
    })
  }

  // ---- table-level racing committers --------------------------------------

  test("racing partition refreshers: both commit, dense versions, no lost update") {
    val path = freshPath("refresh_race")
    IncrementalTable.commitFull(
      Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("k", "v", "part"),
      path, Seq("part"))

    // two committers refresh DIFFERENT partitions concurrently — the
    // common production shape (two pipelines own two date partitions).
    // Each must land: one as v2, one as v3, in either order; the final
    // table carries BOTH updates (the later committer's carried-files
    // logic must not resurrect the earlier one's replaced partition).
    val newVs = race(2) { i =>
      if (i == 0)
        IncrementalTable.refreshPartitions(
          Seq((1L, "a2", "p1")).toDF("k", "v", "part"), path, Seq("part"))
      else
        IncrementalTable.refreshPartitions(
          Seq((2L, "b2", "p2")).toDF("k", "v", "part"), path, Seq("part"))
    }
    assert(newVs.toSet === Set(2, 3))
    assert(IncrementalTable.versions(path) === Seq(1, 2, 3))
    assert(IncrementalTable.currentVersion(path) === Some(3))
    assert(IncrementalTable.read(spark, path)
      .select("k", "v").as[(Long, String)].collect().toSet
      === Set((1L, "a2"), (2L, "b2")))
    // no torn manifest: every version fully readable with consistent rows
    assert(IncrementalTable.read(spark, path, Some(1)).count() === 2)
    assert(IncrementalTable.read(spark, path, Some(2)).count() === 2)
  }

  test("property: N racing full committers serialize into a dense chain, each durable") {
    val gen = Gen.choose(2, 6)
    check(Prop.forAll(gen) { n =>
      val path = freshPath("full_race")
      val got = race(n) { i =>
        IncrementalTable.commitFull(
          Seq((i.toLong, s"writer$i", "p")).toDF("k", "v", "part"),
          path, Seq("part"))
      }
      // every committer minted a DISTINCT version, densely 1..n —
      // exactly-one-winner per version number, nobody starved
      val dense = got.sorted == (1 to n).toSeq &&
        IncrementalTable.versions(path) == (1 to n).toSeq
      // no torn manifest: every version reads back complete — exactly
      // the one row its committer staged (full commit = whole live set)
      val everyVersionIntact = (1 to n).forall { v =>
        val rows = IncrementalTable.read(spark, path, Some(v))
          .select("v").as[String].collect().toSeq
        rows.sizeIs == 1 && rows.head.startsWith("writer")
      }
      // the current pointer is the newest version, and its content is
      // the row of whoever minted it (last writer wins, atomically)
      val tipV = IncrementalTable.currentVersion(path).get
      val tipWriter = got.indexOf(tipV)
      val tipIntact = IncrementalTable.read(spark, path)
        .select("v").as[String].collect().toSeq == Seq(s"writer$tipWriter")
      dense && everyVersionIntact && tipIntact
    }, minSuccessful = 8)
  }

  override def afterAll(): Unit = {
    FsUtil.deleteRec(specRoot)
    super.afterAll()
  }
}
