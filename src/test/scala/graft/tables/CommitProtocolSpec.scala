package graft.tables

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proof harness for the object-store-safe commit protocol
  * ([[ManifestLog]] over [[CommitStore]]): every scenario runs against
  * [[FaultyCommitStore]], the simulated hostile backend (writer
  * crashes between operations, ambiguous PUTs) — exactly the failure
  * modes S3/GCS/Azure exhibit and a local FS hides. The invariants
  * under test: two writers never mint the same version, readers never
  * observe a partial version, ambiguous retries don't double-commit,
  * and every crash interleaving leaves read() on a consistent
  * committed version with debris collectable by vacuum. */
class CommitProtocolSpec extends SparkSpec {

  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_cp_spec", name)
    FsUtil.deleteRec(p)
    p.toString
  }

  private def df(rows: (Long, String, String)*) = rows.toDF("k", "v", "part")

  // ---- primitive level -------------------------------------------------

  test("putIfAbsent: exactly one of many concurrent writers creates a key") {
    val path = freshPath("pia")
    val key = s"$path/contended"
    val n = 16
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    (1 to n).foreach { i =>
      pool.execute { () =>
        start.await()
        if (LocalCommitStore.putIfAbsent(key, s"writer-$i")) wins.incrementAndGet()
        ()
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(30, TimeUnit.SECONDS))
    assert(wins.get() === 1)
    // and the winning object is COMPLETE — never a torn write
    assert(LocalCommitStore.get(key).exists(_.startsWith("writer-")))
  }

  // ---- log level: concurrent commit ------------------------------------

  test("concurrent lockless commits: unique versions, no lost updates") {
    val path = freshPath("occ")
    val store = new FaultyCommitStore(LocalCommitStore)
    val n = 12
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (1 to n).foreach { i =>
      pool.execute { () =>
        start.await()
        try {
          // each writer APPENDS its id to the current payload — the
          // read-merge-mint loop; a lost update would drop an id
          val log = new ManifestLog(store, path)
          log.commit {
            case None            => s"writers=$i"
            case Some((_, prev)) => s"$prev,$i"
          }
          ()
        } catch { case t: Throwable => errs.add(t); () }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"commit errors: ${errs}")

    val log = new ManifestLog(store, path)
    // every version minted exactly once, densely numbered
    assert(log.versions === (1 to n).toSeq)
    assert(log.currentVersion === Some(n))
    // no lost update: the final payload carries all n writer ids
    val ids = log.manifest(n).get.split("[=,]").drop(1).map(_.trim.toInt).toSet
    assert(ids === (1 to n).toSet)
    // every committed manifest is complete and parseable (no partials)
    (1 to n).foreach(v => assert(log.manifest(v).exists(_.nonEmpty)))
  }

  // ---- log level: ambiguous publish (duplicate delivery) ---------------

  test("ambiguous PUT (landed but reported failed) does not double-commit") {
    val path = freshPath("ambig")
    val store = new FaultyCommitStore(LocalCommitStore)
    val log = new ManifestLog(store, path)
    assert(log.commit(_ => "v1 payload") === 1)

    // next mint's PUT succeeds server-side but the client sees failure —
    // the classic S3 retry hazard; the writer must recognize its own
    // commit instead of minting a duplicate or erroring
    store.armAmbiguousPut(_.endsWith("m00000002"))
    assert(log.commit(_ => "v2 payload") === 2)
    assert(store.faultsFired === 1)
    assert(log.versions === Seq(1, 2))
    assert(log.manifest(2).get === "v2 payload")
    assert(log.currentVersion === Some(2))
  }

  // ---- table level: crash between stage and publish --------------------

  test("crash before the manifest PUT: reader stays on old version, vacuum reclaims debris") {
    val path = freshPath("crash_pre")
    val store = new FaultyCommitStore(LocalCommitStore)
    IncrementalTable.commitFull(
      df((1L, "a", "p1"), (2L, "b", "p2")), path, Seq("part"), store = store)

    // the refresh stages + adopts data, then dies before its manifest
    store.armCrashBeforePut(_.contains("_manifests"))
    intercept[store.InjectedCrash] {
      IncrementalTable.refreshPartitions(
        df((2L, "CRASHED", "p2")), path, Seq("part"), store = store)
    }

    // nothing committed: same versions, same pointer, same rows
    assert(IncrementalTable.versions(path, store) === Seq(1))
    assert(IncrementalTable.currentVersion(path, store) === Some(1))
    assert(IncrementalTable.read(spark, path, store = store)
      .select("k", "v").as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b")))

    // the dead writer's adopted files are unreferenced debris; vacuum
    // sweeps them and the table still reads identically
    IncrementalTable.vacuum(path, keep = 1, store = store)
    assert(IncrementalTable.read(spark, path, store = store)
      .select("k", "v").as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b")))

    // and the table is not wedged: the retried refresh commits cleanly
    val v2 = IncrementalTable.refreshPartitions(
      df((2L, "b2", "p2")), path, Seq("part"), store = store)
    assert(v2 === 2)
    assert(IncrementalTable.read(spark, path, store = store)
      .filter(col("part") === "p2").select("v").as[String].collect().toSeq
      === Seq("b2"))
  }

  // ---- table level: crash right after the commit point -----------------

  test("crash immediately after the manifest PUT: the commit is complete and durable") {
    val path = freshPath("crash_post")
    val store = new FaultyCommitStore(LocalCommitStore)
    IncrementalTable.commitFull(
      df((1L, "a", "p1"), (2L, "b", "p2")), path, Seq("part"), store = store)

    // the conditional PUT is the SINGLE commit point (Delta's log-entry
    // rule): a writer dying one instruction after it leaves a fully
    // committed, fully readable version — there is no second publish
    // step whose loss could strand a half-commit
    store.armCrashAfterPut(_.contains("_manifests"))
    intercept[store.InjectedCrash] {
      IncrementalTable.refreshPartitions(
        df((2L, "DURABLE", "p2")), path, Seq("part"), store = store)
    }

    assert(IncrementalTable.versions(path, store) === Seq(1, 2))
    assert(IncrementalTable.currentVersion(path, store) === Some(2))
    assert(IncrementalTable.read(spark, path, store = store)
      .select("k", "v").as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "DURABLE")))
    // and the table is not wedged for the next writer
    val v3 = IncrementalTable.refreshPartitions(
      df((1L, "a3", "p1")), path, Seq("part"), store = store)
    assert(v3 === 3)
    assert(IncrementalTable.read(spark, path, store = store)
      .select("k", "v").as[(Long, String)].collect().toSet
      === Set((1L, "a3"), (2L, "DURABLE")))
  }

  // ---- randomized multi-writer fault storm -----------------------------

  test("fault storm: random crashes + ambiguity under concurrency keep every invariant") {
    // 8 writers × 12 attempts each, with a one-shot fault armed on
    // roughly every third attempt (crash-before / crash-after /
    // ambiguous, deterministic seed; an armed fault may fire on ANY
    // writer's put — more hostile, not less). Invariants at the end:
    // versions dense from 1, every manifest complete and parseable,
    // current = newest, every id whose commit() RETURNED SUCCESS is in
    // the final chain exactly once (no lost update, no double-commit);
    // crash-after victims may appear in the chain without reporting
    // success — durable-but-unacknowledged, the documented semantics.
    val path = freshPath("storm")
    val store = new FaultyCommitStore(LocalCommitStore)
    val rnd = new java.util.Random(42)
    val writers = 8
    val perWriter = 12
    val committedIds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    (1 to writers).foreach { w =>
      pool.execute { () =>
        start.await()
        val log = new ManifestLog(store, path)
        (1 to perWriter).foreach { i =>
          val id = s"w$w-$i"
          // arm a random one-shot fault on manifest puts ~1/3 of the time
          rnd.synchronized {
            rnd.nextInt(3) match {
              case 0 => rnd.nextInt(3) match {
                case 0 => store.armCrashBeforePut(_.contains("_manifests"))
                case 1 => store.armCrashAfterPut(_.contains("_manifests"))
                case _ => store.armAmbiguousPut(_.contains("_manifests"))
              }
              case _ => ()
            }
          }
          try {
            log.commit {
              case None            => id
              case Some((_, prev)) => s"$prev,$id"
            }
            committedIds.add(id); ()
          } catch {
            case _: store.InjectedCrash => () // writer died this attempt
            case _: java.util.ConcurrentModificationException => ()
          }
        }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))

    val log = new ManifestLog(store, path)
    val vs = log.versions
    // dense version chain, no gaps, no duplicates
    assert(vs === (1 to vs.size).toSeq)
    // every manifest object is complete and parseable
    vs.foreach(v => assert(log.manifest(v).exists(_.nonEmpty)))
    // the pointerless current is the newest committed version
    assert(log.currentVersion === vs.lastOption)
    // crash-after-put commits are DURABLE even though the writer saw an
    // exception, so the final chain must contain AT LEAST every id whose
    // commit() returned success, each exactly once across the chain tip
    val tip = log.manifest(vs.last).get.split(",").map(_.trim).toSet
    import scala.jdk.CollectionConverters._
    committedIds.asScala.foreach { id =>
      assert(tip.contains(id), s"$id reported success but is missing — lost update")
    }
    // and nothing appears twice in the tip (no double-commit)
    val all = log.manifest(vs.last).get.split(",").map(_.trim).toSeq
    assert(all.distinct.size === all.size, "duplicate id in chain — double commit")
  }

  // ---- rollback pin semantics ------------------------------------------

  test("rollback pins an older version; the next commit supersedes the pin") {
    val path = freshPath("pin")
    val store = new FaultyCommitStore(LocalCommitStore)
    val log = new ManifestLog(store, path)
    assert(log.commit(_ => "one") === 1)
    assert(log.commit(_ => "two") === 2)
    assert(log.commit(_ => "three") === 3)
    assert(log.currentVersion === Some(3))
    log.setPointer(1)
    assert(log.currentVersion === Some(1))
    // a commit after rollback derives from the PINNED version, mints
    // past max, and expires the pin without touching the pointer
    assert(new ManifestLog(store, path).commit {
      case Some((v, payload)) => s"from v$v: $payload"
      case None               => "none"
    } === 4)
    assert(log.manifest(4).get === "from v1: one")
    assert(log.currentVersion === Some(4))
  }
}
