package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot-versioned parquet table: the time-travel / atomic-commit
  * story plain parquet lacks (what Delta's transaction log and Iceberg's
  * snapshot metadata provide), built from two primitives every HDFS-like
  * filesystem has — immutable version directories and an atomic pointer
  * rename.
  *
  * Layout:
  * {{{
  *   <path>/_versions/v00000001/part-*.parquet   (immutable snapshots)
  *   <path>/_versions/v00000002/part-*.parquet
  *   <path>/_commits                             (committed versions, one per line)
  *   <path>/_latest                              (current pointer: "2")
  * }}}
  *
  * Commit order: (1) land the COMPLETE snapshot directory, (2) append the
  * version to the commit log, (3) flip the pointer — each metadata write
  * is write-temp + atomic rename. A reader therefore always resolves a
  * complete snapshot; a crash at any step leaves the previous state
  * current and at worst a debris directory the log never names (invisible
  * to reads, reclaimed by [[vacuum]]). The log, not the pointer, defines
  * the committed set, so [[rollback]] is metadata-only and rolled-back-
  * over versions stay time-travelable until vacuumed. Readers are
  * unlimited and never block. [[commit]] assumes a single writer;
  * [[commitIfCurrent]] adds the optimistic-concurrency protocol real
  * table formats use — concurrent writers detect the conflict and retry
  * instead of corrupting the log.
  *
  * Scale notes: snapshots share nothing (no incremental commit), so this
  * suits dimension/gold tables rewritten per run — exactly where the
  * reference rewrites whole tables (dimensions.py:366-398). `vacuum`
  * bounds storage to the last N snapshots.
  *
  * Deployment substrate: this implementation leans on LOCAL-FS
  * primitives (atomic dir rename, O_EXCL lock) and is the
  * local/HDFS-mode format. On an object store (S3/MinIO — the
  * reference's own substrate), use [[IncrementalTable.commitFull]]
  * instead: it has identical whole-snapshot commit semantics (every
  * commit's live set is exactly the new frame) but its metadata rides
  * the rename-free [[ManifestLog]] conditional-PUT protocol, proven
  * against a hostile store in CommitProtocolSpec.
  */
object VersionedTable {

  private def versionsDir(path: String): Path = Paths.get(path, "_versions")
  private def pointer(path: String): Path = Paths.get(path, "_latest")
  private def commitLog(path: String): Path = Paths.get(path, "_commits")

  private def fmt(v: Int): String = f"v$v%08d"

  private def writeAtomic(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".__tmp__")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** All committed snapshot versions, ascending — from the commit log.
    * Directories the log never names (crash debris) are excluded. */
  def versions(path: String): Seq[Int] =
    if (!Files.exists(commitLog(path))) Nil
    else new String(Files.readAllBytes(commitLog(path)), StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).map(_.trim.toInt).toSeq.sorted

  /** The committed version the pointer names, if the table exists. */
  def currentVersion(path: String): Option[Int] =
    if (!Files.exists(pointer(path))) None
    else Some(new String(
      Files.readAllBytes(pointer(path)), StandardCharsets.UTF_8).trim.toInt)

  /** Commit `df` as the next snapshot; returns the new version number.
    * Version numbers never reuse (next = max committed + 1), so a commit
    * after a rollback branches forward without touching old snapshots. */
  def commit(df: DataFrame, path: String): Int = {
    val committed = versions(path)
    val next = committed.lastOption.getOrElse(0) + 1
    val snapDir = versionsDir(path).resolve(fmt(next))
    df.write.mode(SaveMode.Overwrite).parquet(snapDir.toString)
    Files.createDirectories(Paths.get(path))
    writeAtomic(commitLog(path), (committed :+ next).mkString("\n"))
    writeAtomic(pointer(path), next.toString)
    next
  }

  final case class CommitConflict(expected: Option[Int], actual: Option[Int])

  /** Optimistic-concurrency commit: succeed only if the table is still at
    * `expected` (None = table must not exist yet). The SNAPSHOT WRITE —
    * the heavy, minutes-long part — happens OUTSIDE the critical section
    * into a writer-unique staging directory; the lock guards only the
    * metadata transition (validate expected → atomic-rename staging to
    * its version number → append log → flip pointer), so writers
    * serialize on milliseconds, not on the data write. On conflict the
    * staging data is discarded and the caller re-reads + retries — the
    * Delta/Iceberg commit loop.
    *
    * The mutex is an O_EXCL lock file (atomic create). A crashed writer's
    * lock is broken after `staleLockMs` — the clock-based break every
    * object-store commit protocol ultimately falls back to. */
  def commitIfCurrent(
      df: DataFrame, path: String, expected: Option[Int],
      lockTimeoutMs: Long = 30000, staleLockMs: Long = 600000): Either[CommitConflict, Int] = {
    val staging = versionsDir(path).resolve(
      s".staging-${java.util.UUID.randomUUID().toString}")
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    try {
      withLock(path, lockTimeoutMs, staleLockMs) {
        val cur = currentVersion(path)
        if (cur != expected) Left(CommitConflict(expected, cur))
        else {
          val committed = versions(path)
          val next = committed.lastOption.getOrElse(0) + 1
          val target = versionsDir(path).resolve(fmt(next))
          // a writer that crashed between its snapshot rename and its
          // log append leaves a version-named dir the log never names;
          // it would wedge this rename forever. The log is the source
          // of truth and we hold the lock, so an unlogged target is
          // provably debris — reclaim it and proceed.
          if (Files.exists(target) && !committed.contains(next))
            FsUtil.deleteRec(target)
          Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
          writeAtomic(commitLog(path), (committed :+ next).mkString("\n"))
          writeAtomic(pointer(path), next.toString)
          Right(next)
        }
      }
    } finally {
      if (Files.exists(staging)) FsUtil.deleteRec(staging)
    }
  }

  private[tables] def withLock[T](
      path: String, timeoutMs: Long, staleMs: Long)(body: => T): T = {
    val lock = Paths.get(path, "_lock")
    Files.createDirectories(Paths.get(path))
    // Lock content is "<acquireMillis> <holderToken>": the timestamp
    // drives staleness, the token proves ownership at release time.
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + timeoutMs
    var acquired = false
    while (!acquired) {
      try {
        Files.write(lock, s"${System.currentTimeMillis()} $token"
          .getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val age = lockAge(lock)
          if (age > staleMs) {
            // Atomic takeover: RENAME the stale lock rather than delete
            // it — only one waiter wins the move (a delete could race
            // another waiter's fresh CREATE_NEW and evict a live lock);
            // losers see NoSuchFile and re-enter the create race.
            val debris = lock.resolveSibling(
              s"_lock.broken-${java.util.UUID.randomUUID().toString}")
            try {
              Files.move(lock, debris, StandardCopyOption.ATOMIC_MOVE)
              Files.deleteIfExists(debris); ()
            } catch { case _: java.nio.file.NoSuchFileException => () }
          }
          else if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"could not acquire $lock within ${timeoutMs}ms")
          else Thread.sleep(50)
      }
    }
    try body finally releaseLock(lock, token)
  }

  /** Lock age from its recorded acquire time. When the content doesn't
    * parse (crash between CREATE_NEW and the content write, corruption),
    * fall back to the file mtime so an orphaned empty lock still goes
    * stale instead of wedging every future writer until manual cleanup. */
  private def lockAge(lock: Path): Long =
    try {
      System.currentTimeMillis() - new String(
        Files.readAllBytes(lock), StandardCharsets.UTF_8)
        .trim.split("\\s+")(0).toLong
    } catch {
      case _: Exception =>
        try System.currentTimeMillis() - Files.getLastModifiedTime(lock).toMillis
        catch { case _: Exception => 0L } // vanished mid-check — racing holder
    }

  /** Release only a lock this holder still owns: a writer paused past
    * staleMs may have been stale-broken and replaced by another writer's
    * fresh lock — an unconditional delete here would evict that live
    * holder and let a third writer into the critical section. The token
    * check narrows the exposure to the read→delete window (the stale
    * BREAK itself is an atomic rename, so two breakers can't race). */
  private def releaseLock(lock: Path, token: String): Unit =
    try {
      val content = new String(Files.readAllBytes(lock), StandardCharsets.UTF_8)
      if (content.contains(token)) { Files.deleteIfExists(lock); () }
    } catch { case _: Exception => () } // already gone or replaced — not ours to touch

  /** Read a snapshot: the current one, or `version` for time travel. */
  def read(spark: SparkSession, path: String, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $path"))
    val vs = versions(path)
    require(vs.contains(v), s"version $v not in committed set $vs at $path")
    spark.read.parquet(versionsDir(path).resolve(fmt(v)).toString)
  }

  /** Point the table back at an earlier snapshot (instant, metadata-only
    * rollback — the snapshot data is already in place). */
  def rollback(path: String, version: Int): Unit = {
    require(versions(path).contains(version),
      s"version $version not committed at $path")
    writeAtomic(pointer(path), version.toString)
  }

  /** Row-level change feed between two snapshots (the CDC read a table
    * format derives from its log): full-column diff via two anti-joins,
    * one shuffle each side. Returns the union of rows only in `to`
    * (`__change = 'insert'`) and rows only in `from` (`'delete'`); an
    * update appears as its delete+insert pair. Compares whole rows, so
    * schema changes between the snapshots must be aligned by the caller
    * first (e.g. ParquetTable.alignToSchema). */
  def diff(spark: SparkSession, path: String, fromV: Int, toV: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val before = read(spark, path, Some(fromV))
    val after = read(spark, path, Some(toV))
    val inserted = after.exceptAll(before).withColumn("__change", lit("insert"))
    val deleted = before.exceptAll(after).withColumn("__change", lit("delete"))
    inserted.unionByName(deleted)
  }

  /** Drop all but the newest `keep` committed snapshots, plus any
    * directories the commit log never named (crash debris). The current
    * version is always kept, even after a rollback past `keep`.
    *
    * Serializes with [[commitIfCurrent]] under the same OCC lock: the
    * versions()-read → delete → log-rewrite sequence must not interleave
    * with a concurrent commit, or vacuum would rewrite the log without
    * the just-committed version (its number then gets reused and the
    * live snapshot collides with the next commit's rename). */
  def vacuum(path: String, keep: Int = 2,
      stagingGraceMs: Long = 3600000,
      lockTimeoutMs: Long = 30000, staleLockMs: Long = 600000): Unit = {
    if (!Files.exists(versionsDir(path))) return
    withLock(path, lockTimeoutMs, staleLockMs) {
      val committed = versions(path)
      if (committed.nonEmpty) {
        val keepSet = committed.takeRight(math.max(keep, 1)).toSet ++
          currentVersion(path)
        FsUtil.listDir(versionsDir(path)).foreach { dir =>
          dir.getFileName.toString match {
            case s if s.matches("v\\d{8}") =>
              if (!keepSet.contains(s.drop(1).toInt)) FsUtil.deleteRec(dir)
            case _ =>
              // staging / crash debris — but an IN-FLIGHT commitIfCurrent
              // writes its snapshot here OUTSIDE the lock, so only reclaim
              // directories that have gone quiet for the grace period
              // (active writes keep refreshing the mtime).
              val age = try {
                System.currentTimeMillis() -
                  Files.getLastModifiedTime(dir).toMillis
              } catch { case _: Exception => 0L }
              if (age > stagingGraceMs) FsUtil.deleteRec(dir)
          }
        }
        writeAtomic(commitLog(path),
          committed.filter(keepSet.contains).mkString("\n"))
      }
    }
  }
}
