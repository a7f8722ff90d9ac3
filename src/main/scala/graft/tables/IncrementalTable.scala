package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}

/** Manifest-based incremental table versioning — the Iceberg-shaped
  * counterpart to [[VersionedTable]]'s full snapshots.
  *
  * [[VersionedTable]] rewrites the whole table per commit: right for
  * dimension/gold tables (the reference rewrites those too,
  * dimensions.py:366-398), wrong for a 100 TB fact table where one day
  * of one course changes. Here a commit is METADATA over immutable data
  * files (etl.py:639-682 gets the same via Iceberg's DELETE+append):
  *
  * {{{
  *   <path>/data/<hive partition dirs>/<commit>-part-*.parquet  (immutable)
  *   <path>/_manifests/m00000001      (schema line + live-file list)
  *   <path>/_commits  <path>/_latest  <path>/_lock
  * }}}
  *
  * Each manifest names the complete live-file set of its version, so
  *   - [[refreshPartitions]] writes and moves O(changed partitions) of
  *     DATA; the untouched partitions' files are carried by reference;
  *   - time travel ([[read]] with a version) and [[rollback]] are pure
  *     metadata — every version's files still exist until [[vacuum]];
  *   - [[fileChanges]] derives the (added, removed) file groups of any
  *     version pair by manifest set-difference;
  *   - [[diff]] is the row-level CDC read, same contract as
  *     VersionedTable.diff.
  *
  * Commit protocol: the heavy data write lands in a writer-unique
  * staging dir OUTSIDE the lock; under the table's OCC lock (shared
  * with vacuum) the staged files are renamed into `data/`, the new
  * manifest is written, the version is appended to the commit log, and
  * the pointer flips — all metadata writes are write-temp + atomic
  * rename, so readers always resolve a complete manifest. Staged files
  * are invisible until a manifest names them, which only happens under
  * the lock; concurrent refreshes therefore serialize at metadata speed
  * and compose (last writer wins per partition, both commits preserved
  * in history).
  *
  * Scale notes: manifest size is O(live files), kept in one text object
  * per version (Iceberg shards this into manifest lists; at 10⁵ files a
  * flat manifest is still single-digit MB). The data moves are renames,
  * never byte copies, on any HDFS-like filesystem.
  */
object IncrementalTable {

  private def dataDir(path: String): Path = Paths.get(path, "data")
  private def manifestsDir(path: String): Path = Paths.get(path, "_manifests")
  private def pointer(path: String): Path = Paths.get(path, "_latest")
  private def commitLog(path: String): Path = Paths.get(path, "_commits")
  private def fmt(v: Int): String = f"m$v%08d"

  private def writeAtomic(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".__tmp__")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** All committed versions, ascending (from the commit log). */
  def versions(path: String): Seq[Int] =
    if (!Files.exists(commitLog(path))) Nil
    else new String(Files.readAllBytes(commitLog(path)), StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).map(_.trim.toInt).toSeq.sorted

  /** The committed version the pointer names, if the table exists. */
  def currentVersion(path: String): Option[Int] =
    if (!Files.exists(pointer(path))) None
    else Some(new String(
      Files.readAllBytes(pointer(path)), StandardCharsets.UTF_8).trim.toInt)

  /** (schema, relative file paths) of a committed version's manifest. */
  private def manifest(path: String, v: Int): (StructType, Seq[String]) = {
    val lines = new String(
      Files.readAllBytes(manifestsDir(path).resolve(fmt(v))),
      StandardCharsets.UTF_8).split("\n").toSeq
    val schema = DataType.fromJson(lines.head).asInstanceOf[StructType]
    (schema, lines.tail.filter(_.nonEmpty))
  }

  /** Stage `df` as partitioned parquet in a writer-unique dir; returns
    * (staging dir, staged file paths relative to it). Runs OUTSIDE the
    * commit lock — this is the heavy part. */
  private def stage(
      df: DataFrame, path: String, partitionCols: Seq[String]): (Path, Seq[Path]) = {
    val staging = Paths.get(path, s".staging-${java.util.UUID.randomUUID()}")
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(staging.toString)
    (staging, FsUtil.parquetFiles(staging).map(staging.relativize))
  }

  /** Rename staged files into `data/` under a fresh commit prefix;
    * returns their new data-relative paths. Renames, not copies. */
  private def adopt(staging: Path, rels: Seq[Path], path: String): Seq[String] = {
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    rels.map { rel =>
      val parent = Option(rel.getParent)
      val target = parent match {
        case Some(p) => dataDir(path).resolve(p).resolve(
          s"$commitId-${rel.getFileName}")
        case None => dataDir(path).resolve(s"$commitId-${rel.getFileName}")
      }
      Files.createDirectories(target.getParent)
      Files.move(staging.resolve(rel), target, StandardCopyOption.ATOMIC_MOVE)
      dataDir(path).relativize(target).toString
    }
  }

  private def commitManifest(
      path: String, schema: StructType, files: Seq[String]): Int = {
    val committed = versions(path)
    val next = committed.lastOption.getOrElse(0) + 1
    Files.createDirectories(manifestsDir(path))
    writeAtomic(manifestsDir(path).resolve(fmt(next)),
      (schema.json +: files.sorted).mkString("\n"))
    writeAtomic(commitLog(path), (committed :+ next).mkString("\n"))
    writeAtomic(pointer(path), next.toString)
    next
  }

  /** Full commit: the new version's live set is exactly `df`'s files
    * (every previous file is logically removed, though still readable
    * via time travel until vacuumed). */
  def commitFull(
      df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
      lockTimeoutMs: Long = 30000, staleLockMs: Long = 600000): Int = {
    Files.createDirectories(Paths.get(path))
    val (staging, rels) = stage(df, path, partitionCols)
    try {
      VersionedTable.withLock(path, lockTimeoutMs, staleLockMs) {
        commitManifest(path, df.schema, adopt(staging, rels, path))
      }
    } finally FsUtil.deleteRec(staging)
  }

  /** Incremental partition refresh — the versioned form of
    * ParquetTable.refreshPartitions: only the hive partitions present in
    * `df` are replaced; every other partition's files carry over BY
    * REFERENCE into the new manifest. Data cost is O(changed
    * partitions); history, time travel and diff keep working because
    * the replaced files stay on disk for older manifests. */
  def refreshPartitions(
      df: DataFrame, path: String, partitionCols: Seq[String],
      lockTimeoutMs: Long = 30000, staleLockMs: Long = 600000): Int = {
    require(partitionCols.nonEmpty, "partition refresh needs partition columns")
    Files.createDirectories(Paths.get(path))
    val (staging, rels) = stage(df, path, partitionCols)
    try {
      // hive dirs touched by this refresh, e.g. "p=1-URGENT/sub=2"
      val changed = rels.map(r => Option(r.getParent).map(_.toString).getOrElse(""))
        .toSet
      VersionedTable.withLock(path, lockTimeoutMs, staleLockMs) {
        val carried = currentVersion(path) match {
          case None => Nil
          case Some(v) =>
            val (prevSchema, prevFiles) = manifest(path, v)
            require(prevSchema.fieldNames.sorted.sameElements(
                df.schema.fieldNames.sorted),
              s"refresh schema ${df.schema.fieldNames.mkString(",")} does not " +
                s"match table schema ${prevSchema.fieldNames.mkString(",")} — " +
                "align with ParquetTable.alignToSchema first")
            prevFiles.filterNot { f =>
              val dir = Option(Paths.get(f).getParent).map(_.toString).getOrElse("")
              changed.contains(dir)
            }
        }
        commitManifest(path, df.schema, carried ++ adopt(staging, rels, path))
      }
    } finally FsUtil.deleteRec(staging)
  }

  /** Targeted row deletion (DELETE WHERE — the compliance/right-to-be-
    * forgotten path) at O(affected partitions) cost: partitions holding
    * matching rows are rewritten WITHOUT them and committed as a new
    * manifest version; untouched partitions carry by reference. A
    * partition whose every row matches disappears from the new version
    * entirely — the subtlety [[refreshPartitions]] cannot express,
    * since it only replaces partitions present in the incoming frame
    * and an all-deleted partition produces no rows to land. Previous
    * versions still hold the deleted rows until [[vacuum]] reclaims
    * them (run vacuum(keep = 1) after a compliance delete to actually
    * destroy the data). Returns the new version (or the current one
    * when nothing matches — no empty commit). */
  def deleteWhere(
      spark: SparkSession, path: String, partitionCols: Seq[String],
      predicate: org.apache.spark.sql.Column,
      lockTimeoutMs: Long = 30000, staleLockMs: Long = 600000): Int = {
    require(partitionCols.nonEmpty, "deleteWhere works on partitioned tables")
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    def dirOf(f: String): String =
      Option(Paths.get(f).getParent).map(_.toString).getOrElse("")
    val v0 = currentVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $path"))
    val (_, files0) = manifest(path, v0)
    val cur = read(spark, path, Some(v0))
    // affected partition VALUES — bounded by partition count, the same
    // driver-side scale the manifest itself lives at
    val affected = cur.filter(predicate)
      .select(partitionCols.map(col): _*).distinct().collect()
    if (affected.isEmpty) return v0
    val affectedDirs = affected.map { r =>
      partitionCols.zipWithIndex.map { case (c, i) =>
        s"${escapePathName(c)}=${escapePathName(
          Option(r.get(i)).map(_.toString).getOrElse("__HIVE_DEFAULT_PARTITION__"))}"
      }.mkString("/")
    }.toSet
    val inAffected = affected.map { r =>
      partitionCols.zipWithIndex
        .map { case (c, i) => col(c) <=> lit(r.get(i)) }
        .reduce(_ && _)
    }.reduce(_ || _)
    // SQL DELETE semantics: only predicate-TRUE rows go; NULL keeps the
    // row, exactly as in unaffected partitions it never looked at.
    val keepRows = cur.filter(
      inAffected && !org.apache.spark.sql.functions.coalesce(predicate, lit(false)))
    val (staging, rels) = stage(keepRows, path, partitionCols)
    try {
      VersionedTable.withLock(path, lockTimeoutMs, staleLockMs) {
        val vNow = currentVersion(path).getOrElse(v0)
        val (schemaNow, filesNow) = manifest(path, vNow)
        // OCC guard (same shape as compact's): the rewrite was derived
        // from v0, so each affected dir's live file set must still be
        // exactly v0's — otherwise a concurrent commit to that dir would
        // be silently reverted to stale v0 contents. Fail; the caller
        // re-runs against the new current version.
        val byDir0 = files0.groupBy(dirOf)
        val byDirNow = filesNow.groupBy(dirOf)
        val raced = affectedDirs.filter(d =>
          byDir0.getOrElse(d, Nil).toSet != byDirNow.getOrElse(d, Nil).toSet)
        if (raced.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"deleteWhere read v$v0 but partitions ${raced.mkString(", ")} " +
              s"changed by a concurrent commit (now v$vNow); retry the delete")
        val carried = filesNow.filterNot(f => affectedDirs.contains(dirOf(f)))
        commitManifest(path, schemaNow, carried ++ adopt(staging, rels, path))
      }
    } finally FsUtil.deleteRec(staging)
  }

  /** OPTIMIZE as a manifest commit: every partition holding more than
    * `maxFilesPerPartition` live files is rewritten into coalesced files
    * and the result commits as a NEW version whose manifest swaps the
    * fragments for the compacted files. Untouched partitions carry by
    * reference; previous versions still read the original fragments
    * (time travel unaffected; the row-level diff across a compaction is
    * EMPTY — it is a metadata-plus-layout rewrite, never a data change);
    * [[vacuum]] eventually reclaims the fragments.
    *
    * Concurrency (Delta OPTIMIZE semantics): the heavy rewrite runs
    * outside the lock against the version it read; under the lock each
    * compacted partition is swapped ONLY IF its live file set is still
    * exactly what was compacted — a partition refreshed concurrently
    * keeps the refresher's files and this compactor's rewrite of it is
    * discarded (skip, not fail). Returns (filesBefore, filesAfter) over
    * the whole table at commit time; equal counts mean nothing needed
    * compacting (no empty commit is made). */
  def compact(
      spark: SparkSession, path: String, partitionCols: Seq[String],
      maxFilesPerPartition: Int = 1,
      lockTimeoutMs: Long = 30000, staleLockMs: Long = 600000): (Int, Int) = {
    require(partitionCols.nonEmpty, "compaction works on partitioned tables")
    def dirOf(f: String): String =
      Option(Paths.get(f).getParent).map(_.toString).getOrElse("")
    val v0 = currentVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $path"))
    val (schema0, files0) = manifest(path, v0)
    val frag = files0.groupBy(dirOf)
      .filter(_._2.size > maxFilesPerPartition)
    if (frag.isEmpty) return (files0.size, files0.size)

    // heavy rewrite outside the lock: read ONLY the fragmented
    // partitions, one task per partition so each dir lands as one file
    val abs = frag.values.flatten
      .map(f => dataDir(path).resolve(f).toString).toSeq
    val df = ParquetTable.alignToSchema(
        spark.read.option("basePath", dataDir(path).toString).parquet(abs: _*),
        schema0)
      .repartition(partitionCols.map(col): _*)
    val (staging, rels) = stage(df, path, partitionCols)
    try {
      VersionedTable.withLock(path, lockTimeoutMs, staleLockMs) {
        val vNow = currentVersion(path).getOrElse(v0)
        val (schemaNow, filesNow) = manifest(path, vNow)
        val nowByDir = filesNow.groupBy(dirOf)
        val safe = frag.keySet.filter(d =>
          nowByDir.get(d).map(_.toSet) == frag.get(d).map(_.toSet))
        if (safe.isEmpty) (filesNow.size, filesNow.size)
        else {
          val keep = filesNow.filterNot(f => safe.contains(dirOf(f)))
          val adopted = adopt(staging,
            rels.filter(r => safe.contains(dirOf(r.toString))), path)
          commitManifest(path, schemaNow, keep ++ adopted)
          (filesNow.size, keep.size + adopted.size)
        }
      }
    } finally FsUtil.deleteRec(staging)
  }

  /** Read a committed snapshot: the current one, or `version` for time
    * travel. Partition columns come back from the hive dir names
    * (basePath) and every column is cast to the manifest's recorded
    * schema, so reads are schema-stable across versions — including an
    * empty version, which reads as an empty frame of the right schema. */
  def read(spark: SparkSession, path: String, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $path"))
    require(versions(path).contains(v),
      s"version $v not in committed set ${versions(path)} at $path")
    val (schema, files) = manifest(path, v)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      val abs = files.map(f => dataDir(path).resolve(f).toString)
      ParquetTable.alignToSchema(
        spark.read.option("basePath", dataDir(path).toString).parquet(abs: _*),
        schema)
    }
  }

  /** Metadata-only rollback: point the table at an earlier version. */
  def rollback(path: String, version: Int): Unit = {
    require(versions(path).contains(version),
      s"version $version not committed at $path")
    writeAtomic(pointer(path), version.toString)
  }

  /** The (added, removed) data-file groups between two versions — the
    * manifest set-difference that IS the incremental commit. */
  def fileChanges(path: String, fromV: Int, toV: Int): (Seq[String], Seq[String]) = {
    val from = manifest(path, fromV)._2.toSet
    val to = manifest(path, toV)._2.toSet
    ((to -- from).toSeq.sorted, (from -- to).toSeq.sorted)
  }

  /** Row-level change feed between two versions (same contract as
    * VersionedTable.diff): inserts = rows only in `to`, deletes = rows
    * only in `from`; an update is its delete+insert pair. */
  def diff(spark: SparkSession, path: String, fromV: Int, toV: Int): DataFrame = {
    val before = read(spark, path, Some(fromV))
    val after = read(spark, path, Some(toV))
    after.exceptAll(before).withColumn("__change", lit("insert"))
      .unionByName(before.exceptAll(after).withColumn("__change", lit("delete")))
  }

  /** Drop all but the newest `keep` versions (current always kept), then
    * delete every data file no kept manifest references. Serializes with
    * commits under the table lock, so an in-flight commit's just-adopted
    * files can't be swept: files only enter `data/` under this same
    * lock, and unreferenced files under `data/` belong to dropped
    * versions or to a commit that died mid-adopt (its version was never
    * logged, so its files are unreachable debris). */
  def vacuum(path: String, keep: Int = 2,
      lockTimeoutMs: Long = 30000, staleLockMs: Long = 600000): Unit = {
    if (!Files.exists(manifestsDir(path))) return
    VersionedTable.withLock(path, lockTimeoutMs, staleLockMs) {
      val committed = versions(path)
      if (committed.nonEmpty) {
        val keepSet = committed.takeRight(math.max(keep, 1)).toSet ++
          currentVersion(path)
        val live = keepSet.toSeq.sorted.flatMap(v => manifest(path, v)._2).toSet
        FsUtil.parquetFiles(dataDir(path)).foreach { f =>
          if (!live.contains(dataDir(path).relativize(f).toString))
            Files.delete(f)
        }
        committed.filterNot(keepSet.contains).foreach { v =>
          Files.deleteIfExists(manifestsDir(path).resolve(fmt(v))); ()
        }
        writeAtomic(commitLog(path),
          committed.filter(keepSet.contains).mkString("\n"))
      }
    }
  }
}
