package graft.tables

/** Rename-free, lock-free optimistic commit log over [[CommitStore]]'s
  * primitives — the protocol that survives the move from local FS to
  * the reference's own deployment substrate (S3A/MinIO,
  * docker-compose.yml), where atomic rename and O_EXCL do not exist.
  *
  * Layout (all under the table path, one IMMUTABLE object per commit):
  * {{{
  *   <table>/_manifests/m00000001    committed manifest objects
  *   <table>/_manifests/m00000002    (putIfAbsent-minted, never mutated)
  *   <table>/_latest                 rollback pin (CAS-updated, optional)
  * }}}
  *
  * THE COMMIT POINT IS ONE CONDITIONAL PUT (Delta's log-entry rule):
  * version v is committed iff object `m<v>` exists, and the current
  * version is simply the largest minted one. There is no second
  * publish step whose failure could strand a half-commit, and no
  * mutable shared log file to corrupt. [[rollback]] writes a PIN
  * (`"<pinned> <maxAtRollback>"`) that redirects reads to an older
  * version; the pin expires automatically as soon as anyone commits a
  * version newer than `maxAtRollback`, so commits themselves never
  * touch the pointer.
  *
  * Invariants, each proven against a hostile store
  * (CommitProtocolSpec runs them on [[FaultyCommitStore]]):
  *
  *  1. '''No two writers ever mint the same version.''' Creation is
  *     [[CommitStore.putIfAbsent]]; exactly one concurrent caller wins.
  *  2. '''Readers never see a partial version.''' A manifest is one
  *     conditional PUT of a complete object (atomic on every store).
  *  3. '''Ambiguous writes are safe.''' If a PUT lands but the response
  *     is lost (the classic S3 retry hazard), the writer's retry finds
  *     the winning object, recognizes its own writer token in the
  *     header, and treats the commit as succeeded instead of
  *     double-committing.
  *  4. '''A crash either commits nothing or commits completely.'''
  *     Before the PUT: nothing committed; staged data is unreferenced
  *     debris (vacuum reclaims it). After the PUT: the commit is
  *     durable and current — there is no intermediate step left to
  *     lose.
  *  5. '''Lost updates are impossible through [[commit]].''' A writer
  *     renders its payload from the version it read and can only mint
  *     at read-version + 1; if anyone committed in between, the mint
  *     target is already taken, the putIfAbsent loses, and the loop
  *     re-reads before retrying. (A payload can never skip past a
  *     version it did not read, because versions are dense: the mint
  *     target is always `max(versions) + 1`.)
  *
  * Data files are NOT this layer's concern: a table format stages them
  * as uniquely-named immutable objects and the manifest names them —
  * rename-free by construction (Spark's object-store committers
  * already write task files to their final unique keys).
  */
final class ManifestLog(store: CommitStore, table: String) {

  private def mdir = s"$table/_manifests"
  private def mkey(v: Int) = f"$mdir/m$v%08d"
  private def ptr = s"$table/_latest"

  /** Writer identity for ambiguous-retry recognition (invariant 3). */
  private val writerToken = java.util.UUID.randomUUID().toString

  private def header(token: String) = s"#graft-commit writer=$token"

  /** Committed versions, ascending — the object listing IS the log. */
  def versions: Seq[Int] =
    store.list(mdir).flatMap { k =>
      val name = k.substring(k.lastIndexOf('/') + 1)
      if (name.matches("m\\d{8}")) Some(name.drop(1).toInt) else None
    }.sorted

  /** Payload of a committed manifest (header stripped), if it exists. */
  def manifest(v: Int): Option[String] =
    store.get(mkey(v)).map(stripHeader)

  private def stripHeader(raw: String): String =
    raw.linesWithSeparators.filterNot(_.startsWith("#graft-commit")).mkString

  /** Current version given one versions-listing snapshot: the newest
    * minted manifest, unless a still-live rollback pin redirects to an
    * older one. A pin is live while no version newer than its recorded
    * `maxAtRollback` exists — the first commit after a rollback
    * supersedes it without writing the pointer at all. */
  private def currentOf(vs: Seq[Int]): Option[Int] = {
    val maxV = vs.lastOption
    store.get(ptr).map(_.trim.split("\\s+")) match {
      case Some(Array(pinned, maxAt))
          if pinned.toIntOption.isDefined && maxAt.toIntOption.isDefined &&
            maxV.forall(_ <= maxAt.toInt) =>
        pinned.toIntOption
      case _ => maxV
    }
  }

  def currentVersion: Option[Int] = currentOf(versions)

  final case class CommitLost(winner: Int)
    extends RuntimeException(
      s"version $winner was minted concurrently; re-read and retry")

  /** Mint `max(vs) + 1` for ONE listing snapshot `vs` — the commit
    * point is the single conditional PUT. The snapshot matters: the
    * mint target and whatever the payload was derived from must come
    * from the SAME listing, or a payload rendered against version v
    * could mint at v+2 and silently drop v+1's changes (the lost
    * update CommitProtocolSpec's concurrent test caught against an
    * earlier draft that re-listed here). An AMBIGUOUS put (landed
    * server-side, failure reported) is converted back to success by
    * finding our own writer token in the winning object. A thrown
    * store exception is a crash and propagates — but if the PUT
    * landed, the commit is already complete and durable. */
  private def mintNext(vs: Seq[Int], payload: String, op: String): Int = {
    val next = vs.lastOption.getOrElse(0) + 1
    // ts/op ride AFTER the writer token so the ambiguous-retry
    // startsWith check stays prefix-stable across retries
    val content =
      s"${header(writerToken)} ts=${System.currentTimeMillis()} op=$op\n" + payload
    val won = store.putIfAbsent(mkey(next), content) ||
      store.get(mkey(next)).exists(_.startsWith(header(writerToken)))
    if (won) next else throw CommitLost(next)
  }

  /** Unconditional commit: mint the next version with `payload`,
    * regardless of what the current version is. For OVERWRITE-style
    * writers whose payload does not derive from prior state (and for
    * callers already serialized by an external lock); state-merging
    * lockless writers use [[commitAt]] or [[commit]]. */
  def commitOnce(payload: String, op: String = "commit"): Int =
    mintNext(versions, payload, op)

  /** OCC commit: mint only if the current version still equals
    * `expectedCurrent` (the version the payload was derived from;
    * None = expect an empty table). Throws [[CommitLost]] when stale or
    * beaten to the mint — the caller re-reads and retries. */
  def commitAt(expectedCurrent: Option[Int], payload: String,
      op: String = "commit"): Int = {
    val vs = versions
    if (currentOf(vs) != expectedCurrent)
      throw CommitLost(vs.lastOption.getOrElse(0))
    mintNext(vs, payload, op)
  }

  /** One committed version's audit record (DESCRIBE HISTORY's row). */
  final case class CommitInfo(
      version: Int, timestampMs: Long, operation: String, payloadLines: Int)

  /** The table's commit history, ascending — parsed from the immutable
    * manifest headers, so it needs no extra bookkeeping objects and
    * survives everything the manifests survive. Pre-header manifests
    * (none in practice) report ts=0, op=unknown. */
  def history: Seq[CommitInfo] = versions.map { v =>
    val raw = store.get(mkey(v)).getOrElse("")
    val head = raw.linesIterator.nextOption().getOrElse("")
    def field(k: String): Option[String] =
      s"$k=(\\S+)".r.findFirstMatchIn(head).map(_.group(1))
    CommitInfo(
      v,
      field("ts").flatMap(_.toLongOption).getOrElse(0L),
      field("op").getOrElse("unknown"),
      stripHeader(raw).linesIterator.count(_.nonEmpty))
  }

  /** The optimistic commit loop (what Delta/Iceberg writers run): read
    * the current (version, payload), derive the next payload, mint
    * against the same listing snapshot; on collision re-read and
    * re-derive. `render(None)` is the initial commit of an empty
    * table. No lost updates: a payload derived from version v can only
    * mint at the snapshot whose max it was read from — if anyone
    * committed in between, the target is taken and the loop re-reads. */
  def commit(render: Option[(Int, String)] => String, maxRetries: Int = 50,
      op: String = "commit"): Int = {
    var attempt = 0
    while (attempt < maxRetries) {
      val vs = versions
      val cur = currentOf(vs).flatMap(v => manifest(v).map(v -> _))
      try return mintNext(vs, render(cur), op)
      catch { case _: CommitLost => attempt += 1 }
    }
    throw new java.util.ConcurrentModificationException(
      s"commit on $table lost $maxRetries consecutive races")
  }

  /** Rollback: CAS-write the pin `"<v> <maxVersions>"`. Reads resolve
    * to `v` until someone commits past the recorded max, which
    * supersedes the pin (commit-wins semantics, as Delta RESTORE). */
  def setPointer(v: Int): Unit = {
    val vs = versions
    require(vs.contains(v), s"version $v not committed at $table")
    val pin = s"$v ${vs.last}"
    var done = false
    while (!done) {
      val cur = store.get(ptr)
      done = cur.map(_.trim).contains(pin) || store.putIfMatch(ptr, pin, cur)
    }
  }

  /** Delete the manifest objects of `drop`ped versions (vacuum's
    * metadata half). Never deletes the current or newest version, so
    * version numbers cannot reuse. */
  def dropVersions(drop: Seq[Int]): Unit = {
    val protect = currentVersion.toSet ++ versions.lastOption
    drop.filterNot(protect.contains).foreach(v => store.delete(mkey(v)))
  }
}
