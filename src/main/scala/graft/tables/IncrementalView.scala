package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental view maintenance (IVM) for keyed SUM/COUNT rollups over an
  * [[IncrementalTable]] — the dbt-style gold models the reference rebuilds
  * from scratch every run (pipeline/gold/dimensions.py:366-398 rewrites
  * whole tables; pipeline/gold/README.md schedules full refreshes),
  * maintained here at O(changed data) instead.
  *
  * The materialization stores, per group key, a signed-merge-able state:
  *   - `<col>_sum`  — exact DECIMAL(38,4) accumulation of each measure
  *     (decimal, not double: delta merging must be associative AND exact,
  *     or the maintained view drifts from a full recompute under
  *     reordered partial aggregation);
  *   - `<col>_n`    — non-null contribution count of each measure, so a
  *     group whose every remaining value is NULL reads back a NULL sum
  *     (the classic IVM zero-vs-NULL trap);
  *   - `__rows`     — group cardinality; a group deleted down to zero
  *     rows leaves the view entirely;
  *   - `__src_version` — the table version this state reflects, carried
  *     in-band so the view is self-describing (no sidecar metadata).
  *
  * [[maintain]] advances the view to the table's current version by
  * applying [[IncrementalTable.diff]] as SIGNED deltas (insert = +1,
  * delete = -1) aggregated by key and merged into the stored state — one
  * shuffle over O(view + changed rows). Because diff itself scans only
  * the files the two manifests disagree on, maintaining a rollup after a
  * one-partition refresh of a 100 TB fact table costs one partition of
  * scan plus the view's own (grain-sized) rewrite, never a fact rescan.
  * SUM/COUNT are self-maintainable under deletes; MIN/MAX are not (a
  * deleted extremum needs the group's remaining rows) — callers needing
  * them recompute affected groups, which diff's partition values identify.
  *
  * The view itself commits through [[IncrementalTable]], so it is
  * versioned, time-travelable and OCC-protected like any other table.
  */
object IncrementalView {

  private def sumCol(c: String) = s"${c}_sum"
  private def nCol(c: String) = s"${c}_n"

  /** The signed aggregate of `rows` (sign = +1 for live/inserted rows,
    * -1 for deleted rows) — the one shape both [[build]] (all +1) and
    * the delta merge share. */
  private def signedRollup(rows: DataFrame, keys: Seq[String],
      measures: Seq[String], sign: Column): DataFrame = {
    val aggs =
      measures.flatMap { c =>
        // cast-then-negate keeps DECIMAL(28,4) on both branches; a
        // sign*value product would widen through DOUBLE and lose the
        // exactness the merge depends on
        val d = col(c).cast(DecimalType(28, 4))
        Seq(
          sum(when(col(c).isNotNull, when(sign > 0, d).otherwise(-d)))
            .as(sumCol(c)),
          sum(when(col(c).isNotNull, sign).otherwise(lit(0L))).as(nCol(c)))
      } :+ sum(sign).as("__rows")
    rows.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Materialize the rollup at the table's CURRENT version; returns the
    * source version the view now reflects. One full scan — the last one
    * the view ever needs. */
  def build(spark: SparkSession, tablePath: String, viewPath: String,
      keys: Seq[String], measures: Seq[String],
      store: CommitStore = LocalCommitStore): Int = {
    val v = IncrementalTable.currentVersion(tablePath, store).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $tablePath"))
    val base = IncrementalTable.read(spark, tablePath, Some(v), store)
    IncrementalTable.commitFull(
      signedRollup(base, keys, measures, lit(1L))
        .withColumn("__src_version", lit(v)),
      viewPath, store = store)
    v
  }

  /** Advance the view to the table's current version by merging the
    * signed row diff; no-op when already current. Returns the source
    * version the view reflects after the call. */
  def maintain(spark: SparkSession, tablePath: String, viewPath: String,
      keys: Seq[String], measures: Seq[String],
      store: CommitStore = LocalCommitStore): Int = {
    val cur = IncrementalTable.read(spark, viewPath, None, store)
    val verRow = cur.agg(max(col("__src_version"))).head
    if (verRow.isNullAt(0)) {
      // EMPTY view — prior deletes legitimately emptied every group
      // ("a group deleted down to zero rows leaves the view"), so there
      // is no watermark to diff from. Rebuild at the current version
      // instead of NPE-ing on the NULL max — maintainGrouped gained
      // this guard in round 8; the signed-delta path had the identical
      // hazard (found by IvmPropertySpec's random delete-everything-
      // then-refresh sequence: a maintaining stream would die
      // unrecoverably, replaying the same path on every restart).
      val toV = IncrementalTable.currentVersion(tablePath, store)
        .getOrElse(throw new IllegalArgumentException(
          s"no committed version at $tablePath"))
      val base = IncrementalTable.read(spark, tablePath, Some(toV), store)
      IncrementalTable.commitFull(
        signedRollup(base, keys, measures, lit(1L))
          .withColumn("__src_version", lit(toV)),
        viewPath, store = store)
      return toV
    }
    val fromV = verRow.getInt(0)
    val toV = IncrementalTable.currentVersion(tablePath, store).getOrElse(fromV)
    if (toV == fromV) return fromV
    val delta = signedRollup(
      IncrementalTable.diff(spark, tablePath, fromV, toV, store),
      keys, measures,
      when(col("__change") === "insert", lit(1L)).otherwise(lit(-1L)))
    // Merge = re-aggregate the union of stored state and delta state:
    // every column is a SUM, so the same rollup shape combines them.
    // Exact decimal arithmetic makes this bit-identical to a full
    // recompute regardless of merge order or batch grouping.
    val mergedAggs =
      measures.flatMap { c =>
        Seq(sum(col(sumCol(c))).as(sumCol(c)), sum(col(nCol(c))).as(nCol(c)))
      } :+ sum(col("__rows")).as("__rows")
    val merged = cur.drop("__src_version").unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(mergedAggs.head, mergedAggs.tail: _*)
      .filter(col("__rows") > 0)
      // an all-contributions-cancelled measure is NULL, not 0
      .select((keys.map(col) ++ measures.flatMap(c => Seq(
        when(col(nCol(c)) > 0, col(sumCol(c))).as(sumCol(c)),
        col(nCol(c)))) :+ col("__rows")): _*)
      .withColumn("__src_version", lit(toV))
    IncrementalTable.commitFull(merged, viewPath, store = store)
    toV
  }

  // ------------------------------------------- grouped-model maintenance

  /** Materialize an ARBITRARY per-group model (`model` must emit one row
    * per group and carry `keys` in its output) at the table's current
    * version. The complement of the signed SUM/COUNT path above: MIN/MAX,
    * countDistinct, CASE ladders — a full fact_rounds — are not
    * self-maintainable under deletes, so this family maintains them by
    * RE-AGGREGATING AFFECTED GROUPS instead of merging signed deltas. */
  def buildGrouped(
      spark: SparkSession, tablePath: String, viewPath: String,
      keys: Seq[String], model: DataFrame => DataFrame,
      attachKeys: DataFrame => DataFrame = identity,
      store: CommitStore = LocalCommitStore): Int = {
    val v = IncrementalTable.currentVersion(tablePath, store).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $tablePath"))
    val base = IncrementalTable.read(spark, tablePath, Some(v), store)
    // UNIFORM model input contract (r8): `model` always receives
    // attachKeys(base rows) — here, in maintainGrouped's empty-view
    // rebuild, and in its affected-group recompute — so a model that
    // relies on pre-attached derived keys behaves identically on the
    // bootstrap and every maintenance path.
    IncrementalTable.commitFull(
      model(attachKeys(base)).withColumn("__src_version", lit(v)),
      viewPath, store = store)
    v
  }

  /** Advance a grouped-model view to the table's current version:
    * row-diff the two versions (scans only the files the manifests
    * disagree on), reduce the diff to its DISTINCT GROUP KEYS, recompute
    * the model over exactly those groups' current rows (a broadcast
    * semi-join cut of the base — with the table partitioned or bucketed
    * on a key prefix this is a pruned read), and splice the recomputed
    * rows over the untouched view rows (broadcast anti-join). Per-batch
    * cost is O(changed groups' rows + view grain) — never a base rescan
    * — and the result is identical to a from-scratch model run by
    * construction, because every emitted row was produced by the model
    * itself over the group's full current rows (no merge arithmetic to
    * drift). Groups whose rows were all deleted vanish: they are
    * affected, and the model emits nothing for them.
    *
    * `attachKeys` maps raw base-table rows to rows CARRYING the group
    * key columns (identity when the table already stores them; a
    * derivation — e.g. course_id/round_id from raw telemetry fields —
    * when the model's grain is computed). It must be row-local: each
    * row's key depends only on that row. The model input contract is
    * UNIFORM: `model` receives attachKeys-ed rows on every path —
    * [[buildGrouped]]'s bootstrap, the empty-view rebuild here, and the
    * affected-group recompute — so pass the SAME attachKeys to
    * buildGrouped and maintainGrouped. */
  def maintainGrouped(
      spark: SparkSession, tablePath: String, viewPath: String,
      keys: Seq[String], model: DataFrame => DataFrame,
      attachKeys: DataFrame => DataFrame = identity,
      store: CommitStore = LocalCommitStore): Int = {
    val cur = IncrementalTable.read(spark, viewPath, None, store)
    val verRow = cur.agg(max(col("__src_version"))).head
    if (verRow.isNullAt(0)) {
      // EMPTY view — a prior batch legitimately deleted every group
      // ("groups whose rows were all deleted vanish"), so there is no
      // watermark to diff from. Rebuild at the current version instead
      // of NPE-ing on the NULL max (which would kill the maintaining
      // stream unrecoverably: every restart replays the same path).
      val toV = IncrementalTable.currentVersion(tablePath, store)
        .getOrElse(throw new IllegalArgumentException(
          s"no committed version at $tablePath"))
      val base = IncrementalTable.read(spark, tablePath, Some(toV), store)
      IncrementalTable.commitFull(
        model(attachKeys(base)).withColumn("__src_version", lit(toV)),
        viewPath, store = store)
      return toV
    }
    val fromV = verRow.getInt(0)
    val toV = IncrementalTable.currentVersion(tablePath, store).getOrElse(fromV)
    if (toV == fromV) return fromV
    val affected = attachKeys(
        IncrementalTable.diff(spark, tablePath, fromV, toV, store))
      .select(keys.map(col): _*).distinct()
    val base = IncrementalTable.read(spark, tablePath, Some(toV), store)
    // Key matching is NULL-SAFE (<=>): a model whose derived grain can
    // yield NULL keys (e.g. a concat over a nullable source field) still
    // groups those rows — plain equi-semi/anti joins would never match
    // the NULL-key group, leaving its stale view row in place forever.
    val baseK = attachKeys(base)
    val curD = cur.drop("__src_version")
    def keyCond(l: DataFrame, r: DataFrame) =
      keys.map(k => l(k) <=> r(k)).reduce(_ && _)
    val recomputed = model(
      baseK.join(broadcast(affected), keyCond(baseK, affected), "left_semi"))
    val untouched =
      curD.join(broadcast(affected), keyCond(curD, affected), "left_anti")
    IncrementalTable.commitFull(
      untouched.unionByName(recomputed)
        .withColumn("__src_version", lit(toV)),
      viewPath, store = store)
    toV
  }

  /** User-facing read: group keys, each measure's sum (NULL when no
    * non-null contributions remain) as DOUBLE, and the row count. */
  def read(spark: SparkSession, viewPath: String,
      keys: Seq[String], measures: Seq[String],
      store: CommitStore = LocalCommitStore): DataFrame =
    IncrementalTable.read(spark, viewPath, None, store)
      .select((keys.map(col) ++ measures.map(c =>
        col(sumCol(c)).cast(DoubleType).as(sumCol(c))) :+
        col("__rows")): _*)
}
