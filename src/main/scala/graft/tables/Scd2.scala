package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: dimension rows are versioned with
  * `[effective_from, effective_to)` validity and an `is_current` flag;
  * applying a change batch CLOSES the current version of every key whose
  * tracked attributes changed and INSERTS a new current version, leaving
  * history immutable. The reference keeps dims as latest-only overwrites
  * (`pipeline/scripts/dimensions.py:366-398` rewrites `dim_course`); SCD2
  * is the standard upgrade a warehouse needs the moment anyone asks
  * "what was this course's configuration LAST season?".
  *
  * Plan shape at scale: one shuffle by the natural key (the join of the
  * current slice against the batch), history rows pass through untouched
  * by a partition-prunable `is_current` filter, and the output unions
  * without a second shuffle. Dimensions are small next to facts, but the
  * same plan holds for 10^9-row dims: nothing here is driver-side.
  */
object Scd2 {

  /** Apply `changes` (one row per natural key, new attribute values,
    * effective timestamp in `changeTs`) to an SCD2 `dim`.
    *
    * @param dim      current SCD2 table: `key` + attrs + `effective_from`,
    *                 `effective_to` (null = open), `is_current`
    * @param changes  batch: `key` + the same attrs + `changeTs` column
    * @param key      natural key column name
    * @param attrs    tracked attribute columns (a change in ANY closes the
    *                 current version; equality is null-safe)
    * @param changeTs name of the timestamp column in `changes`
    */
  def apply(
      dim: DataFrame, changes: DataFrame, key: String,
      attrs: Seq[String], changeTs: String): DataFrame = {
    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))

    val c = changes.select(
      (col(key) +: attrs.map(col) :+ col(changeTs)).map(x => x): _*)
      .withColumnsRenamed(
        (key +: attrs :+ changeTs).map(n => n -> s"__c_$n").toMap)

    // null-safe key join + presence markers: key-nullness cannot stand in
    // for side-presence (a legitimately null-keyed dim row would match no
    // branch and silently vanish), so each side carries an explicit flag
    // that full_outer leaves null exactly when that side is absent.
    val joined = current.withColumn("__t_present", lit(true))
      .join(c.withColumn("__c_present", lit(true)),
        col(key) <=> col(s"__c_$key"), "full_outer")
    val changed: Column = attrs
      .map(a => !(col(a) <=> col(s"__c_$a")))
      .reduce(_ || _)
    val hasTarget = col("__t_present").isNotNull
    val hasChange = col("__c_present").isNotNull

    val dimCols = dim.columns

    // current version of a changed key → closed
    val closed = joined
      .filter(hasTarget && hasChange && changed)
      .select(dimCols.map {
        case "effective_to" => col(s"__c_$changeTs").as("effective_to")
        case "is_current"   => lit(false).as("is_current")
        case other          => col(other)
      }.toSeq: _*)

    // changed or brand-new key → new open version
    val opened = joined
      .filter(hasChange && (!hasTarget || changed))
      .select(dimCols.map {
        case `key`            => col(s"__c_$key").as(key)
        case "effective_from" => col(s"__c_$changeTs").as("effective_from")
        case "effective_to"   => lit(null).cast(
          dim.schema("effective_to").dataType).as("effective_to")
        case "is_current"     => lit(true).as("is_current")
        case a if attrs.contains(a) => col(s"__c_$a").as(a)
        case other            => col(other) // untracked cols carry over (null for new keys)
      }.toSeq: _*)

    // unchanged current rows pass through
    val untouched = joined
      .filter(hasTarget && (!hasChange || !changed))
      .select(dimCols.map(col).toSeq: _*)

    history.unionByName(untouched).unionByName(closed).unionByName(opened)
  }

  /** Bootstrap an SCD2 table from a latest-only snapshot: every row
    * becomes version 1, open-ended and current as of `from`. */
  def init(snapshot: DataFrame, from: Column): DataFrame =
    snapshot
      .withColumn("effective_from", from)
      // when(false, from) = a typed NULL matching `from` without touching
      // the expression tree (Column.expr is private in Spark 4)
      .withColumn("effective_to", when(lit(false), from))
      .withColumn("is_current", lit(true))

  /** Point-in-time lookup: the version of each key valid at `ts`
    * (`effective_from <= ts < effective_to`, open interval = current). */
  def asOf(dim: DataFrame, ts: Column): DataFrame =
    dim.filter(col("effective_from") <= ts &&
      (col("effective_to").isNull || col("effective_to") > ts))
}
