package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — enrich each left row with the latest
  * right row whose timestamp is at or before the left row's. The
  * canonical telemetry/market-data operator Spark has no native node for.
  *
  * NOT implemented as a range join: `l JOIN r ON l.key = r.key AND
  * r.ts <= l.ts` + max-per-group explodes quadratically inside hot keys
  * (every left row matches every earlier right row before the reduction).
  * Instead the two sides are TAGGED AND UNIONED, then a keyed
  * last-non-null carry-forward window assigns each left row the most
  * recent right payload in one pass:
  *
  *   - one shuffle on the key column(s), no pair blow-up — cost is
  *     O((|L| + |R|) log partition) from the per-partition sort;
  *   - at equal timestamps the right row sorts FIRST (inclusive "at or
  *     before" semantics, matching DuckDB/kdb ASOF `>=`);
  *   - ties inside the right side resolve by `rightTieCol` (the row with
  *     the greatest tie value wins), so the result is deterministic;
  *   - all payload columns travel in ONE struct, so they always come
  *     from the SAME right row — even when individual fields are NULL
  *     (a per-column carry would mix rows).
  *
  * Returns every left row (left-outer semantics) with `payloadCols`
  * from the matched right row, NULL where no right row precedes. */
object AsOfJoin {

  def asof(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      payloadCols: Seq[String],
      rightTieCol: Option[String] = None): DataFrame = {
    require(payloadCols.nonEmpty, "as-of join needs payload columns to carry")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payloadCols.contains),
      s"payload columns ${payloadCols.mkString(",")} collide with left side")

    val rTagged = right
      .select(((keyCols :+ tsCol) ++
          rightTieCol.filterNot((payloadCols ++ keyCols :+ tsCol).contains))
        .map(col) ++ payloadCols.map(col): _*)
      // join semantics: a NULL key or NULL timestamp on the right can
      // never match (DuckDB ASOF `l.ts >= r.ts` is false on NULL; equi
      // keys don't match NULLs) — without this filter the NULL-ts row
      // would sort FIRST and leak its payload into early left rows.
      .filter(col(tsCol).isNotNull && keyCols.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__p", struct(payloadCols.map(col): _*))
      .withColumn("__side", lit(1))
      // Tie resolution orders the column in its NATIVE type: a cast
      // (e.g. to long) would silently NULL a string event id and degrade
      // "greatest tie wins" to arbitrary. Non-orderable tie types fail
      // fast at analysis, which is the correct contract.
      .withColumn("__tie", rightTieCol.map(col).getOrElse(lit(0L)))
      .select((keyCols :+ tsCol).map(col) ++ Seq(col("__p"), col("__side"), col("__tie")): _*)
    val pType = rTagged.schema("__p").dataType
    val tieType = rTagged.schema("__tie").dataType

    val lTagged = left
      .withColumn("__p", lit(null).cast(pType))
      .withColumn("__side", lit(0))
      // Left rows never contribute a payload and always sort after the
      // same-ts right rows (__side desc), so their tie value is inert.
      .withColumn("__tie", lit(null).cast(tieType))
    // align: right side gains the left-only columns as NULLs
    val rAligned = leftCols.filterNot((keyCols :+ tsCol).contains)
      .foldLeft(rTagged)((d, c) =>
        d.withColumn(c, lit(null).cast(lTagged.schema(c).dataType)))
      .select(lTagged.columns.map(col): _*)

    // At one (key, ts): right rows first (__side desc → 1 before 0, the
    // ASOF >= inclusivity), ordered among themselves by tie so the last
    // right row (greatest tie) wins the carry.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(asc_nulls_first(tsCol), desc("__side"), asc_nulls_first("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rAligned)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"__p.$c").as(c)): _*)
  }
}
