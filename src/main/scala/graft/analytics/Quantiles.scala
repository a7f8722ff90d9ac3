package graft.analytics

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact GLOBAL quantile elements at bounded memory — the scale path
  * for the one aggregate Spark only offers as sort-the-world
  * (`percentile`) or approximate (`approx_percentile`).
  *
  * Two passes, both bounded:
  *   1. ONE aggregate computes the row count and, per requested p, an
  *      approximate LOWER and UPPER bracket value (approx_percentile at
  *      p ± eps). The sketch's rank error is ≤ n/accuracy, so with
  *      eps = 4/accuracy the true rank-k element provably lies between
  *      the brackets; the sketch state is O(accuracy · log n), never
  *      O(n).
  *   2. ONE aggregate counts rows strictly below each lower bracket,
  *      then a per-p TakeOrdered over the bracketed SLICE (≈ 10n /
  *      accuracy rows — at accuracy 10⁴ that is 0.1% of the data) picks
  *      the exact k-th smallest as (k − c_lo)-th of the slice.
  *
  * The output is an exact ELEMENT of the data, so it is deterministic
  * and engine-independent even though the brackets come from an
  * approximate, merge-order-dependent sketch — the sketch only narrows
  * the search, it never touches the answer. `bracketed` records that
  * the bracket held (count proof, not trust); a production caller
  * widens eps and retries on false.
  *
  * Rank convention: the p-quantile is the k-th smallest element with
  * k = max(1, ⌈p·n⌉) — an actual element, no interpolation, duplicates
  * counted with multiplicity.
  */
object Quantiles {

  def exactQuantiles2Pass(
      df: DataFrame, valueCol: String, ps: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantile levels must be in (0, 1]: $ps")
    val spark = df.sparkSession
    val eps = 4.0 / accuracy
    val v = col(valueCol)

    // pass 1: count + brackets, one aggregate row. n counts NON-NULL
    // values only — approx_percentile and the slice ranking both ignore
    // NULLs, so the rank arithmetic must rank the same population.
    val bracketAggs = ps.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        approx_percentile(v, lit(math.max(0.0, p - eps)), lit(accuracy))
          .as(s"lo_$i"),
        approx_percentile(v, lit(math.min(1.0, p + eps)), lit(accuracy))
          .as(s"hi_$i"))
    }
    val firstRow: Row = df.agg(count(v).as("n"), bracketAggs: _*)
      .collect()(0)
    val n = firstRow.getLong(0)

    // pass 2a: strict-below counts for every lower bracket, one
    // aggregate. Skipped entirely on an empty (or all-NULL) input —
    // the sums would be NULL and there is nothing to rank.
    val lows = ps.indices.map(i => firstRow.get(1 + 2 * i))
    val highs = ps.indices.map(i => firstRow.get(2 + 2 * i))
    val belowRow: Row =
      if (n == 0) null
      else df.agg(
        count(lit(1)).as("_ignored"),
        ps.indices.map(i =>
          sum(when(v < lit(lows(i)), 1L).otherwise(0L)).as(s"c_$i")): _*)
        .collect()(0)

    // pass 2b: exact element per p from the bracketed slice. Every
    // valid p's TakeOrdered aggregate is a 1-row frame; crossJoin them
    // into ONE plan and collect once — previously this was one
    // sequential job per p (5 driver round trips, 5 separate scans with
    // idle tails). The per-p subtrees are unchanged, so each picked
    // element is bit-identical; the crossJoin of 1-row frames adds no
    // shuffle (guide §2.6: overlap independent work — here folded into
    // a single action).
    val kRanks = ps.indices.map { i =>
      val p = ps(i)
      val k = math.max(1L, math.ceil(p * n).toLong)
      val cLo =
        if (n == 0 || belowRow.isNullAt(1 + i)) 0L
        else belowRow.getLong(1 + i)
      (k, k - cLo)
    }
    // sliceRank far beyond the design bound (≈ 10n/accuracy) means the
    // bracket did not hold — report unbracketed rather than TakeOrdered
    // a corpus-sized prefix
    val valid = ps.indices.filter { i =>
      val sliceRank = kRanks(i)._2
      sliceRank > 0 && n > 0 && sliceRank <= Int.MaxValue.toLong
    }
    val pickedRow: Row =
      if (valid.isEmpty) null
      else valid.map { i =>
        df.filter(v >= lit(lows(i)) && v <= lit(highs(i)))
          .orderBy(v.asc).limit(kRanks(i)._2.toInt)
          .agg(max(v).as(s"m_$i"), count(lit(1)).as(s"c_$i"))
      }.reduce(_.crossJoin(_)).collect()(0)
    val rows = ps.zipWithIndex.map { case (p, i) =>
      val (k, sliceRank) = kRanks(i)
      if (!valid.contains(i)) (p, n, k, null: Any, false)
      else {
        val pos = valid.indexOf(i)
        val reached = pickedRow.getLong(2 * pos + 1) == sliceRank
        (p, n, k, if (reached) pickedRow.get(2 * pos) else null, reached)
      }
    }
    val valueType = df.schema(valueCol).dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("n_rows",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("value", valueType),
      org.apache.spark.sql.types.StructField("bracketed",
        org.apache.spark.sql.types.BooleanType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        Row(r._1, r._2, r._3, r._4, r._5)), 1),
      schema)
  }
}
