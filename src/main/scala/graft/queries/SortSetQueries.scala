package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import QueryDef._

/** Sort / limit / top-k (SURVEY §2.6) and set operations (§2.7). */
object SortSetQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // §2.6: ORDER BY ... LIMIT k top-k (common_queries.sql:49-50 "slowest
    // 10 rounds"). Spark plans TakeOrderedAndProject — per-partition top-k
    // then a k-row merge on the driver, no global sort even at 100 TB.
    QueryDef(
      "topk_order_limit",
      (s, d) =>
        t(s, d, "orders")
          .orderBy(desc_nulls_last("o_totalprice"), asc_nulls_last("o_orderkey"))
          .limit(10)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority")),
      Some("""SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
              ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
              LIMIT 10""")),

    // §2.6: bottom-k with a multi-key mixed-direction sort
    // (demo_all_insights.sql:266-274 "50 rarest sections").
    QueryDef(
      "bottomk_multi_key_sort",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n"))
          .orderBy(asc_nulls_last("n"), desc_nulls_last("l_partkey"))
          .limit(50),
      Some("""SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY l_partkey
              ORDER BY n ASC NULLS LAST, l_partkey DESC NULLS LAST LIMIT 50""")),

    // §2.7: SELECT DISTINCT (etl.py:165, dim_course.sql:18-21).
    QueryDef(
      "set_distinct",
      (s, d) =>
        t(s, d, "orders")
          .select(col("o_orderstatus"), col("o_orderpriority"))
          .distinct()
          .orderBy(col("o_orderstatus"), col("o_orderpriority")),
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
              ORDER BY o_orderstatus, o_orderpriority""")),

    // §2.7: unionByName(allowMissingColumns = true) across heterogeneous
    // schemas (etl.py:182-184) — the reference's subtle CSV-union
    // semantics: missing columns become NULL, alignment is BY NAME (never
    // positional). Reproduced here from two deliberately different
    // projections, then rolled up so the oracle can state the same thing
    // with UNION ALL + explicit NULLs.
    QueryDef(
      "set_union_by_name",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val a = li.filter(col("l_linestatus") === "O")
          .select(col("l_orderkey"), col("l_quantity"))
        val b = li.filter(col("l_linestatus") === "F")
          .select(col("l_extendedprice"), col("l_orderkey")) // different order + set
        a.unionByName(b, allowMissingColumns = true)
          .agg(
            count(lit(1)).as("n"),
            count(col("l_quantity")).as("n_qty"),
            count(col("l_extendedprice")).as("n_price"),
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"))
      },
      Some(s"""SELECT COUNT(*) AS n, COUNT(l_quantity) AS n_qty,
               COUNT(l_extendedprice) AS n_price,
               ${dsumSql("l_quantity")} AS sum_qty,
               ${dsumSql("l_extendedprice")} AS sum_price FROM (
                 SELECT l_orderkey, l_quantity, CAST(NULL AS DOUBLE) AS l_extendedprice
                 FROM lineitem WHERE l_linestatus = 'O'
                 UNION ALL
                 SELECT l_orderkey, CAST(NULL AS DOUBLE) AS l_quantity, l_extendedprice
                 FROM lineitem WHERE l_linestatus = 'F'
               )"""))
  )
}
