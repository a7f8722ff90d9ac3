package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import QueryDef._

/** Aggregation operators A1–A17 from SURVEY.md §2.4, each re-expressed over
  * the synthetic testdata tables with a DuckDB oracle.
  *
  * All groupBys shuffle on their keys with map-side partial aggregation
  * (Spark plans HashAggregate(partial) → Exchange → HashAggregate(final)
  * automatically); at 100 TB the only knob is shuffle partition count /
  * AQE coalescing — nothing here collects to the driver.
  */
object AggQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // A1: groupBy min/max/countDistinct (sections-per-hole shape).
    // Ref: pipeline/scripts/generate_sections_per_hole.py:53-61
    QueryDef(
      "a1_min_max_count_distinct",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            min(col("l_linenumber")).as("min_line"),
            max(col("l_linenumber")).as("max_line"),
            countDistinct(col("l_partkey")).as("distinct_parts"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
              MIN(l_linenumber) AS min_line,
              MAX(l_linenumber) AS max_line,
              COUNT(DISTINCT l_partkey) AS distinct_parts
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // A2: mode() dominant value per group + count(*) noise filter (>= 5).
    // Spark's mode() breaks frequency ties arbitrarily, so the engine pins
    // deterministic semantics (smallest value among the most frequent) via
    // max_by over value counts — same rewrite the survey recommends for
    // pre-3.4 Spark, and it is order-independent under partial aggregation.
    // Ref: pipeline/scripts/dimensions.py:118-124
    QueryDef(
      "a2_mode_dominant",
      (s, d) => {
        val vc = t(s, d, "lineitem")
          .groupBy(col("l_suppkey"), col("l_linenumber"))
          .agg(count(lit(1)).as("c"))
        vc.groupBy(col("l_suppkey"))
          .agg(
            max_by(col("l_linenumber"), struct(col("c"), -col("l_linenumber")))
              .as("dominant_line"),
            sum(col("c")).as("n_fixes"))
          .filter(col("n_fixes") >= 5)
          .orderBy(col("l_suppkey"))
      },
      // DuckDB mode() breaks ties differently from Spark's; pin identical
      // semantics on both sides: smallest value among the most frequent.
      Some("""WITH vc AS (
                SELECT l_suppkey, l_linenumber, COUNT(*) AS c
                FROM lineitem GROUP BY l_suppkey, l_linenumber
              ), tot AS (
                SELECT l_suppkey, CAST(SUM(c) AS BIGINT) AS n_fixes FROM vc GROUP BY l_suppkey
              ), best AS (
                SELECT l_suppkey,
                       MIN(l_linenumber) FILTER (WHERE rk = 1) AS dominant_line
                FROM (SELECT *, RANK() OVER (PARTITION BY l_suppkey ORDER BY c DESC) AS rk FROM vc)
                GROUP BY l_suppkey
              )
              SELECT b.l_suppkey, b.dominant_line, t.n_fixes
              FROM best b JOIN tot t ON b.l_suppkey = t.l_suppkey
              WHERE t.n_fixes >= 5
              ORDER BY b.l_suppkey""")),

    // A3: global min/max stats (topology typing shape).
    // Ref: pipeline/scripts/dimensions.py:163-171
    QueryDef(
      "a3_global_min_max",
      (s, d) =>
        t(s, d, "events").agg(
          min(col("ts")).as("min_ts"),
          max(col("ts")).as("max_ts"),
          max(col("user_id")).as("max_user"),
          min(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("min_value")),
      Some("""SELECT MIN(ts) AS min_ts, MAX(ts) AS max_ts,
              MAX(user_id) AS max_user,
              CAST(MIN(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS min_value
              FROM events""")),

    // A4: conditional counting SUM(CASE WHEN ...) — used ~100x in the ref.
    // Ref: gold/models/gold/fact_rounds.sql:53,74-84
    QueryDef(
      "a4_conditional_count",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"),
            sum(when(col("o_totalprice") > 100000.0, 1).otherwise(0)).as("n_big"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
              CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
              CAST(SUM(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
              COUNT(*) AS n_orders
              FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // A5: COUNT(*)/agg FILTER (WHERE ...) clause.
    // Ref: queries/exploration/null_pattern_analysis.sql:18-20
    QueryDef(
      "a5_filter_clause",
      (s, d) =>
        t(s, d, "events")
          .groupBy(col("event_type"))
          .agg(
            count(when(col("value") > 50.0, lit(1))).as("n_high"),
            dsum(when(col("value") > 50.0, col("value")), 6).as("sum_high"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
               COUNT(*) FILTER (WHERE value > 50.0) AS n_high,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE value > 50.0) AS DOUBLE) AS sum_high,
               COUNT(*) AS n
               FROM events GROUP BY event_type ORDER BY event_type""")),

    // A6: COUNT(DISTINCT CASE WHEN ... THEN k END).
    // Ref: silver_normalized/global_overview.sql:42,50-53
    QueryDef(
      "a6_count_distinct_case",
      (s, d) =>
        t(s, d, "events").agg(
          countDistinct(when(col("event_type") === "click", col("user_id"))).as("clickers"),
          countDistinct(when(col("value") > 250.0, col("user_id"))).as("high_value_users"),
          countDistinct(col("user_id")).as("users")),
      Some("""SELECT
              COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS clickers,
              COUNT(DISTINCT CASE WHEN value > 250.0 THEN user_id END) AS high_value_users,
              COUNT(DISTINCT user_id) AS users
              FROM events""")),

    // A7: BOOL_OR(coalesce(flag, false)) round-level rollup.
    // Ref: silver_normalized/dim_round.sql:79-83
    QueryDef(
      "a7_bool_or_rollup",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(
            bool_or(col("o_orderstatus") === "F").as("any_finished"),
            bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey,
              BOOL_OR(o_orderstatus = 'F') AS any_finished,
              BOOL_AND(o_totalprice > 1000.0) AS all_over_1k,
              COUNT(*) AS n_orders
              FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),

    // A8: median — exact interpolated percentile on both sides (the ref
    // uses APPROX_PERCENTILE; sketches don't hash-match across engines, so
    // the gate pins the exact variant; Bench carries the approx one).
    // Ref: silver_normalized/global_overview.sql:59
    QueryDef(
      "a8_median",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_quantity, 0.5)").as("median_qty"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
              QUANTILE_CONT(l_quantity, 0.5) AS median_qty,
              COUNT(*) AS n
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // A9: STDDEV — made order-independent by computing sample stddev from
    // exact decimal sums on both sides (float accumulation order differs
    // between engines and across Spark partitions).
    // Ref: queries/exploration/bottleneck_analysis.sql:24
    QueryDef(
      "a9_stddev_exact",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_linestatus"))
          .agg(
            dsum(col("l_quantity"), 4).as("sx"),
            sum((col("l_quantity") * col("l_quantity")).cast(DecimalType(28, 8)))
              .cast(DoubleType).as("sxx"),
            count(col("l_quantity")).as("n"))
          .select(
            col("l_linestatus"),
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
              .as("stddev_qty"),
            col("n"))
          .orderBy(col("l_linestatus")),
      Some("""SELECT l_linestatus,
              SQRT((sxx - sx*sx/n) / (n-1)) AS stddev_qty, n FROM (
                SELECT l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
                CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
                COUNT(l_quantity) AS n
                FROM lineitem GROUP BY l_linestatus
              ) ORDER BY l_linestatus""")),

    // A10: ARRAY_SORT(ARRAY_DISTINCT(ARRAY_AGG(x))) per group.
    // Ref: gold/models/gold/dim_course.sql:31,39
    QueryDef(
      "a10_array_agg_sorted",
      (s, d) =>
        t(s, d, "nation")
          .groupBy(col("n_regionkey"))
          .agg(array_join(array_sort(collect_set(col("n_name"))), "|").as("nations"))
          .orderBy(col("n_regionkey")),
      Some("""SELECT n_regionkey,
              ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(n_name))), '|') AS nations
              FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // A11: ARRAY_JOIN(ARRAY_AGG(DISTINCT x ORDER BY x), '+') combination key.
    // Ref: dashboard/utils/queries.py:589-621
    QueryDef(
      "a11_array_join_key",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(
            array_join(array_sort(collect_set(col("o_orderstatus"))), "+")
              .as("status_combo"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey,
              ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(o_orderstatus))), '+') AS status_combo,
              COUNT(*) AS n_orders
              FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),

    // A12: single-group global rollup (no GROUP BY).
    // Ref: silver_normalized/global_overview.sql:34-60
    QueryDef(
      "a12_global_rollup",
      (s, d) =>
        t(s, d, "events").agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("n_types"),
          min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"),
          dsum(col("value"), 6).as("total_value")),
      Some(s"""SELECT COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(DISTINCT event_type) AS n_types,
               MIN(ts) AS first_ts, MAX(ts) AS last_ts,
               ${dsumSql("value", 6)} AS total_value
               FROM events""")),

    // A13: HAVING post-aggregation filter.
    // Ref: queries/exploration/bottleneck_analysis.sql:38
    QueryDef(
      "a13_having",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("total_qty"))
          .filter(col("n") >= 20)
          .orderBy(col("l_partkey")),
      Some(s"""SELECT l_partkey, COUNT(*) AS n, ${dsumSql("l_quantity")} AS total_qty
               FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 20
               ORDER BY l_partkey""")),

    // A14: the fact_rounds-style mega-rollup: one wide groupBy with ~15
    // aggregates of every flavor (min/max ts, conditional counts, distinct
    // counts, exact-decimal averages, threshold buckets).
    // Ref: gold/models/gold/fact_rounds.sql:41-87
    QueryDef(
      "a14_mega_rollup",
      (s, d) => {
        // Two distinct-aggregates in the same groupBy make Catalyst
        // Expand the fact 3× and drag every other aggregate buffer
        // through the multiplied rows. Splitting them into a second
        // aggregation co-partitioned on the same key joins back without
        // an extra exchange (both sides hash on l_orderkey) — the
        // standard distinct-decomposition for wide rollups at scale.
        // (A narrow-scan spread was tried in r11 and reverted: A/B 1.56×
        // — the rollup is too cheap per row to buy back the exchange.)
        val li = t(s, d, "lineitem")
        val base = li.groupBy(col("l_orderkey"))
          .agg(
            count(lit(1)).as("n_lines"),
            min(col("l_shipdate")).as("first_ship"),
            max(col("l_shipdate")).as("last_ship"),
            dsum(col("l_quantity")).as("total_qty"),
            dsum(col("l_extendedprice")).as("total_price"),
            davg(col("l_discount"), 6).as("avg_discount"),
            sum(when(col("l_returnflag") === "R", 1).otherwise(0)).as("n_returned"),
            sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("n_discounted"),
            sum(when(col("l_quantity") < 10, 1).otherwise(0)).as("n_small"),
            max(when(col("l_linestatus") === "O", lit(true)).otherwise(lit(false)))
              .as("any_open"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
              .as("revenue"))
        val dist = li.groupBy(col("l_orderkey"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_suppliers"))
        base.join(dist, "l_orderkey")
          .select(
            col("l_orderkey"), col("n_lines"), col("n_parts"), col("n_suppliers"),
            col("first_ship"), col("last_ship"), col("total_qty"), col("total_price"),
            col("avg_discount"), col("n_returned"), col("n_discounted"),
            col("n_small"), col("any_open"), col("revenue"))
          .orderBy(col("l_orderkey"))
      },
      Some(s"""SELECT l_orderkey,
               COUNT(*) AS n_lines,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_suppliers,
               MIN(l_shipdate) AS first_ship,
               MAX(l_shipdate) AS last_ship,
               ${dsumSql("l_quantity")} AS total_qty,
               ${dsumSql("l_extendedprice")} AS total_price,
               ${davgSql("l_discount", 6)} AS avg_discount,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
               CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
               CAST(SUM(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
               MAX(l_linestatus = 'O') AS any_open,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue
               FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // A15: null-count × tier scoring (weighted composite quality score).
    // Ref: gold/models/gold/data_quality_overview.sql:122-161
    QueryDef(
      "a15_quality_score",
      (s, d) =>
        t(s, d, "events")
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("value").isNull, 1).otherwise(0)).as("null_value"),
            sum(when(col("props").isNull, 1).otherwise(0)).as("null_props"),
            sum(when(col("user_id").isNull, 1).otherwise(0)).as("null_user"))
          .select(
            col("event_type"), col("n"),
            (lit(100.0) * (lit(1.0) -
              (col("null_value") * 0.5 + col("null_props") * 0.3 +
                col("null_user") * 0.2) / col("n"))).as("quality_score"))
          .orderBy(col("event_type")),
      // NOTE: 0.5e0-style literals — bare 0.5 is DECIMAL in DuckDB, which
      // would silently switch the arithmetic (and result type) off DOUBLE.
      Some("""SELECT event_type, n,
              100.0e0 * (1.0e0 - (null_value*0.5e0 + null_props*0.3e0 + null_user*0.2e0) / n) AS quality_score
              FROM (
                SELECT event_type, COUNT(*) AS n,
                CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
                CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
                CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user
                FROM events GROUP BY event_type
              ) ORDER BY event_type""")),

    // A16: GREATEST of percentages.
    // Ref: gold/models/gold/critical_column_gaps.sql:53-56
    QueryDef(
      "a16_greatest",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("l_discount") === 0.0, 1).otherwise(0)).as("n_nodisc"),
            sum(when(col("l_tax") === 0.0, 1).otherwise(0)).as("n_notax"))
          .select(
            col("l_returnflag"),
            greatest(
              col("n_nodisc") * 100.0 / col("n"),
              col("n_notax") * 100.0 / col("n")).as("worst_gap_pct"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
              GREATEST(n_nodisc * 100.0e0 / n, n_notax * 100.0e0 / n) AS worst_gap_pct
              FROM (
                SELECT l_returnflag, COUNT(*) AS n,
                CAST(SUM(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nodisc,
                CAST(SUM(CASE WHEN l_tax = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_notax
                FROM lineitem GROUP BY l_returnflag
              ) ORDER BY l_returnflag""")),

    // A17: count-distinct over a concatenated composite key.
    // Ref: gold/models/gold/gold_coverage_audit.sql:58-59
    QueryDef(
      "a17_distinct_concat_key",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(concat_ws(":",
              col("l_orderkey"), col("l_partkey"), col("l_suppkey")))
              .as("distinct_triples"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
              COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR)) AS distinct_triples
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // A18: native pivot with an explicit value list — wide per-category
    // columns from long rows. An EXPLICIT pivot list matters at scale:
    // unlisted .pivot() first runs a distinct scan of the column to
    // discover values (an extra corpus pass + a driver-side collect).
    // Oracle: the conditional-aggregation equivalent (DuckDB's PIVOT
    // would reorder columns; FILTER pins names and types exactly).
    QueryDef(
      "a18_pivot",
      (s, d) =>
        t(s, d, "events")
          .groupBy(col("user_id"))
          .pivot("event_type", Seq("click", "view", "purchase"))
          .agg(count(lit(1)))
          .na.fill(0L, Seq("click", "view", "purchase"))
          .orderBy(col("user_id")),
      Some("""SELECT user_id,
              COUNT(*) FILTER (WHERE event_type = 'click') AS click,
              COUNT(*) FILTER (WHERE event_type = 'view') AS view,
              COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // A19: unpivot (melt) — wide metric columns back to long (metric,
    // value) rows, the inverse reshape. Row-local fan-out (an Expand
    // node, no shuffle); ids with NULL metrics drop per unpivot
    // semantics. Oracle: the UNION ALL equivalent.
    QueryDef(
      "a19_unpivot",
      (s, d) =>
        t(s, d, "customer")
          .select(col("c_custkey"), col("c_acctbal").cast(DoubleType).as("acctbal"),
            col("c_nationkey").cast(DoubleType).as("nationkey"))
          .unpivot(
            Array(col("c_custkey")),
            Array(col("acctbal"), col("nationkey")),
            "metric", "value")
          .orderBy(col("c_custkey"), col("metric")),
      Some("""SELECT c_custkey, metric, value FROM (
                SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS value FROM customer
                UNION ALL
                SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
              ) WHERE value IS NOT NULL
              ORDER BY c_custkey, metric""")),

    // A21: ROLLUP grouping sets — subtotals at (region, segment),
    // (region), and () grains in ONE pass (an Expand node, no re-scan
    // per grain). GROUPING() flags disambiguate real NULLs from subtotal
    // rows, the standard trap.
    QueryDef(
      "a21_rollup_cube",
      (s, d) =>
        t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .rollup(col("n_regionkey"), col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n"),
            dsum(col("c_acctbal")).as("sum_bal"),
            grouping(col("n_regionkey")).as("g_region"),
            grouping(col("c_mktsegment")).as("g_segment"))
          .orderBy(asc_nulls_first("n_regionkey"), asc_nulls_first("c_mktsegment")),
      Some(s"""SELECT n_regionkey, c_mktsegment, COUNT(*) AS n,
               ${dsumSql("c_acctbal")} AS sum_bal,
               CAST(GROUPING(n_regionkey) AS TINYINT) AS g_region,
               CAST(GROUPING(c_mktsegment) AS TINYINT) AS g_segment
               FROM customer JOIN nation ON c_nationkey = n_nationkey
               GROUP BY ROLLUP(n_regionkey, c_mktsegment)
               ORDER BY n_regionkey ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""")),

    // A20: group-wise top-k as a REAL aggregate (functions.TopKStructs,
    // a TypedImperativeAggregate bounded heap). Same result as the W2
    // window formulation, radically different plan: partial aggregation
    // combines map-side, so only k rows per (group, partition) cross the
    // shuffle instead of every row of every group. The oracle is the
    // window formulation.
    QueryDef(
      "a20_topk_agg",
      (s, d) =>
        t(s, d, "customer")
          .groupBy(col("c_mktsegment"))
          .agg(graft.functions.F.topKStructs(
            struct(col("c_acctbal"), col("c_custkey")), 3).as("top"))
          .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("i", "r")))
          .select(col("c_mktsegment"), (col("i") + 1).as("rn"),
            col("r.c_acctbal").as("c_acctbal"), col("r.c_custkey").as("c_custkey"))
          .orderBy(col("c_mktsegment"), col("rn")),
      Some("""SELECT c_mktsegment, rn, c_acctbal, c_custkey FROM (
                SELECT c_mktsegment, c_acctbal, c_custkey,
                CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                  ORDER BY c_acctbal DESC, c_custkey DESC) AS INTEGER) AS rn
                FROM customer
              ) WHERE rn <= 3 ORDER BY c_mktsegment, rn""")),

    // A22: sketch-based approximate distinct (HyperLogLog++) with its
    // accuracy PINNED by the gate: the query emits whether the sketch
    // estimate lands within 5% of the exact count per group, and the
    // oracle states TRUE. At 100 TB approx_count_distinct is the only
    // sane form of wide distinct-count dashboards — the sketch merges
    // map-side (one pass, no Expand, fixed memory per group) where exact
    // distinct shuffles the key universe. rsd=0.01 ⇒ sketch ≈ 24 KB per
    // group; the 5% gate bound is 5σ.
    QueryDef(
      "a22_approx_distinct",
      (s, d) => {
        // exact and sketch in SEPARATE aggregations, joined on the tiny
        // group key: combined in one agg, the planner routes the HLL
        // through the distinct-rewrite Expand alongside countDistinct
        // and evaluates sketch buffers per (group, key) — measured ~16×
        // slower than the two-pass form at sf0.1
        val li = t(s, d, "lineitem")
        val exact = li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("n_exact"))
        val approx = li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.01)
            .as("n_approx"))
        exact.join(approx, "l_returnflag")
          .select(
            col("l_returnflag"), col("n_exact"),
            (abs(col("n_approx") - col("n_exact")) <=
              col("n_exact") * lit(0.05)).as("within_5pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS n_exact,
               TRUE AS within_5pct
               FROM lineitem GROUP BY l_returnflag
               ORDER BY l_returnflag""")),

    // A23: sketch-based approximate quantiles (Greenwald–Khanna) with
    // accuracy pinned like A22: the estimate must land within
    // max(2% · exact, 1.0) of the exact interpolated percentile — GK at
    // accuracy 10000 returns an actual data point, so the bound covers
    // the interpolation gap on integer-grained data. The sketch is the
    // scale path: mergeable, single pass, bounded memory, where exact
    // percentile sorts every group. Exact semantics are separately gated
    // by a8_median.
    QueryDef(
      "a23_approx_quantile",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_extendedprice, 0.5)").as("p50_exact"),
            expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50_approx"),
            count(lit(1)).as("n"))
          .select(
            col("l_returnflag"),
            col("p50_exact").cast(DecimalType(18, 4)).cast(DoubleType)
              .as("p50_exact"),
            (abs(col("p50_approx") - col("p50_exact")) <=
              greatest(col("p50_exact") * lit(0.02), lit(1.0)))
              .as("within_tolerance"),
            col("n"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
               CAST(CAST(QUANTILE_CONT(l_extendedprice, 0.5e0) AS DECIMAL(18,4)) AS DOUBLE) AS p50_exact,
               TRUE AS within_tolerance,
               COUNT(*) AS n
               FROM lineitem GROUP BY l_returnflag
               ORDER BY l_returnflag""")),

    // A24 — PERSISTABLE distinct-count sketches (Datasketches HLL):
    // per-day hll_sketch_agg of user_id, then hll_union_agg across days
    // — the incremental-stats pattern for 100 TB: each partition's
    // sketch is a few KB landed once in a stats table; "distinct users
    // over any date range" becomes a union of sketches instead of a
    // re-scan, and a new day MERGEs without touching history. The gate
    // pins the exact count (oracle-reproducible) plus a tolerance flag
    // for the union-of-sketches estimate (HLL lgConfigK=12 → ~2.3%
    // three-sigma error; 5% bound leaves margin without masking a
    // broken union, which would be off by whole days).
    QueryDef(
      "a24_sketch_union",
      (s, d) => {
        val ev = t(s, d, "events").withColumn("day", to_date(col("ts")))
        val daily = ev.groupBy(col("day"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val est = daily
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        val exact = ev.agg(countDistinct(col("user_id")).as("exact_users"),
          countDistinct(col("day")).as("n_days"))
        exact.crossJoin(broadcast(est))
          .select(col("exact_users"), col("n_days"),
            (abs(col("est") - col("exact_users")).cast(DoubleType) <=
              col("exact_users").cast(DoubleType) * lit(0.05))
              .as("union_within_5pct"))
      },
      Some("""SELECT COUNT(DISTINCT user_id) AS exact_users,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
               TRUE AS union_within_5pct
               FROM events"""))
,
    // A25 — EXACT global quantiles at bounded memory: the two-pass
    // sketch-bracket design (graft.analytics.Quantiles). Spark's exact
    // `percentile` sorts the world into one aggregate buffer; the
    // approximate sketch has rank error. This gate returns exact
    // ELEMENTS (k = ⌈p·n⌉-th smallest) whose second pass touches only
    // the ~0.1% bracketed slice — and the result is deterministic even
    // though the bracketing sketch is merge-order dependent, because
    // the sketch only narrows the search. Oracle ranks the whole
    // column in DuckDB and picks the same elements.
    QueryDef(
      "a25_quantile_2pass",
      (s, d) =>
        graft.analytics.Quantiles.exactQuantiles2Pass(
          t(s, d, "lineitem").select(col("l_extendedprice")),
          "l_extendedprice", Seq(0.25, 0.5, 0.75, 0.9, 0.99))
          .orderBy(col("p")),
      Some("""WITH o AS (
                SELECT l_extendedprice AS v,
                  ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn
                FROM lineitem
              ),
              nn AS (SELECT COUNT(*) AS n FROM lineitem),
              ps(p) AS (VALUES (0.25e0), (0.5e0), (0.75e0), (0.9e0), (0.99e0)),
              kk AS (
                SELECT p, n,
                  GREATEST(1, CAST(CEIL(p * n) AS BIGINT)) AS k
                FROM ps, nn
              )
              SELECT kk.p, kk.n AS n_rows, kk.k, o.v AS value,
                TRUE AS bracketed
              FROM kk JOIN o ON o.rn = kk.k
              ORDER BY kk.p"""))
  )
}
