package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import QueryDef._

/** Join operators J1–J9 from SURVEY.md §2.3 (J10 MERGE lives with the
  * maintenance ops).
  *
  * Scale notes baked into each shape:
  *  - dimension sides are `broadcast(...)`-hinted (J1, J2) — no shuffle of
  *    the fact side for dim enrichment at 100 TB;
  *  - the equi+range join (J1) keeps an equality key so Spark can hash on
  *    it and apply the range as a post-filter instead of a cartesian;
  *  - rollup-then-join (J3, J4, J7, J8, J9) aggregates the fact table
  *    FIRST so the join moves group-level rows, not fix-level rows.
  */
object JoinQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // J1: broadcast equi+range join — the reference's telemetry × topology
    // join (etl.py:516-528): LEFT on type equality AND value BETWEEN band
    // bounds. The band dim is derived tiny (distinct types × 3 literal
    // bands) and broadcast, exactly like F.broadcast(topology_df).
    QueryDef(
      "j1_broadcast_range_join",
      (s, d) => {
        import s.implicits._
        val events = t(s, d, "events")
        val bands = Seq(
          ("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1e6))
          .toDF("band", "lo", "hi")
        val dim = events.select(col("event_type").as("et")).distinct().crossJoin(bands)
        events
          .join(
            broadcast(dim),
            events("event_type") === dim("et") &&
              events("value") >= dim("lo") && events("value") < dim("hi"),
            "left")
          .groupBy(col("event_type"), col("band"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
          .orderBy(col("event_type"), col("band"))
      },
      Some(s"""SELECT e.event_type, dim.band, COUNT(*) AS n,
               ${dsumSql("e.value", 6)} AS sum_value
               FROM events e LEFT JOIN (
                 SELECT t.event_type AS et, b.band, b.lo, b.hi
                 FROM (SELECT DISTINCT event_type FROM events) t
                 CROSS JOIN (VALUES ('low', 0.0e0, 50.0e0), ('mid', 50.0e0, 200.0e0),
                             ('high', 200.0e0, 1000000.0e0)) b(band, lo, hi)
               ) dim ON e.event_type = dim.et AND e.value >= dim.lo AND e.value < dim.hi
               GROUP BY e.event_type, dim.band ORDER BY e.event_type, dim.band""")),

    // J2: equi LEFT join enriching fact rows with a dim attribute
    // (fact_round_hole_performance.sql:52-56), dim broadcast.
    QueryDef(
      "j2_dim_enrich_left_join",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val sup = t(s, d, "supplier").select(
          col("s_suppkey"), col("s_name"), col("s_nationkey"))
        li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"), "left")
          .groupBy(col("s_name"), col("s_nationkey"))
          .agg(
            count(lit(1)).as("n_lines"),
            dsum(col("l_extendedprice")).as("total_price"))
          .orderBy(col("s_name"))
      },
      Some(s"""SELECT s.s_name, s.s_nationkey, COUNT(*) AS n_lines,
               ${dsumSql("l.l_extendedprice")} AS total_price
               FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
               GROUP BY s.s_name, s.s_nationkey ORDER BY s.s_name""")),

    // J3: 5-way LEFT join stitch building a wide dim (dim_course.sql:89-99):
    // customer × order-rollup × nation × region × event-rollup. Fact tables
    // are pre-aggregated to the join grain before joining.
    QueryDef(
      "j3_five_way_stitch",
      (s, d) => {
        val cust = t(s, d, "customer")
        val nation = t(s, d, "nation")
        val region = t(s, d, "region")
        val orderStats = t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(
            count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("total_spent"))
        val eventStats = t(s, d, "events")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"))
        cust
          .join(orderStats, cust("c_custkey") === orderStats("o_custkey"), "left")
          .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"), "left")
          .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"), "left")
          .join(eventStats, cust("c_custkey") === eventStats("user_id"), "left")
          .select(
            col("c_custkey"), col("c_name"), col("n_name"), col("r_name"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("total_spent"), lit(0.0)).as("total_spent"),
            coalesce(col("n_events"), lit(0L)).as("n_events"))
          .orderBy(col("c_custkey"))
      },
      Some(s"""SELECT c.c_custkey, c.c_name, n.n_name, r.r_name,
               COALESCE(os.n_orders, 0) AS n_orders,
               COALESCE(os.total_spent, CAST(0.0 AS DOUBLE)) AS total_spent,
               COALESCE(es.n_events, 0) AS n_events
               FROM customer c
               LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders,
                          ${dsumSql("o_totalprice")} AS total_spent
                          FROM orders GROUP BY o_custkey) os ON c.c_custkey = os.o_custkey
               LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
               LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
               LEFT JOIN (SELECT user_id, COUNT(*) AS n_events
                          FROM events GROUP BY user_id) es ON c.c_custkey = es.user_id
               ORDER BY c.c_custkey""")),

    // J4: multi-way reconciliation audit (gold_coverage_audit.sql:121-127):
    // per-nation counts from independent rollups of several tables, all
    // LEFT-joined onto the dim spine, missing → 0.
    QueryDef(
      "j4_coverage_audit",
      (s, d) => {
        val nation = t(s, d, "nation")
        val custCnt = t(s, d, "customer")
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_customers"))
        val suppCnt = t(s, d, "supplier")
          .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_suppliers"))
        val orderCnt = t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").as("o_nationkey"))
          .agg(count(lit(1)).as("n_orders"))
        val balSum = t(s, d, "customer")
          .groupBy(col("c_nationkey").as("b_nationkey"))
          .agg(dsum(col("c_acctbal")).as("total_balance"))
        nation
          .join(custCnt, nation("n_nationkey") === custCnt("c_nationkey"), "left")
          .join(suppCnt, nation("n_nationkey") === suppCnt("s_nationkey"), "left")
          .join(orderCnt, nation("n_nationkey") === orderCnt("o_nationkey"), "left")
          .join(balSum, nation("n_nationkey") === balSum("b_nationkey"), "left")
          .select(
            col("n_nationkey"), col("n_name"),
            coalesce(col("n_customers"), lit(0L)).as("n_customers"),
            coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("total_balance"), lit(0.0)).as("total_balance"))
          .orderBy(col("n_nationkey"))
      },
      Some(s"""SELECT n.n_nationkey, n.n_name,
               COALESCE(cc.n_customers, 0) AS n_customers,
               COALESCE(sc.n_suppliers, 0) AS n_suppliers,
               COALESCE(oc.n_orders, 0) AS n_orders,
               COALESCE(bs.total_balance, CAST(0.0 AS DOUBLE)) AS total_balance
               FROM nation n
               LEFT JOIN (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey) cc
                 ON n.n_nationkey = cc.c_nationkey
               LEFT JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) sc
                 ON n.n_nationkey = sc.s_nationkey
               LEFT JOIN (SELECT c.c_nationkey AS o_nationkey, COUNT(*) AS n_orders
                          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                          GROUP BY c.c_nationkey) oc ON n.n_nationkey = oc.o_nationkey
               LEFT JOIN (SELECT c_nationkey AS b_nationkey, ${dsumSql("c_acctbal")} AS total_balance
                          FROM customer GROUP BY c_nationkey) bs ON n.n_nationkey = bs.b_nationkey
               ORDER BY n.n_nationkey""")),

    // J5: pct-of-total via INNER join to per-group totals
    // (course_rounds_by_month.sql:61-63): monthly order counts vs the
    // priority's all-time total.
    QueryDef(
      "j5_pct_of_total_join",
      (s, d) => {
        val monthly = t(s, d, "orders")
          .groupBy(
            col("o_orderpriority"),
            date_trunc("month", col("o_orderdate")).as("order_month"))
          .agg(count(lit(1)).as("n"))
        val totals = t(s, d, "orders")
          .groupBy(col("o_orderpriority").as("tp"))
          .agg(count(lit(1)).as("total"))
        monthly
          .join(totals, monthly("o_orderpriority") === totals("tp"))
          .select(
            col("o_orderpriority"), col("order_month"), col("n"),
            (col("n") * 100.0 / col("total")).as("pct_of_priority"))
          .orderBy(col("o_orderpriority"), col("order_month"))
      },
      Some("""SELECT m.o_orderpriority, m.order_month, m.n,
              m.n * 100.0e0 / t.total AS pct_of_priority
              FROM (SELECT o_orderpriority, CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
                    COUNT(*) AS n FROM orders GROUP BY 1, 2) m
              JOIN (SELECT o_orderpriority AS tp, COUNT(*) AS total
                    FROM orders GROUP BY 1) t ON m.o_orderpriority = t.tp
              ORDER BY m.o_orderpriority, m.order_month""")),

    // J6: eligible-set semi-join (demo_all_insights.sql:180-227): orders
    // whose lineitems span BOTH linestatuses (HAVING COUNT(DISTINCT)=2),
    // semi-joined back to the fact rows, then rolled up. left_semi moves no
    // payload columns from the eligibility side — the Spark-native EXISTS.
    QueryDef(
      "j6_eligible_semi_join",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val eligible = li
          .groupBy(col("l_orderkey"))
          .agg(countDistinct(col("l_linestatus")).as("n_status"))
          .filter(col("n_status") === 2)
          .select(col("l_orderkey").as("ok"))
        li.join(eligible, li("l_orderkey") === eligible("ok"), "left_semi")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n_lines"),
            countDistinct(col("l_orderkey")).as("n_orders"),
            dsum(col("l_extendedprice")).as("total_price"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n_lines,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               ${dsumSql("l_extendedprice")} AS total_price
               FROM lineitem WHERE l_orderkey IN (
                 SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
                 HAVING COUNT(DISTINCT l_linestatus) = 2)
               GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // J7: course-average comparison self-join (queries.py:1319-1359):
    // per-(supplier, part) average quantity vs the supplier's overall
    // average → above/below/normal classification, counted per class.
    QueryDef(
      "j7_avg_comparison_self_join",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val perPart = li
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(davg(col("l_quantity")).as("part_avg"))
        val perSupp = li
          .groupBy(col("l_suppkey").as("sk"))
          .agg(davg(col("l_quantity")).as("supp_avg"))
        perPart
          .join(perSupp, perPart("l_suppkey") === perSupp("sk"))
          .withColumn(
            "class",
            when(col("part_avg") > col("supp_avg") * 1.2, "above")
              .when(col("part_avg") < col("supp_avg") * 0.8, "below")
              .otherwise("normal"))
          .groupBy(col("l_suppkey"), col("class"))
          .agg(count(lit(1)).as("n_parts"))
          .orderBy(col("l_suppkey"), col("class"))
      },
      Some(s"""SELECT l_suppkey, class, COUNT(*) AS n_parts FROM (
                 SELECT p.l_suppkey,
                 CASE WHEN p.part_avg > s.supp_avg * 1.2e0 THEN 'above'
                      WHEN p.part_avg < s.supp_avg * 0.8e0 THEN 'below'
                      ELSE 'normal' END AS class
                 FROM (SELECT l_suppkey, l_partkey, ${davgSql("l_quantity")} AS part_avg
                       FROM lineitem GROUP BY l_suppkey, l_partkey) p
                 JOIN (SELECT l_suppkey AS sk, ${davgSql("l_quantity")} AS supp_avg
                       FROM lineitem GROUP BY l_suppkey) s ON p.l_suppkey = s.sk
               ) GROUP BY l_suppkey, class ORDER BY l_suppkey, class""")),

    // J8: boundary-support double LEFT join (demo_all_insights.sql:279-303):
    // the dim spine joined twice against two filtered frequency rollups
    // (first-line support, last-line support).
    QueryDef(
      "j8_double_left_boundary",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val sup = t(s, d, "supplier")
        val firstCnt = li.filter(col("l_linenumber") === 1)
          .groupBy(col("l_suppkey").as("k1")).agg(count(lit(1)).as("c_first"))
        val lastCnt = li.filter(col("l_linenumber") >= 6)
          .groupBy(col("l_suppkey").as("k2")).agg(count(lit(1)).as("c_last"))
        sup
          .join(firstCnt, sup("s_suppkey") === firstCnt("k1"), "left")
          .join(lastCnt, sup("s_suppkey") === lastCnt("k2"), "left")
          .select(
            col("s_suppkey"), col("s_name"),
            coalesce(col("c_first"), lit(0L)).as("c_first"),
            coalesce(col("c_last"), lit(0L)).as("c_last"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s.s_suppkey, s.s_name,
              COALESCE(f.c_first, 0) AS c_first,
              COALESCE(l.c_last, 0) AS c_last
              FROM supplier s
              LEFT JOIN (SELECT l_suppkey AS k1, COUNT(*) AS c_first FROM lineitem
                         WHERE l_linenumber = 1 GROUP BY l_suppkey) f ON s.s_suppkey = f.k1
              LEFT JOIN (SELECT l_suppkey AS k2, COUNT(*) AS c_last FROM lineitem
                         WHERE l_linenumber >= 6 GROUP BY l_suppkey) l ON s.s_suppkey = l.k2
              ORDER BY s.s_suppkey""")),

    // J9: max-per-group joined back to its row (demo_all_insights.sql:
    // 308-338): the last line of every order with its price.
    QueryDef(
      "j9_max_per_group_join_back",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val maxLine = li
          .groupBy(col("l_orderkey").as("ok"))
          .agg(max(col("l_linenumber")).as("max_line"))
        li.join(
            maxLine,
            li("l_orderkey") === maxLine("ok") &&
              li("l_linenumber") === maxLine("max_line"))
          .select(
            col("l_orderkey"), col("max_line"),
            col("l_extendedprice").as("last_line_price"))
          .orderBy(col("l_orderkey"))
      },
      Some("""SELECT l.l_orderkey, m.max_line, l.l_extendedprice AS last_line_price
              FROM lineitem l
              JOIN (SELECT l_orderkey AS ok, MAX(l_linenumber) AS max_line
                    FROM lineitem GROUP BY l_orderkey) m
              ON l.l_orderkey = m.ok AND l.l_linenumber = m.max_line
              ORDER BY l.l_orderkey"""))
,

    // J10b — salted skew join (SURVEY §4 scale toolkit): lineitem folded
    // onto 10 pathologically hot keys, joined through SkewJoin.saltedJoin
    // so each hot key scatters over 8 salts. The oracle is the PLAIN
    // join — salting must be row-invisible.
    QueryDef(
      "j10_salted_skew_join",
      (s, d) => {
        val facts = t(s, d, "lineitem")
          .select((col("l_orderkey") % 10).as("k"), col("l_quantity"))
        val dim = t(s, d, "nation").filter(col("n_nationkey") < 10)
          .select(col("n_nationkey").as("k"), col("n_name"))
        graft.core.SkewJoin.saltedJoin(facts, dim, Seq("k"), saltFactor = 8, "left")
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("n_name"))
      },
      Some(s"""SELECT d.n_name, COUNT(*) AS n, ${dsumSql("f.l_quantity")} AS sum_qty
               FROM (SELECT l_orderkey % 10 AS k, l_quantity FROM lineitem) f
               LEFT JOIN (SELECT n_nationkey AS k, n_name FROM nation
                          WHERE n_nationkey < 10) d ON f.k = d.k
               GROUP BY d.n_name ORDER BY d.n_name""")),

    // J11 — as-of (point-in-time) join: each click enriched with the
    // most recent view AT OR BEFORE it per user. Implemented union+
    // carry-forward (core.AsOfJoin — one shuffle on user_id, no range
    // blow-up); the oracle is DuckDB's NATIVE ASOF LEFT JOIN, so the
    // gate pins our operator against a reference asof implementation.
    QueryDef(
      "j11_asof_join",
      (s, d) => {
        val ev = t(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"),
            col("event_id").as("view_event_id"), col("value").as("view_value"))
        graft.core.AsOfJoin.asof(clicks, views, Seq("user_id"), "ts",
            Seq("view_event_id", "view_value"),
            rightTieCol = Some("view_event_id"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT c.user_id, c.event_id, c.ts,
              v.event_id AS view_event_id, v.value AS view_value
              FROM (SELECT user_id, event_id, ts FROM events
                    WHERE event_type = 'click') c
              ASOF LEFT JOIN (SELECT user_id, event_id, ts, value FROM events
                              WHERE event_type = 'view') v
              ON c.user_id = v.user_id AND c.ts >= v.ts
              ORDER BY c.user_id, c.event_id""")),

    // J12 — range join as an EQUI-join (core.RangeJoin bin-and-join):
    // lineitem prices against OVERLAPPING price bands (width 2500,
    // stride 1000 — each price matches up to 3 bands, so a bin-map
    // cheat can't produce this answer). The alternative plan for
    // point-BETWEEN against a non-broadcast interval table is
    // BroadcastNestedLoop/cartesian; the bin technique shuffles on the
    // bin key like any hash join (PlanSpec pins no-BNLJ on a
    // broadcast-suppressed replica).
    QueryDef(
      "j12_range_bin_join",
      (s, d) => {
        val bands = s.range(0, 30).select(
          col("id").as("band_id"),
          (col("id") * 1000.0).as("lo"),
          (col("id") * 1000.0 + 2500.0).as("hi"))
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        graft.core.RangeJoin.pointInInterval(
            li, "l_extendedprice", bands, "lo", "hi", binWidth = 1000.0)
          .groupBy(col("band_id"))
          .agg(count(lit(1)).as("n"),
            dsum(col("l_extendedprice")).as("price_total"))
          .orderBy(col("band_id"))
      },
      Some(s"""SELECT b.band_id, COUNT(*) AS n,
               ${dsumSql("l_extendedprice")} AS price_total
               FROM (SELECT r AS band_id, r * 1000.0e0 AS lo,
                            r * 1000.0e0 + 2500.0e0 AS hi
                     FROM range(30) t(r)) b
               JOIN lineitem
                 ON l_extendedprice >= b.lo AND l_extendedprice < b.hi
               GROUP BY b.band_id ORDER BY b.band_id""")),

    // J13 — interval×interval OVERLAP join (RangeJoin.intervalOverlap):
    // 7-day order windows against 10-day promo windows at 5-day stride,
    // derived from the data's own min date so both engines build the
    // same windows. Canonical-bin dedup means each overlapping pair
    // counts exactly once with NO distinct shuffle; the oracle is the
    // plain quadratic overlap predicate.
    QueryDef(
      "j13_interval_overlap_join",
      (s, d) => {
        val o = t(s, d, "orders")
          .select(col("o_orderkey"),
            unix_date(col("o_orderdate").cast(DateType)).cast(LongType)
              .as("a_lo"))
          .withColumn("a_hi", col("a_lo") + 7L)
        val d0 = o.agg(min(col("a_lo"))).collect()(0).getLong(0)
        val wins = s.range(0, 40).select(
          col("id").as("win_id"),
          (lit(d0) + col("id") * 5L).as("b_lo"),
          (lit(d0) + col("id") * 5L + 10L).as("b_hi"))
        graft.core.RangeJoin.intervalOverlap(
            o, "a_lo", "a_hi", wins, "b_lo", "b_hi", binWidth = 10.0)
          .groupBy(col("win_id"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_orderkey")).as("key_sum"))
          .orderBy(col("win_id"))
      },
      Some("""WITH o AS (
                SELECT o_orderkey,
                       CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS a_lo
                FROM orders
              ),
              m AS (SELECT MIN(a_lo) AS d0 FROM o),
              w AS (SELECT r AS win_id, m.d0 + r * 5 AS b_lo,
                           m.d0 + r * 5 + 10 AS b_hi
                    FROM range(40) t(r), m),
              a AS (SELECT o_orderkey, a_lo, a_lo + 7 AS a_hi FROM o)
              SELECT w.win_id, COUNT(*) AS n_orders,
                     CAST(SUM(a.o_orderkey) AS BIGINT) AS key_sum
              FROM a JOIN w ON a.a_lo < w.b_hi AND w.b_lo < a.a_hi
              GROUP BY w.win_id ORDER BY w.win_id""")),

    // J14 — DYNAMIC PARTITION PRUNING: the fact table is partitioned on
    // the join key, the dim side carries a selective filter, and the
    // optimizer injects a runtime pruning subquery into the fact SCAN
    // (PartitionFilters: dynamicpruning#N) — at 100 TB this is the
    // difference between scanning two priorities' directories and
    // scanning the whole fact table, decided at RUNTIME from the dim's
    // broadcast result, which no static filter can express. The gate
    // emits whether the executed plan actually planned the pruning
    // subquery; the oracle pins TRUE.
    QueryDef(
      "j14_dynamic_partition_pruning",
      (s, d) => {
        import s.implicits._
        val base = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_join_q", "j14").toString
        graft.tables.FsUtil.deleteRec(java.nio.file.Paths.get(base))
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
          .write.partitionBy("o_orderpriority").parquet(s"$base/fact")
        Seq(("1-URGENT", "hot"), ("2-HIGH", "hot"), ("3-MEDIUM", "cold"),
            ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold"))
          .toDF("prio", "tier").write.parquet(s"$base/dim")
        val fact = s.read.parquet(s"$base/fact")
        val dim = s.read.parquet(s"$base/dim").filter(col("tier") === "hot")
        val joined = fact
          .join(broadcast(dim), col("o_orderpriority") === col("prio"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        val dppPlanned = joined.queryExecution.executedPlan.toString
          .contains("dynamicpruning")
        joined
          .withColumn("dpp_planned", lit(dppPlanned))
          .orderBy(col("o_orderpriority"))
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
               ${dsumSql("o_totalprice")} AS total,
               TRUE AS dpp_planned
               FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
               GROUP BY o_orderpriority ORDER BY o_orderpriority"""))
  )
}
