package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import QueryDef._

/** Scalar-function surface from SURVEY.md §2.9 — the Trino constructs the
  * reference's SQL corpus uses, mapped to Spark SQL and pinned against
  * DuckDB. Each query bundles a family (datetime, string/case, guards,
  * arrays, JSON) the way the gold models combine them.
  */
object FunctionQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // DATE_TRUNC + FORMAT_DATETIME('MMMM'/'EEEE') + EXTRACT — the
    // seasonality-model family (course_rounds_by_month.sql:21-29,
    // course_rounds_by_weekday.sql:19-23).
    QueryDef(
      "f_datetime_formats",
      (s, d) =>
        t(s, d, "events")
          .groupBy(
            date_trunc("month", col("ts")).as("month_start"),
            date_format(col("ts"), "MMMM").as("month_name"),
            date_format(col("ts"), "EEEE").as("weekday_name"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("month_start"), col("weekday_name")),
      Some("""SELECT CAST(DATE_TRUNC('month', ts) AS TIMESTAMP) AS month_start,
              MONTHNAME(ts) AS month_name, DAYNAME(ts) AS weekday_name,
              COUNT(*) AS n
              FROM events GROUP BY 1, 2, 3 ORDER BY month_start, weekday_name""")),

    // DATE_DIFF in seconds/minutes/days — Trino argument order
    // (fact_rounds.sql:49, queries.py:32,973). Seconds via unix_timestamp
    // deltas, days via datediff on dates.
    QueryDef(
      "f_date_diff_units",
      (s, d) => {
        val spans = t(s, d, "orders")
          .join(
            t(s, d, "lineitem").groupBy(col("l_orderkey"))
              .agg(max(col("l_shipdate")).as("last_ship")),
            col("o_orderkey") === col("l_orderkey"))
        spans.select(
            col("o_orderkey"),
            (unix_timestamp(col("last_ship")) - unix_timestamp(col("o_orderdate")))
              .as("diff_seconds"),
            floor((unix_timestamp(col("last_ship")) - unix_timestamp(col("o_orderdate"))) / 60)
              .as("diff_minutes"),
            datediff(to_date(col("last_ship")), to_date(col("o_orderdate")))
              .as("diff_days"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o.o_orderkey,
              CAST(FLOOR(EPOCH(m.last_ship)) AS BIGINT) - CAST(FLOOR(EPOCH(o.o_orderdate)) AS BIGINT) AS diff_seconds,
              CAST(FLOOR((CAST(FLOOR(EPOCH(m.last_ship)) AS BIGINT) - CAST(FLOOR(EPOCH(o.o_orderdate)) AS BIGINT)) / 60.0e0) AS BIGINT) AS diff_minutes,
              CAST(DATE_DIFF('day', CAST(o.o_orderdate AS DATE), CAST(m.last_ship AS DATE)) AS INTEGER) AS diff_days
              FROM orders o JOIN (SELECT l_orderkey, MAX(l_shipdate) AS last_ship
                                  FROM lineitem GROUP BY l_orderkey) m
              ON o.o_orderkey = m.l_orderkey ORDER BY o.o_orderkey""")),

    // CASE ladders producing status strings + hour bucketing — the
    // critical_column_gaps / global_time_patterns family
    // (critical_column_gaps.sql:91-170, global_time_patterns.sql:30-45).
    QueryDef(
      "f_case_bucket_ladder",
      (s, d) =>
        t(s, d, "events")
          .withColumn(
            "time_bucket",
            when(hour(col("ts")).between(5, 11), "morning")
              .when(hour(col("ts")).between(12, 16), "afternoon")
              .when(hour(col("ts")).between(17, 20), "evening")
              .otherwise("night"))
          .withColumn(
            "day_type",
            when(dayofweek(col("ts")).isin(1, 7), "weekend").otherwise("weekday"))
          .groupBy(col("day_type"), col("time_bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("day_type"), col("time_bucket")),
      Some("""SELECT CASE WHEN DAYOFWEEK(ts) IN (0, 6) THEN 'weekend' ELSE 'weekday' END AS day_type,
              CASE WHEN HOUR(ts) BETWEEN 5 AND 11 THEN 'morning'
                   WHEN HOUR(ts) BETWEEN 12 AND 16 THEN 'afternoon'
                   WHEN HOUR(ts) BETWEEN 17 AND 20 THEN 'evening'
                   ELSE 'night' END AS time_bucket,
              COUNT(*) AS n
              FROM events GROUP BY 1, 2 ORDER BY day_type, time_bucket""")),

    // NULLIF divide guard + ROUND + COALESCE — the rate-derivation family
    // (fact_rounds.sql:93-110; ~60 NULLIF uses in the corpus). The ratio
    // keeps exact inputs (integer counts), so ROUND behaves identically.
    QueryDef(
      "f_nullif_guard_rates",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("l_returnflag") === "R", 1).otherwise(0)).as("n_returned"))
          .select(
            col("l_partkey"),
            round(col("n_returned") * 100.0 / nullif(col("n"), lit(0)), 2)
              .as("return_rate_pct"),
            coalesce(col("n_returned") / nullif(lit(0), lit(0)), lit(-1.0))
              .as("guarded_div"))
          .orderBy(col("l_partkey")),
      Some("""SELECT l_partkey,
              ROUND(n_returned * 100.0e0 / NULLIF(n, 0), 2) AS return_rate_pct,
              COALESCE(n_returned / NULLIF(0, 0), -1.0e0) AS guarded_div FROM (
                SELECT l_partkey, COUNT(*) AS n,
                CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
                FROM lineitem GROUP BY l_partkey
              ) ORDER BY l_partkey""")),

    // String ops: concat/||, substring, upper/lower, length, trim —
    // (gold_coverage_audit.sql:58, etl.py:560, queries.py status strings).
    QueryDef(
      "f_string_ops",
      (s, d) =>
        t(s, d, "part")
          .select(
            col("p_partkey"),
            concat_ws("|", upper(col("p_brand")), lower(col("p_type"))).as("brand_type"),
            substring(col("p_name"), 1, 5).as("prefix5"),
            length(col("p_name")).as("name_len"),
            concat(lit("part:"), col("p_partkey").cast(StringType)).as("part_tag"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
              UPPER(p_brand) || '|' || LOWER(p_type) AS brand_type,
              SUBSTR(p_name, 1, 5) AS prefix5,
              CAST(LENGTH(p_name) AS INTEGER) AS name_len,
              'part:' || CAST(p_partkey AS VARCHAR) AS part_tag
              FROM part ORDER BY p_partkey""")),

    // JSON extraction from a string column — the events.props shape
    // (dashboard query corpus reads JSON-ish props).
    QueryDef(
      "f_json_extract",
      (s, d) =>
        t(s, d, "events")
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast(IntegerType).as("prop_k"))
          .groupBy((col("prop_k") % 10).as("k_mod"))
          .agg(count(lit(1)).as("n"), sum(col("prop_k")).as("sum_k"))
          .orderBy(col("k_mod")),
      Some("""SELECT CAST(prop_k % 10 AS INTEGER) AS k_mod, COUNT(*) AS n,
              CAST(SUM(prop_k) AS BIGINT) AS sum_k FROM (
                SELECT CAST(props->>'k' AS INTEGER) AS prop_k FROM events
              ) GROUP BY 1 ORDER BY k_mod""")),

    // Array construction + size/cardinality + array_contains —
    // (dim_course.sql:86 CARDINALITY, §2.9 array family).
    QueryDef(
      "f_array_ops",
      (s, d) =>
        t(s, d, "documents")
          .select(
            col("doc_id"),
            split(col("text"), " ").as("tokens"))
          .select(
            col("doc_id"),
            size(col("tokens")).as("n_tokens"),
            array_contains(col("tokens"), "spark").as("mentions_spark"),
            element_at(col("tokens"), 1).as("first_token"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
              CAST(LEN(STRING_SPLIT(text, ' ')) AS INTEGER) AS n_tokens,
              LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark') AS mentions_spark,
              STRING_SPLIT(text, ' ')[1] AS first_token
              FROM documents ORDER BY doc_id""")),

    // GREATEST/LEAST + CAST family over numerics (critical_column_gaps
    // .sql:53-56, fact_rounds.sql:93-110).
    QueryDef(
      "f_greatest_least_cast",
      (s, d) =>
        t(s, d, "supplier")
          .select(
            col("s_suppkey"),
            greatest(col("s_acctbal"), lit(0.0)).as("bal_floor0"),
            least(col("s_acctbal"), lit(5000.0)).as("bal_cap5k"),
            col("s_acctbal").cast(StringType).as("bal_str"))
          .orderBy(col("s_suppkey")),
      Some("""SELECT s_suppkey,
              GREATEST(s_acctbal, CAST(0.0 AS DOUBLE)) AS bal_floor0,
              LEAST(s_acctbal, CAST(5000.0 AS DOUBLE)) AS bal_cap5k,
              CAST(s_acctbal AS VARCHAR) AS bal_str
              FROM supplier ORDER BY s_suppkey""")),

    // Unicode normalization kernels (Spark has no built-in): NFC
    // composition makes decomposed text fingerprint-identical to its
    // precomposed twin; strip_accents folds diacritics for matching.
    // Planted composed/decomposed suffixes per doc; the oracle runs
    // DuckDB's OWN nfc_normalize/strip_accents — two independent
    // implementations of the Unicode standard must agree byte-for-byte.
    QueryDef(
      "f_unicode_normalize",
      (s, d) => {
        val comp = lit(" caf\u00e9 na\u00efve")  // precomposed
                val decomp = lit(" cafe\u0301 nai\u0308ve")  // combining marks
                val F = graft.functions.F
        t(s, d, "documents").select(
            col("doc_id"),
            (F.nfcNormalize(concat(col("text"), decomp)) ===
              F.nfcNormalize(concat(col("text"), comp))).as("nfc_equal"),
            md5(F.nfcNormalize(concat(col("text"), decomp))).as("nfc_md5"),
            md5(F.stripAccents(concat(col("text"), decomp))).as("stripped_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
              nfc_normalize(text || ' cafe' || chr(769) || ' nai' || chr(776) || 've') =
                nfc_normalize(text || ' café naïve') AS nfc_equal,
              md5(nfc_normalize(text || ' cafe' || chr(769) || ' nai' || chr(776) || 've')) AS nfc_md5,
              md5(strip_accents(text || ' cafe' || chr(769) || ' nai' || chr(776) || 've')) AS stripped_md5
              FROM documents ORDER BY doc_id""")),

    // The pure-SQL route end-to-end: catalog-registered tables +
    // SQL-registered custom kernels (GraftFunctions), exercised through
    // spark.sql TEXT — a spark.sql user gets the same codegen kernels as
    // the Column API. Consecutive-vector cosine/L2, oracle recomputes
    // both with the index-order fold.
    QueryDef(
      "f_sql_registered",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        graft.core.Tables.registerAll(s, d)
        s.sql("""
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 cosine_sim(a.embedding, b.embedding) AS cosine,
                 euclidean_dist(a.embedding, b.embedding) AS dist
          FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
          WHERE a.vec_id < 100
          ORDER BY id_a""")
      },
      Some("""WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
              )
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i])) /
                (SQRT(list_sum(list_transform(a.e, x -> x * x))) *
                 SQRT(list_sum(list_transform(b.e, x -> x * x)))) AS cosine,
              SQRT(list_sum(list_transform(range(1, len(a.e) + 1),
                i -> (a.e[i] - b.e[i]) * (a.e[i] - b.e[i])))) AS dist
              FROM v a JOIN v b ON b.vec_id = a.vec_id + 1
              WHERE a.vec_id < 100
              ORDER BY id_a"""))
  )
}
