package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import QueryDef._

/** Projection / derivation / filter operators P1–P14 from SURVEY.md §2.2,
  * re-expressed over testdata with DuckDB oracles. These are the Silver
  * ETL's column-level semantics; the golf-domain fixtures exercise them
  * end-to-end in SilverEtlSpec, and these queries pin the arithmetic
  * against an independent engine.
  */
object ProjQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // P1 — bracket/dot column names referenced via backtick escaping
    // (etl.py:35-37): rename to the reference's `locations[0].x` shape,
    // then select through SilverEtl.bracketCol.
    QueryDef(
      "p1_bracket_columns",
      (s, d) => {
        val renamed = t(s, d, "lineitem")
          .withColumnRenamed("l_quantity", "locations[0].startTime")
          .withColumnRenamed("l_orderkey", "locations[0].fixCoordinates[0]")
        renamed.select(
            graft.ingest.SilverEtl.bracketCol("locations[0].fixCoordinates[0]").as("k"),
            graft.ingest.SilverEtl.bracketCol("locations[0].startTime").as("qty"))
          .groupBy((col("k") % 7).as("bucket"))
          .agg(dsum(col("qty")).as("sum_qty"))
          .orderBy(col("bucket"))
      },
      Some(s"""SELECT l_orderkey % 7 AS bucket, ${dsumSql("l_quantity")} AS sum_qty
               FROM lineitem GROUP BY 1 ORDER BY bucket""")),

    // P3 — the cast ladder applied to round-config fields (etl.py:282-308).
    QueryDef(
      "p3_cast_ladder",
      (s, d) =>
        t(s, d, "orders")
          .select(
            col("o_orderkey").cast(StringType).as("key_str"),
            col("o_totalprice").cast(IntegerType).as("price_int"),
            substring(col("o_orderpriority"), 1, 1).cast(IntegerType).as("priority_num"),
            (col("o_orderstatus") === "F").cast(BooleanType).as("is_finished"))
          .orderBy(col("key_str")),
      // Spark double→int casts TRUNCATE; DuckDB's round — TRUNC() pins it.
      Some("""SELECT CAST(o_orderkey AS VARCHAR) AS key_str,
              CAST(TRUNC(o_totalprice) AS INTEGER) AS price_int,
              CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) AS priority_num,
              o_orderstatus = 'F' AS is_finished
              FROM orders ORDER BY key_str""")),

    // P4 — JSON locations explode: posexplode the nested array and repack
    // the normalized location struct (etl.py:311-349). The fixture gives
    // every event a 3-slot array whose last slot is all-NULL (padding),
    // and deliberately OMITS batteryPercentage/isCache from the source
    // struct so the missing-field → NULL fallback (etl.py:327) is
    // exercised and oracle-pinned.
    QueryDef(
      "p4_json_locations_explode",
      (s, d) => {
        def slot(i: Int) = struct(
          (col("user_id") % 18 + 1 + i).cast(IntegerType).as("hole"),
          (col("user_id") % 54 + 1 + i).cast(IntegerType).as("sectionNumber"),
          (col("user_id") % 3 + 1 + i).cast(IntegerType).as("holeSection"),
          (col("value") * 10 + i).as("startTime"),
          array(lit(18.4) + col("value") / 1000 + i,
            lit(-33.9) - col("value") / 1000 - i).as("fixCoordinates"),
          ((col("user_id") + i) % 2 === 0).as("isProjected"),
          lit(false).as("isProblem"),
          ((col("value") + i) / 7).as("paceGap"),
          ((col("value") + i) / 11).as("positionalGap"),
          ((col("value") + i) / 13).as("pace"))
        val padding = struct(
          lit(null).cast(IntegerType).as("hole"),
          lit(null).cast(IntegerType).as("sectionNumber"),
          lit(null).cast(IntegerType).as("holeSection"),
          lit(null).cast(DoubleType).as("startTime"),
          lit(null).cast(ArrayType(DoubleType)).as("fixCoordinates"),
          lit(null).cast(BooleanType).as("isProjected"),
          lit(null).cast(BooleanType).as("isProblem"),
          lit(null).cast(DoubleType).as("paceGap"),
          lit(null).cast(DoubleType).as("positionalGap"),
          lit(null).cast(DoubleType).as("pace"))
        val jsonShaped = t(s, d, "events").select(
          col("event_id").as("round_id"), col("user_id"), col("value"),
          array(slot(0), slot(1), padding).as("locations"))
        graft.ingest.SilverEtl.explodeJsonLocations(jsonShaped)
          .select(
            col("round_id"),
            col("location.location_index").as("location_index"),
            col("location.hole_number").as("hole_number"),
            col("location.section_number").as("section_number"),
            col("location.hole_section").as("hole_section"),
            col("location.start_offset_seconds").as("start_offset_seconds"),
            col("location.longitude").as("longitude"),
            col("location.latitude").as("latitude"),
            col("location.is_projected").as("is_projected"),
            col("location.pace_gap").as("pace_gap"),
            col("location.positional_gap").as("positional_gap"),
            col("location.pace").as("pace"),
            col("location.battery_percentage").as("battery_percentage"))
      },
      Some("""SELECT e.event_id AS round_id, g.i AS location_index,
              CASE WHEN g.i < 2 THEN CAST(e.user_id % 18 + 1 + g.i AS INTEGER) END AS hole_number,
              CASE WHEN g.i < 2 THEN CAST(e.user_id % 54 + 1 + g.i AS INTEGER) END AS section_number,
              CASE WHEN g.i < 2 THEN CAST(e.user_id % 3 + 1 + g.i AS INTEGER) END AS hole_section,
              CASE WHEN g.i < 2 THEN e.value * 10 + g.i END AS start_offset_seconds,
              CASE WHEN g.i < 2 THEN 18.4e0 + e.value / 1000 + g.i END AS longitude,
              CASE WHEN g.i < 2 THEN -33.9e0 - e.value / 1000 - g.i END AS latitude,
              CASE WHEN g.i < 2 THEN (e.user_id + g.i) % 2 = 0 END AS is_projected,
              CASE WHEN g.i < 2 THEN ROUND((e.value + g.i) / 7, 3) END AS pace_gap,
              CASE WHEN g.i < 2 THEN ROUND((e.value + g.i) / 11, 3) END AS positional_gap,
              CASE WHEN g.i < 2 THEN ROUND((e.value + g.i) / 13, 3) END AS pace,
              CAST(NULL AS DOUBLE) AS battery_percentage
              FROM events e CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS i) g""")),

    // P5 — CSV locations explode over bracket-named flat columns
    // (etl.py:352-384): index 0 carries the full column set, index 1 a
    // PARTIAL set (missing suffixes → NULL), index 2 none at all — the
    // all-NULL padding slot is PRESERVED (the reference's no-data-loss
    // rule, etl.py:386-387).
    QueryDef(
      "p5_csv_locations_explode",
      (s, d) => {
        val csvShaped = t(s, d, "events").select(
          col("event_id").as("round_id"),
          (col("user_id") % 18 + 1).as("locations[0].hole"),
          (col("user_id") % 54 + 1).as("locations[0].sectionNumber"),
          (col("value") * 10).as("locations[0].startTime"),
          concat(lit("t"), col("user_id")).as("locations[0].date"),
          (lit(18.4) + col("value") / 1000).as("locations[0].fixCoordinates[0]"),
          (lit(-33.9) - col("value") / 1000).as("locations[0].fixCoordinates[1]"),
          ((col("value") + 1) / 7).as("locations[0].paceGap"),
          (col("user_id") % 18 + 2).as("locations[1].hole"),
          (col("value") * 10 + 1).as("locations[1].startTime"))
        graft.ingest.SilverEtl.explodeCsvLocations(csvShaped, indices = Seq(0, 1, 2))
          .select(
            col("round_id"),
            col("location.location_index").as("location_index"),
            col("location.hole_number").as("hole_number"),
            col("location.section_number").as("section_number"),
            col("location.start_offset_seconds").as("start_offset_seconds"),
            col("location.fix_time_iso").as("fix_time_iso"),
            col("location.longitude").as("longitude"),
            col("location.latitude").as("latitude"),
            col("location.pace_gap").as("pace_gap"))
      },
      Some("""SELECT e.event_id AS round_id, g.i AS location_index,
              CASE WHEN g.i = 0 THEN CAST(e.user_id % 18 + 1 AS INTEGER)
                   WHEN g.i = 1 THEN CAST(e.user_id % 18 + 2 AS INTEGER) END AS hole_number,
              CASE WHEN g.i = 0 THEN CAST(e.user_id % 54 + 1 AS INTEGER) END AS section_number,
              CASE WHEN g.i = 0 THEN e.value * 10
                   WHEN g.i = 1 THEN e.value * 10 + 1 END AS start_offset_seconds,
              CASE WHEN g.i = 0 THEN 't' || CAST(e.user_id AS VARCHAR) END AS fix_time_iso,
              CASE WHEN g.i = 0 THEN 18.4e0 + e.value / 1000 END AS longitude,
              CASE WHEN g.i = 0 THEN -33.9e0 - e.value / 1000 END AS latitude,
              CASE WHEN g.i = 0 THEN ROUND((e.value + 1) / 7, 3) END AS pace_gap
              FROM events e CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS i) g""")),

    // P6 — fix-timestamp derivation: coalesce(ISO parse, epoch-base +
    // offset seconds) (etl.py:389-396). Even events carry an ISO string,
    // odd events only an integral offset from a base timestamp.
    QueryDef(
      "p6_timestamp_coalesce",
      (s, d) =>
        t(s, d, "events")
          .withColumn(
            "iso",
            when(col("event_id") % 2 === 0,
              date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss")))
          .withColumn("offset_s", floor(col("value")))
          .withColumn(
            "fix_ts",
            coalesce(
              to_timestamp(col("iso")),
              from_unixtime(unix_timestamp(col("ts")) + col("offset_s"))
                .cast(TimestampType)))
          .groupBy(col("event_type"))
          .agg(
            min(col("fix_ts")).as("min_fix"),
            max(col("fix_ts")).as("max_fix"),
            count(col("fix_ts")).as("n"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type, MIN(fix_ts) AS min_fix, MAX(fix_ts) AS max_fix,
              COUNT(fix_ts) AS n FROM (
                SELECT event_type,
                COALESCE(
                  CASE WHEN event_id % 2 = 0 THEN DATE_TRUNC('second', ts) END,
                  DATE_TRUNC('second', ts) + TO_SECONDS(CAST(FLOOR(value) AS BIGINT))
                ) AS fix_ts
                FROM events
              ) GROUP BY event_type ORDER BY event_type""")),

    // P7 — padding flag: two key fields both NULL (etl.py:404-408),
    // synthesized here with NULLIF.
    QueryDef(
      "p7_padding_flag",
      (s, d) =>
        t(s, d, "events")
          .withColumn("hole", nullif(col("user_id") % 10, lit(0)))
          .withColumn("section", nullif(col("event_id") % 5, lit(0)))
          .withColumn(
            "is_padding", col("hole").isNull && col("section").isNull)
          .groupBy(col("is_padding"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("is_padding")),
      Some("""SELECT (NULLIF(user_id % 10, 0) IS NULL AND NULLIF(event_id % 5, 0) IS NULL) AS is_padding,
              COUNT(*) AS n FROM events GROUP BY 1 ORDER BY is_padding""")),

    // P8 — duration from two timestamps in minutes, null-guarded
    // (etl.py:451-464). Division stays un-rounded so both engines do the
    // identical IEEE op (the library variant keeps the reference's 2dp
    // rounding).
    QueryDef(
      "p8_duration_minutes",
      (s, d) =>
        t(s, d, "events")
          .groupBy(col("user_id"))
          .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
          .select(
            col("user_id"),
            when(col("first_ts").isNotNull && col("last_ts").isNotNull,
              (unix_timestamp(col("last_ts")) - unix_timestamp(col("first_ts")))
                .cast(DoubleType) / 60.0)
              .as("session_minutes"))
          .orderBy(col("user_id")),
      Some("""SELECT user_id,
              CAST(CAST(FLOOR(EPOCH(last_ts)) AS BIGINT) - CAST(FLOOR(EPOCH(first_ts)) AS BIGINT) AS DOUBLE) / 60.0e0 AS session_minutes
              FROM (SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts
                    FROM events GROUP BY user_id)
              ORDER BY user_id""")),

    // P9 — date parts incl. the dayofweek numbering trap: Spark is
    // 1=Sun..7=Sat, DuckDB is 0=Sun..6=Sat (etl.py:467-474; SURVEY §2.2 P9).
    QueryDef(
      "p9_date_parts",
      (s, d) =>
        t(s, d, "events")
          .select(
            col("event_id"),
            year(col("ts")).as("event_year"),
            month(col("ts")).as("event_month"),
            dayofmonth(col("ts")).as("event_day"),
            dayofweek(col("ts")).as("event_weekday"),
            hour(col("ts")).as("event_hour"),
            to_date(col("ts")).as("event_date"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id,
              CAST(YEAR(ts) AS INTEGER) AS event_year,
              CAST(MONTH(ts) AS INTEGER) AS event_month,
              CAST(DAY(ts) AS INTEGER) AS event_day,
              CAST(DAYOFWEEK(ts) + 1 AS INTEGER) AS event_weekday,
              CAST(HOUR(ts) AS INTEGER) AS event_hour,
              CAST(ts AS DATE) AS event_date
              FROM events ORDER BY event_id""")),

    // P10 — the nine_number fallback ladder: coalesce over nested when
    // ladders (etl.py:484-551), as value-band classification.
    QueryDef(
      "p10_fallback_ladder",
      (s, d) => {
        val fromType = when(col("event_type") === "purchase", lit(9))
        val fromUser =
          when(col("user_id") >= 40, lit(2))
            .when(col("user_id").isNotNull, lit(1))
        val fromValue =
          when(col("value") <= 27, lit(1))
            .when(col("value") <= 54, lit(2))
            .when(col("value") <= 81, lit(3))
            .otherwise(lit(1))
        t(s, d, "events")
          .withColumn("band", coalesce(fromType, fromUser, fromValue))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("band"))
      },
      Some("""SELECT COALESCE(
                CASE WHEN event_type = 'purchase' THEN 9 END,
                CASE WHEN user_id >= 40 THEN 2 WHEN user_id IS NOT NULL THEN 1 END,
                CASE WHEN value <= 27 THEN 1 WHEN value <= 54 THEN 2
                     WHEN value <= 81 THEN 3 ELSE 1 END) AS band,
              COUNT(*) AS n FROM events GROUP BY 1 ORDER BY band""")),

    // P11 — WKT point text from coordinate pairs, null-guarded
    // (etl.py:554-567).
    QueryDef(
      "p11_wkt_point",
      (s, d) =>
        t(s, d, "customer")
          .select(
            col("c_custkey"),
            when(col("c_acctbal").isNotNull && col("c_nationkey").isNotNull,
              concat(
                lit("POINT("), col("c_acctbal").cast(StringType),
                lit(" "), col("c_nationkey").cast(StringType), lit(")")))
              .as("geometry_wkt"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
              CASE WHEN c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL THEN
                'POINT(' || CAST(c_acctbal AS VARCHAR) || ' ' || CAST(c_nationkey AS VARCHAR) || ')'
              END AS geometry_wkt
              FROM customer ORDER BY c_custkey""")),

    // P12 — coordinate-bounds quarantine split (etl.py:590-608): synthetic
    // lon/lat from keys, count valid vs quarantined.
    QueryDef(
      "p12_coord_quarantine",
      (s, d) => {
        val withCoords = t(s, d, "customer")
          .withColumn("lon", (col("c_custkey") % 400 - 200).cast(DoubleType))
          .withColumn("lat", (col("c_custkey") % 200 - 100).cast(DoubleType))
        val invalid =
          (col("lon").isNotNull && (col("lon") < -180.0 || col("lon") > 180.0)) ||
            (col("lat").isNotNull && (col("lat") < -90.0 || col("lat") > 90.0))
        withCoords.withColumn("is_invalid_coord", invalid)
          .groupBy(col("is_invalid_coord"))
          .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("sum_key"))
          .orderBy(col("is_invalid_coord"))
      },
      Some("""SELECT is_invalid_coord, COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS sum_key FROM (
                SELECT c_custkey,
                (lon < -180.0 OR lon > 180.0) OR (lat < -90.0 OR lat > 90.0) AS is_invalid_coord
                FROM (SELECT c_custkey,
                      CAST(c_custkey % 400 - 200 AS DOUBLE) AS lon,
                      CAST(c_custkey % 200 - 100 AS DOUBLE) AS lat
                      FROM customer)
              ) GROUP BY is_invalid_coord ORDER BY is_invalid_coord""")),

    // P13 — course-mismatch sanity probe: count of rows violating an
    // expected tag, warn-only in the reference (etl.py:193-201).
    QueryDef(
      "p13_mismatch_probe",
      (s, d) =>
        t(s, d, "orders")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("o_orderstatus") =!= "O", 1).otherwise(0)).as("n_mismatched")),
      Some("""SELECT COUNT(*) AS n_rows,
              CAST(SUM(CASE WHEN o_orderstatus <> 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched
              FROM orders""")),

    // P14 — empty-string → NULL normalization (dimensions.py:346-353).
    QueryDef(
      "p14_empty_to_null",
      (s, d) => {
        val df = t(s, d, "documents")
          .withColumn("source2", when(col("source") === "src1", "").otherwise(col("source")))
        graft.ingest.SilverEtl.emptyToNull(df, Seq("source2"))
          .agg(
            count(lit(1)).as("n"),
            count(col("source2")).as("n_nonnull"),
            countDistinct(col("source2")).as("n_sources"))
      },
      Some("""SELECT COUNT(*) AS n, COUNT(s2) AS n_nonnull, COUNT(DISTINCT s2) AS n_sources
              FROM (SELECT NULLIF(CASE WHEN source = 'src1' THEN '' ELSE source END, '') AS s2
                    FROM documents)"""))
  )
}
