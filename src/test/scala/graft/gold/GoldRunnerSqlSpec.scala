package graft.gold

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.ingest.SilverEtl
import graft.ingest.SilverEtl.SilverConfig

/** Pure-SQL gold route parity: every GoldRunnerSql model must be
  * multiset-identical (same columns, same rows, bit-equal values via
  * exceptAll) to the DataFrame route — the dbt-role SQL surface and the
  * library surface are one semantics. */
class GoldRunnerSqlSpec extends SparkSpec {

  private def res(p: String): String =
    getClass.getResource(p).toString.stripPrefix("file:")

  private lazy val topology: DataFrame =
    spark.read.option("header", true).csv(res("/golf/seeds/dim_facility_topology.csv"))

  private lazy val silver: DataFrame = {
    val json = SilverEtl.transform(
      SilverEtl.readJson(spark, res("/golf/json") + "/*.json"),
      SilverConfig("americanfalls", "2024-01-20"))._1
    val csv = SilverEtl.transform(
      SilverEtl.readCsvUnion(spark, res("/golf/csv")),
      SilverConfig("erinhills", "2024-04-05", topology = Some(topology)))._1
    json.unionByName(csv).persist()
  }

  // exact percentiles on both routes: the sketch-based approx variant is
  // only deterministic within one physical plan, the exact one everywhere
  private lazy val dfModels =
    GoldRunner.buildAll(silver, topology, exactPercentiles = true, persist = false)
  private lazy val sqlModels =
    GoldRunnerSql.buildAll(spark, silver, topology, exactPercentiles = true)

  test("SQL route builds the same 20 models as the DataFrame route") {
    assert(sqlModels.keySet === dfModels.keySet)
  }

  for (name <- Seq(
      "fact_rounds", "fact_round_hole_performance", "pace_summary_by_round",
      "signal_quality_rounds", "device_health_errors", "data_quality_overview",
      "critical_column_gaps", "course_configuration_analysis",
      "course_rounds_by_month", "course_rounds_by_weekday",
      "course_start_hole_distribution", "telemetry_completeness_summary",
      "dim_course", "gold_coverage_audit", "fact_telemetry_fix", "dim_round",
      "dim_device", "global_overview", "global_course_summary",
      "global_time_patterns")) {
    test(s"SQL ≡ DataFrame: $name") {
      val sql = sqlModels(name)
      val df = dfModels(name)
      assert(sql.columns.toSeq === df.columns.toSeq,
        s"$name column mismatch")
      // collected multiset compare (bit-exact, incl. arrays/timestamps);
      // exceptAll would also work semantically but trips an analyzer
      // DeduplicateRelations bug on the view-heavy coverage-audit plan
      def multiset(d: DataFrame): Map[Seq[Any], Int] =
        d.collect().iterator.map(_.toSeq.map {
          case a: Array[_] => a.toSeq
          case x => x
        }).toSeq.groupBy(identity).view.mapValues(_.size).toMap
      val a = multiset(sql); val b = multiset(df)
      val onlySql = a.keySet -- b.keySet
      val onlyDf = b.keySet -- a.keySet
      assert(a === b,
        s"$name differs; e.g. only-SQL=${onlySql.take(1)} only-DF=${onlyDf.take(1)}")
    }
  }
}
