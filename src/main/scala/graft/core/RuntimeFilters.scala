package graft.core

import org.apache.spark.sql.SparkSession

/** Runtime-filter helpers: scoped session-conf control for Spark's
  * runtime bloom-filter join pruning (`InjectRuntimeFilter`).
  *
  * At 100 TB the classic win is a selective dimension predicate pruning a
  * fact-table shuffle join: Spark builds a bloom filter over the filtered
  * creation side's join keys and pushes a `might_contain` probe onto the
  * application side BEFORE its shuffle, so non-matching fact rows never
  * leave the scan stage. This is free to declare — the optimizer injects
  * it when a shuffle equi-join has a selective creation side — but the
  * default `applicationSideScanSizeThreshold` (10 GB) deliberately skips
  * small scans, so local tests/demos must lower it to observe the plan.
  * [[withBloomJoin]] scopes exactly that, restoring every conf after.
  */
object RuntimeFilters {

  /** Run `body` with the given session confs set, restoring previous
    * values (or unsetting) afterwards — conf hygiene for plan-shaping
    * experiments on a shared session. */
  def withConfs[T](spark: SparkSession, confs: (String, String)*)(body: => T): T = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Run `body` with runtime bloom-filter injection active for
    * shuffle joins of any scan size (application-side threshold 0) and
    * broadcast joins disabled (a broadcast join already prunes on the
    * stream side; the bloom filter targets the shuffle-join case that
    * dominates at fact × fact scale). */
  def withBloomJoin[T](spark: SparkSession)(body: => T): T =
    withConfs(spark,
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")(body)
}
