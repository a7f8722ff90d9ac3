package graft.core

import org.apache.spark.sql.SparkSession

/** Data-derived shuffle-partition sizing for operators that EXECUTE
  * bounded-state iteration internally (graph fixpoints, perceptron
  * epochs): the iteration's shuffles run at parts = clamp(⌈rows ·
  * bytesPerRow / 64 MB⌉, 1, session value) instead of the session-wide
  * constant. The session setting stays the CEILING (the cluster's
  * sizing — at corpus scale the override is a no-op), the measured byte
  * math the floor, so a node/edge-grain loop no longer pays a fixed
  * fan-out (e.g. 32 map files + 32 reduce tasks per shuffle, per
  * iteration) to move kilobytes. This is the optimization guide's §2.2
  * "size partitions into the 100 MB-1 GB range" applied where AQE
  * cannot reach: AQE's parallelismFirst coalescing stops shrinking at
  * defaultParallelism, and the MAP-side fan-out is fixed before AQE
  * ever sees the stage. Scale-adaptive by construction — the measured
  * row count decides, so a ×100 replica or a 100 TB corpus derives its
  * own count and real corpora saturate the session ceiling.
  *
  * Serialized per JVM (one lock): Verify/Bench run gates serially by
  * contract anyway; concurrent ScalaTest suites sharing a session queue
  * here instead of racing the conf save/restore. Queries running
  * concurrently on the session during an override only ever see a
  * partition-COUNT change, which no corpus result depends on (the
  * dsum / exact-aggregation discipline). */
object ShuffleSizing {

  /** Post-shuffle partition byte target (matches AQE's
    * advisoryPartitionSizeInBytes default). */
  val TargetShuffleBytes: Long = 64L << 20

  private val lock = new Object

  def withSizedShuffle[T](
      spark: SparkSession, rows: Long, bytesPerRow: Long)(body: => T): T =
    lock.synchronized {
      val key = "spark.sql.shuffle.partitions"
      val saved = spark.conf.get(key)
      val ceiling =
        try saved.toInt
        catch { case _: NumberFormatException =>
          spark.sparkContext.defaultParallelism }
      val parts = math.max(1L, math.min(ceiling.toLong,
        (rows * bytesPerRow + TargetShuffleBytes - 1) / TargetShuffleBytes))
      spark.conf.set(key, parts.toString)
      try body finally spark.conf.set(key, saved)
    }
}
