package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skew-heavy equi-joins (SURVEY §4 scale toolkit).
  *
  * AQE's skew-join split handles most skew at runtime, but only for
  * sort-merge joins and only per already-materialized shuffle blocks; a
  * pathological hot key (one course producing 30% of all telemetry, one
  * boilerplate fingerprint in half the corpus) still hashes every row to
  * one task first. Salting fixes the hash itself: the skewed side
  * scatters each key across `saltFactor` sub-keys, the other side
  * replicates each row `saltFactor` ways, and the join key becomes
  * (key, salt) — the hot key's rows now land on `saltFactor` tasks.
  * Results are row-identical to the plain join (spec-pinned); cost is
  * replicating the small side `saltFactor`×, so size it like a broadcast
  * decision.
  */
object SkewJoin {

  /** Equi-join `skewed` with `other` on `keys`, scattering the skewed
    * side over `saltFactor` salts. Supports the join types where
    * replicating `other` is sound row-wise: "inner" and "left"
    * (left = skewed side preserved). */
  def saltedJoin(
      skewed: DataFrame, other: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    require(Seq("inner", "left").contains(joinType),
      s"saltedJoin supports inner/left, got $joinType")
    // Deterministic per-row scatter: hash of a per-row id, not rand() —
    // re-execution of a failed task must land rows on the same salt.
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor.toLong)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    // Plain EqualTo on the keys — exactly the semantics of
    // df.join(other, keys): NULL keys never match (and are null-padded
    // under "left"), so results stay row-identical to the unsalted join.
    val cond: Column = (keys.map(k => salted(k) === replicated(k)) :+
      (salted("__salt") === replicated("__salt"))).reduce(_ && _)
    // de-duplicate join columns: keep the skewed side's key columns
    (keys.map(replicated(_)) ++ Seq(replicated("__salt"), salted("__salt")))
      .foldLeft(salted.join(replicated, cond, joinType))((df, c) => df.drop(c))
  }
}
