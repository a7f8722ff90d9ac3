package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property harness for the as-of join: under ARBITRARY key/timestamp
  * collisions, NULL timestamps, NULL keys on either side, and NULL
  * payload fields, [[AsOfJoin.asof]] (the union + carry-forward
  * one-shuffle form) must match the brute-force definition — for each
  * left row, the right row with the greatest ts ≤ l.ts on the same
  * non-NULL key, ties by greatest tie value — computed here by the
  * quadratic scan the operator exists to avoid.
  *
  * The deterministic scenarios in AsOfJoinSpec pin the five known traps
  * (inclusivity, tie order, payload atomicity, NULL semantics, key
  * isolation); this spec walks the collision space, where a window
  * ordering or carry bug would surface as a wrong-but-plausible match.
  * Right rows carry a UNIQUE tie id (the operator's documented
  * determinism contract — equal (key, ts, tie) with different payloads
  * is undefined by design). */
class AsOfPropertySpec extends SparkSpec {

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(minSuccessful)
        .withMaxDiscardRatio(10f)
        .withMinSize(1).withMaxSize(12),
      prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  private val keys: Seq[String] = Seq("k1", "k2", "k3", null)
  // tiny ts range → heavy collisions, the interesting regime
  private val tsGen: Gen[Option[Int]] =
    Gen.frequency(9 -> Gen.choose(0, 6).map(Some(_)), 1 -> Gen.const(None))

  private case class L(key: String, ts: Option[Int], lid: Int)
  private case class R(key: String, ts: Option[Int], tie: Int,
      p1: Option[Int], p2: Option[String])

  private val caseGen: Gen[(List[L], List[R])] = for {
    nl <- Gen.choose(1, 25)
    nr <- Gen.choose(0, 25)
    ls <- Gen.listOfN(nl, for {
      k <- Gen.oneOf(keys); t <- tsGen
    } yield (k, t))
    rs <- Gen.listOfN(nr, for {
      k <- Gen.oneOf(keys); t <- tsGen
      p1 <- Gen.option(Gen.choose(-9, 9))
      p2 <- Gen.option(Gen.oneOf("x", "y", "z"))
    } yield (k, t, p1, p2))
  } yield (
    ls.zipWithIndex.map { case ((k, t), i) => L(k, t, i) },
    rs.zipWithIndex.map { case ((k, t, p1, p2), i) => R(k, t, i, p1, p2) })

  /** Brute-force oracle: latest (ts, then tie) right row at or before,
    * same non-NULL key. */
  private def expected(ls: List[L], rs: List[R]): Set[(Int, Option[Int], Option[String])] =
    ls.map { l =>
      val m = (for {
        r <- rs
        if r.key != null && l.key != null && r.key == l.key
        rt <- r.ts
        lt <- l.ts
        if rt <= lt
      } yield r).sortBy(r => (r.ts.get, r.tie)).lastOption
      (l.lid, m.flatMap(_.p1), m.flatMap(_.p2))
    }.toSet

  test("asof equals the brute-force latest-preceding-right oracle") {
    import spark.implicits._
    val prop = Prop.forAll(caseGen) { case (ls, rs) =>
      val left = ls.map(l => (l.key, l.ts.map(_.toLong), l.lid))
        .toDF("key", "ts", "lid")
        .select(col("key"), col("ts").cast("timestamp").as("ts"), col("lid"))
      val right = rs.map(r => (r.key, r.ts.map(_.toLong), r.tie, r.p1, r.p2))
        .toDF("key", "ts", "tie", "p1", "p2")
        .select(col("key"), col("ts").cast("timestamp").as("ts"),
          col("tie"), col("p1"), col("p2"))
      val got = AsOfJoin.asof(left, right, Seq("key"), "ts",
          payloadCols = Seq("p1", "p2"), rightTieCol = Some("tie"))
        .select(col("lid"), col("p1"), col("p2"))
        .collect()
        .map { case Row(lid: Int, p1, p2) =>
          (lid, Option(p1).map(_.asInstanceOf[Int]),
            Option(p2).map(_.asInstanceOf[String]))
        }.toSet
      val want = expected(ls, rs)
      if (got != want) {
        info(s"left=$ls")
        info(s"right=$rs")
        info(s"got-want=${got -- want}; want-got=${want -- got}")
      }
      got == want
    }
    check(prop, minSuccessful = 60)
  }
}
