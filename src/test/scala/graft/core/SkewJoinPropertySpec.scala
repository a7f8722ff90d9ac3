package graft.core

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property harness for the salted skew join: for ARBITRARY key
  * distributions (hot keys, NULL keys, keys present on only one side,
  * duplicate rows on both sides) and any salt factor, saltedJoin must be
  * multiset-identical to the plain equi-join it replaces — inner and
  * left. The deterministic scenarios in SkewJoinSpec pin the four known
  * traps; this spec walks the distribution space where a scatter or
  * replication bug shows up as silently duplicated or dropped rows
  * (salting replicates one side ×saltFactor — exactly the kind of
  * transform where an off-by-one survives a handful of fixed cases). */
class SkewJoinPropertySpec extends SparkSpec {

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(minSuccessful)
        .withMaxDiscardRatio(10f)
        .withMinSize(1).withMaxSize(10),
      prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  // small key alphabet + frequency skew toward "hot" → heavy collisions
  private val keyGen: Gen[String] = Gen.frequency(
    5 -> Gen.const("hot"), 2 -> Gen.oneOf("a", "b", "c"),
    1 -> Gen.const(null: String))

  private val caseGen: Gen[(List[(String, Int)], List[(String, Int)], Int, String)] =
    for {
      nl <- Gen.choose(1, 40)
      nr <- Gen.choose(0, 15)
      ls <- Gen.listOfN(nl, for { k <- keyGen; v <- Gen.choose(0, 5) } yield (k, v))
      rs <- Gen.listOfN(nr, for { k <- keyGen; v <- Gen.choose(0, 5) } yield (k, v))
      salt <- Gen.choose(1, 7)
      jt <- Gen.oneOf("inner", "left")
    } yield (ls, rs, salt, jt)

  test("saltedJoin is multiset-identical to the plain equi-join") {
    import spark.implicits._
    val prop = Prop.forAll(caseGen) { case (ls, rs, salt, jt) =>
      val skewed = ls.toDF("k", "lv")
      val other = rs.toDF("k", "rv")
      val got = SkewJoin.saltedJoin(skewed, other, Seq("k"), salt, jt)
      val want = skewed.join(other, Seq("k"), jt)
      // align column order before the multiset compare
      val g = got.select(want.columns.map(col): _*)
      g.exceptAll(want).isEmpty && want.exceptAll(g).isEmpty
    }
    check(prop, minSuccessful = 40)
  }
}
