package graft.tables

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property harness for the CDC merge semantics: folding random
  * Debezium-shaped change batches through [[Cdc.applyChanges]] must
  * equal an independent in-memory fold of the same batches —
  * last-write-wins by `seq` within a batch, upsert replaces the whole
  * row, delete removes it, rows without a change carry through, and a
  * NULL key is a real key (the join is null-safe). CdcSpec pins the
  * known scenarios; this walks the batch-sequence space a 100 TB CDC
  * topic actually produces (keys churning through upsert→delete→
  * re-insert across batches). */
class CdcPropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(minSuccessful)
        .withMaxDiscardRatio(10f)
        .withMinSize(1).withMaxSize(10),
      prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  // key None = SQL NULL (exercises the null-safe key join)
  private type K = Option[Long]
  private type Payload = (String, Option[Double])
  private type Change = (K, Payload, String) // (key, payload, op)

  private val keyGen: Gen[K] =
    Gen.frequency(9 -> Gen.choose(0L, 12L).map(Some(_)), 1 -> Gen.const(None))

  private val payloadGen: Gen[Payload] =
    for {
      v <- Gen.alphaStr.map(_.take(4))
      m <- Gen.option(Gen.choose(-3, 3).map(_.toDouble))
    } yield (v, m)

  private val changeGen: Gen[Change] =
    for {
      k <- keyGen
      p <- payloadGen
      op <- Gen.frequency(3 -> Gen.const("upsert"), 2 -> Gen.const("delete"))
    } yield (k, p, op)

  private val caseGen: Gen[(List[(K, Payload)], List[List[Change]])] =
    for {
      init0 <- Gen.listOf(Gen.zip(keyGen, payloadGen)).map(_.take(10))
      batches <- Gen.listOfN(3, Gen.nonEmptyListOf(changeGen).map(_.take(8)))
    } yield (init0.distinctBy(_._1), batches)

  private def stateDf(state: Map[K, Payload]): DataFrame =
    state.toSeq.map { case (k, (v, m)) =>
      (k.map(Long.box).orNull: java.lang.Long, v,
        m.map(Double.box).orNull: java.lang.Double)
    }.toDF("k", "v", "m")

  test("property: applyChanges folds random batches exactly like an in-memory LWW fold") {
    check(Prop.forAll(caseGen) { case (init, batches) =>
      var expected: Map[K, Payload] = init.toMap
      var table: DataFrame = stateDf(expected)
      var seq = 0L
      val ok = batches.forall { batch =>
        // globally increasing seq: unambiguous last-write-wins per key
        val numbered = batch.map { c => seq += 1; (c, seq) }
        val changesDf = numbered.map { case ((k, (v, m), op), sq) =>
          (k.map(Long.box).orNull: java.lang.Long, v,
            m.map(Double.box).orNull: java.lang.Double, op, sq)
        }.toDF("k", "v", "m", "op", "seq")
        table = Cdc.applyChanges(table, changesDf, Seq("k"), "seq", "op")
        // in-memory oracle: per key, the batch's highest-seq change wins
        numbered.groupBy(_._1._1).foreach { case (k, cs) =>
          val ((_, p, op), _) = cs.maxBy(_._2)
          if (op == "delete") expected -= k else expected += (k -> p)
        }
        val got = table.collect().map { r =>
          (Option(r.get(0)).map(_.asInstanceOf[Long]),
            (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
        }.toList
        got.sizeIs == expected.size && got.toMap == expected &&
          got.map(_._1).distinct.sizeIs == got.size
      }
      ok
    }, minSuccessful = 12)
  }
}
