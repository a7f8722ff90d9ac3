package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.gold.GoldModels
import graft.ingest.SilverEtl
import graft.llm.Dedup

/** ScalaCheck property tests (SURVEY §5 rebuild plan): dedup idempotency
  * and explode/rollup count reconciliation, over randomized round shapes.
  * Uses the raw scalacheck runner (no scalatestplus bridge in the offline
  * cache).
  */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(prop: Prop, minSuccessful: Int = 20): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(minSuccessful)
        .withMaxDiscardRatio(10f)
        .withMinSize(1).withMaxSize(12),
      prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  /** A fix row: (round, offsetSeconds, index, isCache, isProjected, battery). */
  private val fixGen: Gen[(String, Int, Int, Boolean, Boolean, Option[Double])] =
    for {
      round <- Gen.oneOf("r1", "r2", "r3")
      offset <- Gen.choose(0, 5)
      idx <- Gen.choose(0, 3)
      cache <- Gen.oneOf(true, false)
      proj <- Gen.oneOf(true, false)
      battery <- Gen.option(Gen.choose(0.0, 100.0))
    } yield (round, offset, idx, cache, proj, battery)

  private def toTelemetry(fixes: List[(String, Int, Int, Boolean, Boolean, Option[Double])]) =
    fixes.toDF("round_id", "offset", "location_index", "is_cache", "is_projected",
        "battery_percentage")
      .withColumn("fix_timestamp",
        to_timestamp(lit("2024-01-15 10:00:00")) +
          make_dt_interval(lit(0), lit(0), lit(0), col("offset")))

  test("property: dedup is idempotent and keeps exactly one row per key") {
    check(Prop.forAll(Gen.nonEmptyListOf(fixGen)) { fixes =>
      val df = toTelemetry(fixes)
      val once = SilverEtl.dedupFixes(df)
      val twice = SilverEtl.dedupFixes(once)
      val keys = df.select("round_id", "fix_timestamp", "location_index")
        .distinct().count()
      once.count() == keys && twice.count() == once.count()
    }, minSuccessful = 10)
  }

  test("property: dedup winner obeys the cache > non-projected > battery order") {
    check(Prop.forAll(Gen.nonEmptyListOf(fixGen)) { fixes =>
      val df = toTelemetry(fixes)
      val winners = SilverEtl.dedupFixes(df)
        .select("round_id", "fix_timestamp", "location_index", "is_cache")
        .collect()
      // if any candidate in a key group is cached, the winner must be cached
      val cacheByKey = df
        .groupBy("round_id", "fix_timestamp", "location_index")
        .agg(max(col("is_cache")).as("any_cache"))
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getInt(2)) -> r.getBoolean(3))
        .toMap
      winners.forall { w =>
        val key = (w.getString(0), w.getTimestamp(1), w.getInt(2))
        !cacheByKey(key) || w.getBoolean(3)
      }
    }, minSuccessful = 10)
  }

  test("property: explode/rollup counts reconcile (gold_coverage_audit invariant)") {
    val roundGen = for {
      nLocs <- Gen.choose(1, 6)
      padded <- Gen.choose(0, 2)
    } yield (nLocs, padded)
    check(Prop.forAll(Gen.nonEmptyListOf(roundGen)) { rounds =>
      // build a silver-shaped frame: each round contributes nLocs real +
      // padded padding rows
      val rows = rounds.zipWithIndex.flatMap { case ((nLocs, padded), i) =>
        (0 until nLocs).map(j =>
          ("c", s"r$i", j, false, Some(j + 1), Timestampish(i, j))) ++
          (0 until padded).map(j =>
            ("c", s"r$i", nLocs + j, true, None: Option[Int], Timestampish(i, nLocs + j)))
      }
      val silver = rows.toDF(
        "course_id", "round_id", "location_index", "is_location_padding",
        "hole_number", "ts_s")
        .withColumn("fix_timestamp", col("ts_s").cast("timestamp"))
        .withColumn("is_timestamp_missing", col("fix_timestamp").isNull)
        .withColumn("section_number", col("hole_number"))
        .withColumn("nine_number", lit(1))
        .withColumn("hole_section", lit(1))
        .withColumn("pace", lit(null).cast("double"))
        .withColumn("pace_gap", lit(null).cast("double"))
        .withColumn("positional_gap", lit(null).cast("double"))
        .withColumn("battery_percentage", lit(null).cast("double"))
        .withColumn("is_cache", lit(false))
        .withColumn("is_projected", lit(false))
        .withColumn("is_problem", lit(false))
        .withColumn("start_hole", lit(1))
        .withColumn("start_section", lit(1))
        .withColumn("end_section", lit(1))
        .withColumn("is_nine_hole", lit(false))
        .withColumn("is_complete", lit(true))
      val fr = GoldModels.factRounds(silver)
      val sumFix = fr.agg(sum(col("fix_count"))).collect()(0).getLong(0)
      val nonPadding = silver.filter(!col("is_location_padding")).count()
      sumFix == nonPadding && fr.count() == rounds.size
    }, minSuccessful = 10)
  }

  private def Timestampish(i: Int, j: Int): Long =
    1705312800L + i * 3600L + j * 60L

  test("property: minhash signature agreement is symmetric and bounded by 1") {
    val textGen = Gen.nonEmptyListOf(
      Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
      .map(_.mkString(" "))
    check(Prop.forAll(textGen, textGen) { (ta, tb) =>
      val sigs = Seq((1L, ta), (2L, tb)).toDF("id", "text")
        .select(Dedup.minHashSignature(col("text"), 1, 32).as("sig"))
        .collect().map(_.getSeq[Long](0))
      val agree = sigs(0).zip(sigs(1)).count { case (a, b) => a == b }
      agree >= 0 && agree <= 32 && (ta != tb || agree == 32)
    }, minSuccessful = 10)
  }

  /** Random event streams: (user, epochSec, eventId). */
  private val eventsGen: Gen[List[(Long, Long, Long)]] =
    Gen.nonEmptyListOf(for {
      user <- Gen.choose(1L, 3L)
      sec <- Gen.choose(0L, 10000L)
    } yield (user, sec)).map(_.zipWithIndex.map {
      case ((u, s), i) => (u, s, i.toLong)
    })

  test("property: sessionize partitions events exactly, gaps split iff > gapSec") {
    val gap = 600L
    check(Prop.forAll(eventsGen) { evs =>
      val df = evs.toDF("user_id", "sec", "event_id")
        .withColumn("ts", timestamp_seconds(col("sec")))
      val withIds = graft.analytics.Sessions
        .withSessionId(df, "user_id", "ts", "event_id", gap)
        .select("user_id", "sec", "session_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // every event keeps exactly one session id
      val exact = withIds.length == evs.length
      // within a user: consecutive events (time order) share a session
      // iff the gap is <= gapSec; session ids are dense from 0
      val perUser = withIds.groupBy(_._1).values.forall { rows =>
        val sorted = rows.sortBy(r => (r._2, r._3))
        val splitsOk = sorted.zip(sorted.tail).forall { case (a, b) =>
          if (b._2 - a._2 > gap) b._3 == a._3 + 1 else b._3 == a._3
        }
        splitsOk && sorted.head._3 == 0L
      }
      exact && perUser
    }, minSuccessful = 15)
  }

  test("property: asof join matches the brute-force latest-at-or-before") {
    val gen = for {
      left <- Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 2L), Gen.choose(0L, 100L)))
      right <- Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 2L), Gen.choose(0L, 100L)))
    } yield (left.zipWithIndex.map { case ((k, s), i) => (k, s, i.toLong) },
      right.zipWithIndex.map { case ((k, s), i) => (k, s, i.toLong + 1000L) })
    check(Prop.forAll(gen) { case (l, r) =>
      val left = l.toDF("k", "sec", "lid").withColumn("ts", timestamp_seconds(col("sec")))
      val right = r.toDF("k", "sec", "rid").withColumn("ts", timestamp_seconds(col("sec")))
        .drop("sec")
      val out = graft.core.AsOfJoin
        .asof(left, right, Seq("k"), "ts", Seq("rid"), rightTieCol = Some("rid"))
        .select("lid", "rid")
        .collect().map(row => (row.getLong(0),
          if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
      l.forall { case (k, s, lid) =>
        val expected = r.filter(rr => rr._1 == k && rr._2 <= s)
          .sortBy(rr => (rr._2, rr._3)).lastOption.map(_._3)
        out(lid) == expected
      }
    }, minSuccessful = 15)
  }

  test("property: top_k_structs equals sort-take on the collected group") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 9L)))
    check(Prop.forAll(gen) { xs =>
      val rows = xs.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      val agg = rows.toDF("g", "v", "id").repartition(5)
        .groupBy(col("g"))
        .agg(graft.functions.F.topKStructs(struct(col("v"), col("id")), 3).as("top"))
        .select(col("g"), col("top"))
        .collect().map { row =>
          row.getLong(0) -> row.getSeq[org.apache.spark.sql.Row](1)
            .map(s => (s.getLong(0), s.getLong(1)))
        }.toMap
      rows.groupBy(_._1).forall { case (g, grp) =>
        val expected = grp.map(t => (t._2, t._3)).sorted.reverse.take(3)
        agg(g) == expected
      }
    }, minSuccessful = 15)
  }

  test("property: BPE merges are lossless for any word and any merge list") {
    val wordGen = Gen.nonEmptyListOf(
      Gen.oneOf(('a' to 'e') ++ Seq('ü', 'é', 'ß'))).map(_.mkString)
    val mergesGen = Gen.listOf(Gen.zip(
      Gen.oneOf("a", "b", "c", "ab", "bc", "é"),
      Gen.oneOf("a", "b", "c", "ab", "bc", "é")))
    check(Prop.forAll(wordGen, mergesGen) { (word, merges) =>
      val ranks = merges.distinct.zipWithIndex.toMap
      val pieces = graft.llm.TextAnalysis.applyBpeMerges(word, ranks)
      pieces.mkString("") == word && pieces.forall(_.nonEmpty)
    }, minSuccessful = 60)
  }

  test("property: shardShuffle is a permutation with dense per-shard ranks") {
    val idsGen = Gen.nonEmptyListOf(Gen.choose(0L, 10000L)).map(_.distinct)
    check(Prop.forAll(idsGen) { ids =>
      val out = graft.llm.Curation.shardShuffle(
        ids.map(Tuple1(_)).toDF("id"), "id", nShards = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      out.map(_._1).toSet == ids.toSet &&
        out.groupBy(_._2).values.forall { rows =>
          rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq
        }
    }, minSuccessful = 10)
  }

  test("property: canonicalizeUrl is idempotent and param-order invariant") {
    val paramGen = Gen.listOf(Gen.oneOf("a=1", "b=2", "c=3", "utm_x=9"))
    check(Prop.forAll(paramGen) { params =>
      def url(ps: Seq[String]) =
        "https://Example.com/path" +
          (if (ps.isEmpty) "" else ps.mkString("?", "&", ""))
      val in = Seq(
        Tuple1(url(params)), Tuple1(url(params.reverse))).toDF("u")
      val out = in.select(graft.llm.Curation.canonicalizeUrl(col("u")))
        .collect().map(_.getString(0))
      // order-invariant and idempotent
      val again = Seq(Tuple1(out(0))).toDF("u")
        .select(graft.llm.Curation.canonicalizeUrl(col("u")))
        .collect()(0).getString(0)
      out(0) == out(1) && again == out(0)
    }, minSuccessful = 10)
  }

  test("property: resampleToBalance conserves ids, bounds copies, epochs dense") {
    val corpusGen = Gen.nonEmptyListOf(for {
      dom <- Gen.oneOf("a", "b", "c")
      n <- Gen.choose(1, 6)
    } yield (dom, n))
    check(Prop.forAll(corpusGen) { rows =>
      val df = rows.zipWithIndex.map { case ((dom, n), i) =>
        (i.toLong, dom, Seq.fill(n)("w").mkString(" "))
      }.toDF("id", "source", "text")
      val out = graft.llm.Curation
        .resampleToBalance(df, "id", "source", "text")
        .collect().map(r => (r.getLong(1), r.getInt(3)))
      val ids = rows.indices.map(_.toLong).toSet
      // only input ids appear; copies bounded by the epoch cap; epoch
      // numbers are dense 1..copies per id
      out.forall(o => ids.contains(o._1)) &&
        out.groupBy(_._1).values.forall { rs =>
          rs.length <= 4 && rs.map(_._2).sorted.toSeq == (1 to rs.length)
        }
    }, minSuccessful = 10)
  }

  test("property: two-pass quantiles equal the sorted element for any data") {
    val dataGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.choose(-100.0, 100.0),
      Gen.oneOf(0.0, 1.0, -1.0, 42.0))) // duplicate mass mixed in
    val pGen = Gen.nonEmptyListOf(Gen.oneOf(0.01, 0.1, 0.5, 0.9, 0.999, 1.0))
    check(Prop.forAll(dataGen, pGen) { (values, ps0) =>
      val ps = ps0.distinct
      val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val out = graft.analytics.Quantiles
        .exactQuantiles2Pass(df, "v", ps, accuracy = 500)
        .collect().map(r => r.getDouble(0) ->
          (r.getDouble(3), r.getBoolean(4))).toMap
      val sorted = values.sorted
      ps.forall { p =>
        val k = math.max(1L, math.ceil(p * values.size).toLong)
        val (v, bracketed) = out(p)
        bracketed && v == sorted((k - 1).toInt)
      }
    }, minSuccessful = 10)
  }

  test("property: perplexity buckets are value-consistent for any corpus") {
    val textGen = Gen.nonEmptyListOf(
      Gen.oneOf("alpha", "beta", "gamma", "delta")).map(_.mkString(" "))
    check(Prop.forAll(Gen.nonEmptyListOf(textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rows = graft.llm.TextAnalysis
        .perplexityBuckets(df, "doc_id", "text")
        .collect()
      // r8 contract: every input doc gets a row; docs without a bigram
      // signal (<2 tokens) carry NULL fluency and bucket as 'tail'
      val (unscored, scored) = rows.partition(_.isNullAt(1))
      val out = scored.map(r => (r.getDouble(1), r.getString(2)))
      def sc(b: String) = out.filter(_._2 == b).map(_._1)
      rows.length == texts.length &&
      unscored.forall(_.getString(2) == "tail") &&
      // every bucket boundary respects the fluency ordering: head
      // strictly outscores middle, middle strictly outscores tail
      (sc("head").isEmpty || sc("middle").isEmpty ||
        sc("head").min > sc("middle").max) &&
      (sc("middle").isEmpty || sc("tail").isEmpty ||
        sc("middle").min > sc("tail").max) &&
      (sc("head").isEmpty || sc("tail").isEmpty ||
        sc("head").min > sc("tail").max)
    }, minSuccessful = 10)
  }
}
