package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Invariants of concat-and-chunk sequence packing: every token covered
  * exactly once, sequences exactly full (except each bucket's tail),
  * assignment deterministic under repartitioning. */
class PackingSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents").persist()
  private val seqLen = 64
  private val nBuckets = 4

  test("pieces cover each document's tokens exactly once") {
    val spans = Packing.withSequenceSpans(docs, "doc_id", "text", seqLen, nBuckets)
      .select("id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pieceSums = Packing.packedPieces(docs, "doc_id", "text", seqLen, nBuckets)
      .groupBy("id").agg(
        sum("piece_len").as("covered"),
        min("doc_tok_start").as("first_start"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(pieceSums.keySet === spans.keySet)
    pieceSums.foreach { case (id, (covered, firstStart)) =>
      assert(covered === spans(id), s"doc $id covered $covered of ${spans(id)}")
      assert(firstStart === 0L)
    }
  }

  test("every sequence is exactly full except each bucket's tail") {
    val pieces = Packing.packedPieces(docs, "doc_id", "text", seqLen, nBuckets).persist()
    val lastSeq = pieces.groupBy("bucket").agg(max("seq_id").as("tail_seq"))
    val perSeq = pieces.groupBy("bucket", "seq_id")
      .agg(sum("piece_len").as("filled"), min("seq_tok_start").as("start"))
      .join(lastSeq, "bucket").collect()
    assert(perSeq.nonEmpty)
    perSeq.foreach { r =>
      val (bucket, seqId, filled, start, tail) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(start === 0L, s"sequence ($bucket,$seqId) starts at $start")
      if (seqId < tail)
        assert(filled === seqLen.toLong, s"sequence ($bucket,$seqId) holds $filled")
      else
        assert(filled <= seqLen.toLong && filled > 0L)
    }
    // within a sequence, pieces tile contiguously: ordered by start, each
    // piece begins where the previous one ended
    val tiled = pieces.orderBy("bucket", "seq_id", "seq_tok_start")
      .select("bucket", "seq_id", "seq_tok_start", "piece_len").collect()
    tiled.sliding(2).foreach {
      case Array(a, b)
          if a.getInt(0) == b.getInt(0) && a.getLong(1) == b.getLong(1) =>
        assert(b.getLong(2) === a.getLong(2) + a.getLong(3),
          s"gap/overlap inside sequence (${a.getInt(0)},${a.getLong(1)})")
      case _ =>
    }
    pieces.unpersist()
  }

  test("empty and whitespace-only docs occupy no span (no phantom tokens)") {
    import spark.implicits._
    val df = Seq(
      (0L, "alpha beta gamma"),
      (8L, ""),            // same bucket as 0 with nBuckets=8
      (16L, "   \n\t "),   // whitespace-only, same bucket
      (24L, "delta epsilon")
    ).toDF("doc_id", "text")
    val spans = Packing.withSequenceSpans(df, "doc_id", "text",
      seqLen = 4, nBuckets = 8).orderBy("id").collect()
    assert(spans.map(_.getLong(0)).toSeq === Seq(0L, 24L),
      "zero-token docs must not emit spans")
    // and the empty docs must not have shifted doc 24's offset
    assert(spans(1).getAs[Long]("offset") === 3L)
  }

  test("assignment is invariant to input partitioning") {
    val a = Packing.withSequenceSpans(docs, "doc_id", "text", seqLen, nBuckets)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val b = Packing.withSequenceSpans(
        docs.repartition(7, col("source")), "doc_id", "text", seqLen, nBuckets)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(a === b)
  }
}
