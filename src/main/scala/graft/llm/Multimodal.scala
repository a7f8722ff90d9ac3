package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: images/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The Spark-side plumbing is real — schema, partition-preserving
  * `mapPartitions` (the Scala analogue of `mapInPandas`: one iterator
  * per partition, batch-shaped, no driver collection), explode-based
  * frame sampling. The actual codec call is STUBBED (`decodeStub`) —
  * image/audio libraries aren't in this container — behind a seam where
  * a JNI/FFM codec would plug in; the stub is deterministic so the
  * pipeline is testable end-to-end.
  */
object Multimodal {

  /** Canonical multimodal record schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Wrap a text table into media rows (test/bench harness: the text
    * bytes stand in for an encoded payload). Deterministic modality and
    * metadata derived from the id/byte length. */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast(IntegerType)).as("modality"),
      col(textCol).cast(BinaryType).as("content"),
      struct(
        lit("stub").as("format"),
        (col(idCol) % 640 + 1).cast(IntegerType).as("width"),
        (col(idCol) % 480 + 1).cast(IntegerType).as("height"),
        (length(col(textCol)) * 40L).as("duration_ms")).as("meta"))

  /** Decoded-feature schema appended by [[decodeStub]]. */
  val decodedSchema: StructType = mediaSchema
    .add(StructField("n_bytes", IntegerType))
    .add(StructField("checksum", LongType))
    .add(StructField("features", ArrayType(FloatType)))

  /** STUB decode + feature extraction. A real implementation would call
    * an image/audio codec here (per partition, reusing a decoder
    * instance); this stub derives an 8-dim feature from the payload bytes
    * deterministically. The `mapPartitions` shape — iterator in, iterator
    * out, decoder state reused across the partition — is exactly what the
    * real codec integration needs.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(decodedSchema))
    media.mapPartitions { rows =>
      // Per-partition "decoder" setup would go here (load codec once).
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val n = if (bytes == null) 0 else bytes.length
        var checksum = 1469598103934665603L // FNV-1a
        var i = 0
        while (i < n) {
          checksum = (checksum ^ (bytes(i) & 0xffL)) * 1099511628211L
          i += 1
        }
        val features = Array.tabulate(8) { j =>
          // ??? real codec: decode + model forward pass. Deterministic fake:
          ((checksum >>> (j * 8)) & 0xffL).toFloat / 255.0f
        }
        Row.fromSeq(r.toSeq ++ Seq(n, checksum, features.toSeq))
      }
    }(enc)
  }

  /** One decoded record: payload size, content checksum, feature vector.
    * What a real codec + model forward pass would emit per item. */
  final case class Decoded(nBytes: Int, checksum: Long, features: Array[Float])

  /** The batched-decode contract. A real implementation wraps a codec /
    * model session: `open()` once per partition (load the model, pin the
    * device), `decode(batch)` once per `batchSize` items (ONE vectorized
    * dispatch for the whole batch — the entire point of batching on a
    * GPU), `close()` when the partition ends. Implementations must be
    * Serializable-constructible on executors; ship a factory, not a live
    * decoder. */
  trait BatchDecoder extends Serializable {
    def open(): Unit = ()
    /** Must return exactly one Decoded per input, in order. */
    def decode(contents: Array[Array[Byte]]): Array[Decoded]
    def close(): Unit = ()
  }

  /** Deterministic stub decoder: same FNV-1a + byte-slice features as
    * [[decodeStub]], so the batched path is value-identical to the
    * per-row path and fully testable without codec libraries. */
  final class StubBatchDecoder extends BatchDecoder {
    override def decode(contents: Array[Array[Byte]]): Array[Decoded] =
      contents.map { bytes =>
        val n = if (bytes == null) 0 else bytes.length
        var checksum = 1469598103934665603L // FNV-1a
        var i = 0
        while (i < n) {
          checksum = (checksum ^ (bytes(i) & 0xffL)) * 1099511628211L
          i += 1
        }
        Decoded(n, checksum, Array.tabulate(8) { j =>
          ((checksum >>> (j * 8)) & 0xffL).toFloat / 255.0f
        })
      }
  }

  /** Batched decode: each partition's rows are grouped into batches of
    * `batchSize` and handed to the decoder as ONE call — the Scala
    * analogue of `mapInPandas`' Arrow-batch contract, which is what a
    * vectorized/GPU codec needs (per-row dispatch would serialize the
    * device). The decoder lifecycle is per-partition: open → decode ×
    * ceil(rows/batchSize) → close (close fires when the partition
    * iterator drains, including the empty-partition case). Output is
    * row-identical to [[decodeStub]] under the stub decoder. */
  def decodeBatched(
      media: DataFrame,
      batchSize: Int = 64,
      decoderFactory: () => BatchDecoder = () => new StubBatchDecoder): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val enc = ExpressionEncoder(RowEncoder.encoderFor(decodedSchema))
    media.mapPartitions { rows =>
      val decoder = decoderFactory()
      decoder.open()
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; decoder.close() }
      // the iterator-drain close below never fires when the consumer
      // stops early (limit/take) or decode() throws — the task
      // completion listener is the backstop that keeps a real codec /
      // GPU session from leaking for the executor's lifetime
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      val decodedRows = rows.grouped(batchSize).flatMap { batch =>
        val out = decoder.decode(batch.map(_.getAs[Array[Byte]]("content")).toArray)
        require(out.length == batch.length,
          s"decoder returned ${out.length} results for ${batch.length} inputs")
        batch.iterator.zip(out.iterator).map { case (r, d) =>
          Row.fromSeq(r.toSeq ++ Seq(d.nBytes, d.checksum, d.features.toSeq))
        }
      }
      new Iterator[Row] {
        override def hasNext: Boolean = {
          val h = decodedRows.hasNext
          if (!h) closeOnce()
          h
        }
        override def next(): Row = decodedRows.next()
      }
    }(enc)
  }

  /** Frame sampling for video rows: one output row per sampled frame at
    * `frameIntervalMs` — pure explode, fully parallel. Non-video rows
    * pass through with frame_idx 0. */
  def sampleFrames(media: DataFrame, frameIntervalMs: Long): DataFrame = {
    val nFrames = greatest(
      (col("meta.duration_ms") / frameIntervalMs).cast(IntegerType), lit(1))
    media.withColumn(
        "frame_idx",
        explode(when(col("modality") === "video", sequence(lit(0), nFrames - 1))
          .otherwise(array(lit(0)))))
      .withColumn("frame_ts_ms", col("frame_idx") * frameIntervalMs)
  }

  /** Image resize STUB: rewrites metadata (and would rewrite payload in a
    * real codec), preserving everything else. */
  def resizeStub(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim.toDouble) / col("meta.width"),
      lit(maxDim.toDouble) / col("meta.height"),
      lit(1.0))
    media.withColumn("meta", struct(
      col("meta.format").as("format"),
      floor(col("meta.width") * scale).cast(IntegerType).as("width"),
      floor(col("meta.height") * scale).cast(IntegerType).as("height"),
      col("meta.duration_ms").as("duration_ms")))
  }
}
