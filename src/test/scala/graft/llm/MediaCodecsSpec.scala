package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pure-JVM PPM/WAV codec correctness: byte-exact roundtrips, reference
  * feature math on non-trivial content, malformed-input behavior, and
  * value-identity of the batched Spark decode path with a local decode. */
class MediaCodecsSpec extends SparkSpec {

  import spark.implicits._

  test("PPM roundtrip is byte-exact and means match a direct computation") {
    // gradient image — non-constant pixels so the mean math is exercised
    val w = 13; val h = 7
    val bytes = MediaCodecs.encodePpm(w, h,
      (x, y) => ((x * 19) % 256, (y * 31) % 256, (x + y) % 256))
    val img = MediaCodecs.decodePpm(bytes)
    assert(img.width === w && img.height === h)
    assert(img.pixel(3, 2) === ((3 * 19) % 256, (2 * 31) % 256, 5))
    val (mr, mg, mb) = img.channelMeans
    val expR = (for (y <- 0 until h; x <- 0 until w) yield (x * 19) % 256).sum.toDouble / (w * h)
    val expG = (for (y <- 0 until h; x <- 0 until w) yield (y * 31) % 256).sum.toDouble / (w * h)
    val expB = (for (y <- 0 until h; x <- 0 until w) yield (x + y) % 256).sum.toDouble / (w * h)
    assert(mr === expR && mg === expG && mb === expB)
  }

  test("PPM header tolerates comments and mixed whitespace") {
    val px = Array.tabulate[Byte](2 * 2 * 3)(i => (i * 11).toByte)
    val header = "P6\n# a comment\n 2\t2 # trailing\n255\n"
    val bytes = header.getBytes("US-ASCII") ++ px
    val img = MediaCodecs.decodePpm(bytes)
    assert(img.width === 2 && img.height === 2)
    assert(img.pixels.toSeq === px.toSeq)
  }

  test("malformed PPM fails fast: wrong magic, truncation, deep maxval") {
    intercept[IllegalArgumentException] {
      MediaCodecs.decodePpm("P5\n2 2\n255\nxxxx".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodePpm("P6\n4 4\n255\nab".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodePpm(
        ("P6\n1 1\n65535\n" + "aaaaaa").getBytes("US-ASCII"))
    }
  }

  test("WAV roundtrip: samples, rate, channels, rms, peak, duration") {
    val samples = Array.tabulate[Short](480)(i => (math.sin(i * 0.1) * 9000).toShort)
    val bytes = MediaCodecs.encodeWavPcm16(16000, 2, samples)
    val wav = MediaCodecs.decodeWav(bytes)
    assert(wav.sampleRate === 16000 && wav.channels === 2)
    assert(wav.samples.toSeq === samples.toSeq)
    assert(wav.nFrames === 240)
    assert(wav.durationMs === 240L * 1000 / 16000)
    val expRms = math.sqrt(samples.map(s => s.toLong * s).sum.toDouble / samples.length)
    assert(wav.rms === expRms)
    assert(wav.peak === samples.map(s => math.abs(s.toInt)).max)
  }

  test("WAV chunk walk skips unknown chunks; malformed WAV fails fast") {
    // hand-build a WAV with a LIST chunk between fmt and data
    val inner = MediaCodecs.encodeWavPcm16(8000, 1, Array[Short](100, -100, 50))
    val fmtAndData = inner.drop(12) // strip RIFF/size/WAVE
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val fmtChunk = fmtAndData.take(24) // "fmt " + 4 size + 16 body
    val dataChunk = fmtAndData.drop(24)
    val body = fmtChunk ++ listChunk ++ dataChunk
    val out = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("WAVE".getBytes("US-ASCII")).put(body)
    val wav = MediaCodecs.decodeWav(out.array())
    assert(wav.samples.toSeq === Seq[Short](100, -100, 50))

    intercept[IllegalArgumentException] {
      MediaCodecs.decodeWav("RIFFxxxxNOPE".getBytes("US-ASCII") ++ new Array[Byte](40))
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeWav(new Array[Byte](10))
    }
  }

  test("CodecBatchDecoder in Spark equals local decode on mixed real media") {
    val rows = (0L until 60L).map { id =>
      val content: Array[Byte] =
        if (id % 2 == 0)
          MediaCodecs.encodePpm((id % 5 + 1).toInt, (id % 4 + 1).toInt,
            (x, y) => ((x * id % 256).toInt, (y * id % 256).toInt, ((x + y + id) % 256).toInt))
        else
          MediaCodecs.encodeWavPcm16(8000, 1,
            Array.tabulate((id % 30 + 5).toInt)(i => ((i * id) % 3000 - 1500).toShort))
      (id, if (id % 2 == 0) "image" else "audio", content)
    }
    val media = rows.toDF("media_id", "modality", "content")
      .select(col("media_id"), col("modality"), col("content"),
        struct(col("modality").as("format"),
          lit(null).cast(IntegerType).as("width"),
          lit(null).cast(IntegerType).as("height"),
          lit(null).cast(LongType).as("duration_ms")).as("meta"))
      .repartition(5) // several partitions → several decoder lifecycles
    val got = Multimodal.decodeBatched(media, batchSize = 7,
        () => new MediaCodecs.CodecBatchDecoder(strict = true))
      .select(col("media_id"), col("features"))
      .as[(Long, Seq[Float])].collect().toMap
    assert(got.size === 60)
    val local = new MediaCodecs.CodecBatchDecoder(strict = true)
    rows.foreach { case (id, _, content) =>
      val exp = local.decode(Array(content))(0)
      assert(got(id) === exp.features.toSeq, s"media $id features diverge")
    }
    // spot-check a known image: id=2 → w=2%5+1=3, h=2%4+1=3
    val f2 = got(2L)
    assert(f2(0) === 3.0f && f2(1) === 3.0f)
  }

  test("strict decoder rejects junk; lenient passes it through featureless") {
    val junk = Array[Byte](1, 2, 3, 4, 5)
    intercept[IllegalArgumentException] {
      new MediaCodecs.CodecBatchDecoder(strict = true).decode(Array(junk))
    }
    val lenient = new MediaCodecs.CodecBatchDecoder().decode(Array(junk))(0)
    assert(lenient.features.isEmpty && lenient.nBytes === 5)
  }
}
