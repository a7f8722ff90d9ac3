package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a mergeable AGGREGATE — the
  * 100 TB form of "which tokens dominate the corpus".
  *
  * The exact formulation (`GROUP BY token` over the exploded token
  * stream) shuffles one row PER DISTINCT TOKEN PER PARTITION; on a
  * web-scale corpus the vocabulary tail is billions of keys and the
  * shuffle is the job. This aggregate keeps a bounded `capacity`-entry
  * summary per partition, partial-combines map-side (mergeable
  * summaries, Agarwal et al., PODS'12), and ships ≤ `capacity` rows per
  * partition.
  *
  * Guarantee (what makes the sketch USABLE as a prefilter): an
  * estimate undercounts its true frequency by at most n/(capacity+1),
  * so every token with true frequency > n/(capacity+1) SURVIVES in the
  * summary. The deterministic pattern is therefore: sketch → exact
  * recount of the ≤ capacity candidates (a broadcast semi-join, tiny)
  * → filter on the true counts — exact output, sketch-bounded cost,
  * the same candidates-then-verify shape as the Bloom decontamination
  * path.
  *
  * Returns array<struct<token, est>> sorted by estimate DESC, token ASC
  * (deterministic); `est` is the (under-counting) sketch estimate, not
  * the true frequency.
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"heavy_hitters needs capacity >= 1, got $capacity")

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long](capacity * 2)

  /** Classic MG step: count if tracked or roomy, else decrement ALL
    * (amortized O(1) — each decrement pass pays for `capacity` prior
    * increments). */
  private def offer(buf: java.util.HashMap[UTF8String, Long],
      t: UTF8String): Unit = {
    // NOTE: values box to java.lang.Long under erasure — always guard
    // with containsKey, a bare get(absent) would NPE on unboxing
    if (buf.containsKey(t)) { buf.put(t, buf.get(t) + 1L); () }
    else if (buf.size < capacity) { buf.put(t.clone(), 1L); () }
    else {
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  override def update(
      buf: java.util.HashMap[UTF8String, Long],
      input: InternalRow): java.util.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String])
    buf
  }

  /** Mergeable-summaries merge: sum counts, then cut back to `capacity`
    * entries by subtracting the (capacity+1)-th largest count from all
    * (the multi-set generalization of MG's decrement). */
  override def merge(
      a: java.util.HashMap[UTF8String, Long],
      b: java.util.HashMap[UTF8String, Long]): java.util.HashMap[UTF8String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = if (a.containsKey(e.getKey)) a.get(e.getKey) else 0L
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > capacity) {
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(a.size - capacity - 1) // (capacity+1)-th largest
      val eit = a.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[UTF8String, Long]): Any = {
    val entries = new Array[(UTF8String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = entries.sorted(Ordering.fromLessThan[(UTF8String, Long)] {
      (x, y) => x._2 > y._2 || (x._2 == y._2 && x._1.compareTo(y._1) < 0)
    })
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(t, c): Any
    })
  }

  override def serialize(buf: java.util.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val tb = new Array[Byte](len)
      in.readFully(tb)
      buf.put(UTF8String.fromBytes(tb), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}
