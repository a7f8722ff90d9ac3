package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Group-wise top-k as a real AGGREGATE — the operator Spark lacks.
  *
  * The standard formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * s DESC) <= k`) shuffles EVERY row of the group to one task and sorts
  * it; at 100 TB a hot group is a straggler by construction. This
  * aggregate keeps a bounded min-heap of k rows per group per partition,
  * so partial aggregation combines map-side and only k rows per
  * (group, partition) ever cross the wire — the same asymptotic win
  * TakeOrderedAndProject gives the global top-k, applied per group.
  *
  * Input is a STRUCT column; rows are compared lexicographically over
  * ALL struct fields (natural per-type ordering), so including a unique
  * tie-break field makes the result fully deterministic. Returns the k
  * largest structs in descending order.
  *
  * TypedImperativeAggregate = ObjectHashAggregate at execution: heap
  * objects live per group, serialized as UnsafeRow bytes between
  * partial and final phases.
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val ordering: Ordering[InternalRow] =
    RowOrdering.createNaturalAscendingOrdering(structType.map(_.dataType).toSeq)

  @transient private lazy val serializer: UnsafeProjection =
    UnsafeProjection.create(structType)

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](k + 1, ordering)

  private def insert(
      heap: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit = {
    if (heap.size < k) { heap.offer(row); () }
    else if (ordering.compare(row, heap.peek()) > 0) {
      heap.poll(); heap.offer(row); ()
    }
  }

  override def update(
      heap: java.util.PriorityQueue[InternalRow],
      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    // rows arriving here can point into shared scan buffers — copy before retaining
    if (v != null) insert(heap, v.asInstanceOf[InternalRow].copy())
    heap
  }

  override def merge(
      a: java.util.PriorityQueue[InternalRow],
      b: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(heap: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = new Array[InternalRow](heap.size)
    var i = 0
    val it = heap.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr, ordering.reverse)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(heap: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) {
      val bytes = serializer.apply(it.next()).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val heap = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val row = new UnsafeRow(structType.length)
      row.pointTo(buf, len)
      heap.offer(row)
      i += 1
    }
    heap
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_structs"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKStructs =
    copy(child = newChild)
}
