package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded per-group top-k as a real aggregate — the engine's rendition
  * of the reference's cross-level sort-root optimization
  * (graphd/graphd-sort-root.c:21-29): when a parent only needs each
  * group's k best children, compute the bound WHERE THE DATA IS instead
  * of sorting everything.
  *
  * The window formulation (`row_number().over(partitionBy(parent))`,
  * filter rk<=k) shuffles and sorts EVERY row; this aggregate keeps a
  * k-element heap per group, so the map-side partial phase reduces each
  * partition to at most k rows per group before the exchange — at
  * 100 TB the shuffle carries k·|groups| rows instead of the corpus.
  *
  * Elements are anything struct-shaped; ordering is the element type's
  * natural (lexicographic) order, ASCENDING — encode "price DESC" by
  * negating the field. `eval` returns the k smallest elements sorted
  * ascending, ready for posexplode into (rank-1, element).
  */
case class BoundedTopK(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedTopK.Buffer] {
  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): BoundedTopK.Buffer =
    new BoundedTopK.Buffer(k, ordering)

  override def update(buf: BoundedTopK.Buffer, input: InternalRow): BoundedTopK.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(BoundedTopK.copyVal(v))
    buf
  }

  override def merge(buf: BoundedTopK.Buffer, other: BoundedTopK.Buffer): BoundedTopK.Buffer = {
    other.elems.foreach(buf.insert)
    buf
  }

  override def eval(buf: BoundedTopK.Buffer): Any =
    new GenericArrayData(buf.elems.toArray.sorted(ordering))

  // ---- shuffle wire format: length-prefixed UnsafeRow per element ----
  @transient private lazy val serProj = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val serRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def serialize(buf: BoundedTopK.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.elems.foreach { e =>
      serRow.update(0, e)
      val r = serProj(serRow)
      out.writeInt(r.getSizeInBytes)
      out.write(r.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Buffer = {
    val buf = createAggregationBuffer()
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    while (in.available() > 0) {
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      val row = new UnsafeRow(1)
      row.pointTo(b, n)
      buf.insert(BoundedTopK.copyVal(row.get(0, child.dataType)))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BoundedTopK =
    copy(child = cs.head)
}

object BoundedTopK {
  /** size-capped max-heap: keeps the k SMALLEST elements seen (the
    * heap's max is the current cutoff; anything not below it is
    * rejected in O(1))
    */
  final class Buffer(k: Int, ord: Ordering[Any]) {
    private val heap = new java.util.PriorityQueue[Any](k + 1, ord.reverse)
    def insert(v: Any): Unit =
      if (heap.size < k) heap.add(v)
      else if (ord.lt(v, heap.peek())) { heap.poll(); heap.add(v) }
    def elems: Iterator[Any] = {
      import scala.jdk.CollectionConverters._
      heap.iterator().asScala
    }
  }

  private[functions] def copyVal(v: Any): Any = v match {
    case r: InternalRow => r.copy()
    case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
    case a: ArrayData => a.copy()
    case x => x
  }
}
