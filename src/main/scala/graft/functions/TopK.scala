package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Exact top-k-per-group as a bounded-heap `TypedImperativeAggregate`.
  *
  * The scalable replacement for the `row_number() OVER (PARTITION BY g ORDER
  * BY ord DESC) <= k` window: the window formulation shuffles and SORTS every
  * row of every group, while this aggregate keeps a k-entry min-heap per
  * group with map-side partials — each partition's hash aggregate forwards at
  * most k entries per group, so the exchange carries O(groups · k) rows
  * instead of the whole relation, and nothing is ever fully sorted. At 100 TB
  * that is the difference between a rank window over the corpus and a
  * k-row-per-group shuffle (see q186; q64/q59 keep the window formulation for
  * the cases that need ALL ranks).
  *
  * Exactness: entries are (ord, key) pairs under the TOTAL order
  * "ord DESC, key ASC" with caller-guaranteed unique keys per group, so the
  * top-k SET — and the sorted array [[eval]] emits — is independent of
  * partitioning and merge order; this is an exact operator, not a sketch.
  * Both values are integers (the determinism playbook's integer-units rule);
  * float measures should be quantized before aggregation like everywhere
  * else in this engine.
  */
case class TopKByAgg(
    key: Expression,
    ord: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  require(k >= 1, s"top_k_by requires k >= 1, got $k")

  /** Head of the queue = WORST retained entry (smallest ord; ties → largest
    * key), so a better candidate replaces the head in O(log k).
    */
  private val worstFirst: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1) // smaller ord = worse = larger
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // larger key = worse
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(b: mutable.PriorityQueue[(Long, Long)], e: (Long, Long)): Unit =
    if (b.size < k) b.enqueue(e)
    else if (worstFirst.compare(e, b.head) < 0) { b.dequeue(); b.enqueue(e) }

  override def update(b: mutable.PriorityQueue[(Long, Long)], input: InternalRow)
      : mutable.PriorityQueue[(Long, Long)] = {
    val kv = key.eval(input)
    val ov = ord.eval(input)
    if (kv != null && ov != null)
      offer(b, (ov.asInstanceOf[Long], kv.asInstanceOf[Long]))
    b
  }

  override def merge(a: mutable.PriorityQueue[(Long, Long)],
                     c: mutable.PriorityQueue[(Long, Long)])
      : mutable.PriorityQueue[(Long, Long)] = {
    c.foreach(offer(a, _))
    a
  }

  /** The top-k as array<struct<key, ord>> sorted best-first (ord DESC, key
    * ASC) — element i is rank i+1.
    */
  override def eval(b: mutable.PriorityQueue[(Long, Long)]): Any = {
    // ascending under worstFirst = best first (best entries compare smallest)
    val sorted = b.toArray.sorted(worstFirst)
    new GenericArrayData(sorted.map { case (o, kk) =>
      new GenericInternalRow(Array[Any](kk, o)): Any
    })
  }

  override def serialize(b: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (o, kk) => out.writeLong(o); out.writeLong(kk) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b.enqueue((in.readLong(), in.readLong())); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(
    new StructType().add("key", LongType, nullable = false)
      .add("ord", LongType, nullable = false),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key, ord)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(key = c(0), ord = c(1))
  override def withNewMutableAggBufferOffset(o: Int): TopKByAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "top_k_by"
}

object TopK {
  /** Column API: exact top-k (key, ord) pairs of the group under
    * "ord DESC, key ASC", as a best-first sorted array. Both columns must be
    * integral (cast/quantize first); keys must be unique within a group for
    * the result to be total-order exact.
    */
  def topKBy(key: Column, ord: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKByAgg(GraftColumnBridge.expression(key),
        GraftColumnBridge.expression(ord), k).toAggregateExpression())
}
