package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a `TypedImperativeAggregate`.
  *
  * A k-counter frequency sketch over a string column: after one pass, every
  * item with true count > N/(k+1) is GUARANTEED to be among the ≤ k surviving
  * counters (Misra & Gries 1982), and the summaries are mergeable with the
  * same guarantee (Agarwal et al., PODS'12 — merge = counter-wise add, then
  * subtract the (k+1)-th largest weight and drop non-positive counters).
  *
  * Scale shape: per-partition state is O(k) regardless of row count, partial
  * → merge like any Spark aggregate, and the shuffle carries one ≤ k-entry
  * summary per partition instead of the full token distribution — the
  * standard first stage for "top talkers" over 100 TB where an exact
  * group-count of every key would be the dominant shuffle.
  *
  * Determinism note: which NON-guaranteed (borderline) items survive depends
  * on merge order, so queries must never emit the raw candidate set as a
  * result. The oracle-checkable contract is the guarantee itself: every item
  * with exact count > N/(k+1) is present (see q107).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"misra_gries requires k >= 1, got $k")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return b
    val key = v.asInstanceOf[UTF8String].toString
    b.get(key) match {
      case Some(c) => b.update(key, c + 1)
      case None =>
        if (b.size < k) b.update(key, 1L)
        else decrementAll(b, 1L)
    }
    b
  }

  /** Subtract `w` from every counter, dropping those that hit ≤ 0 — the
    * classic O(k) step; amortized O(1) per input over any stream.
    */
  private def decrementAll(b: mutable.HashMap[String, Long], w: Long): Unit = {
    val dead = b.iterator.filter(_._2 <= w).map(_._1).toList
    b.mapValuesInPlace((_, c) => c - w)
    dead.foreach(b.remove)
  }

  override def merge(a: mutable.HashMap[String, Long], c: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    c.foreach { case (key, cnt) => a.update(key, a.getOrElse(key, 0L) + cnt) }
    if (a.size > k) {
      // subtract the (k+1)-th largest counter value; ≤ k entries survive and
      // every counter keeps its error bound ≤ N/(k+1)
      val w = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      decrementAll(a, w)
    }
    a
  }

  /** Candidate items sorted lexicographically — stable presentation, but the
    * SET may include order-dependent borderline items; treat as superset of
    * the guaranteed heavy hitters, never as the answer itself.
    */
  override def eval(b: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      b.keysIterator.toArray.sorted.map(UTF8String.fromString(_): Any))

  // Keys serialize as int byte-length + raw UTF-8, NOT writeUTF: writeUTF
  // throws UTFDataFormatException past 65535 encoded bytes, and a tracked
  // item can be a whole document, not just a token.
  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (key, c) =>
      val kb = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      b.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    b
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "misra_gries"
}

object MisraGries {
  /** Column API: ≤ k candidate heavy hitters of a string column (superset of
    * every item with count > N/(k+1)).
    */
  def candidates(item: Column, k: Int): Column =
    GraftColumnBridge.column(
      MisraGriesAgg(GraftColumnBridge.expression(item), k).toAggregateExpression())
}
