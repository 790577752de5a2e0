package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a
  * `TypedImperativeAggregate` — the point-query twin of the Misra-Gries
  * top-talkers sketch ([[MisraGriesAgg]]): `depth` hash rows × `width`
  * counters; an item's estimate is the MIN of its `depth` cells.
  *
  * Scale shape: O(depth·width) state per partition regardless of row count;
  * partial → merge is elementwise integer add, so the shuffle carries one
  * fixed-size matrix per partition instead of the full key distribution —
  * the standard sketch for "how frequent is THIS item" over 100 TB when an
  * exact group-count of every key would be the dominant shuffle.
  *
  * Determinism: unlike Misra-Gries (whose borderline candidates are
  * merge-order dependent), the CMS matrix is a SUM of per-row one-hot
  * updates — integer addition commutes, so the sketch and every estimate
  * are bit-identical under any partitioning or merge order. Guarantees:
  * estimate ≥ true count ALWAYS (cells only over-count); the upper bound
  * est ≤ true + ε·N is probabilistic in the paper but fixed once the hash
  * family is fixed, so queries assert it with measured slack (the q54/q96
  * error-bound pattern — see q134).
  *
  * Hashing is the repo's salted multiplicative family ([[Hashes.mulHash]])
  * over a character-fold prehash, expressible BOTH as JVM arithmetic (the
  * aggregate's update path) and as Catalyst columns ([[CountMin.estimate]])
  * — so the probe-side lookup is a plain codegen'd expression, no UDF.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"count_min depth must be in [1,16], got $depth")
  require(width >= 2, s"count_min width must be >= 2, got $width")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return b
    val pre = CountMin.charFold(v.asInstanceOf[UTF8String].toString)
    var i = 0
    while (i < depth) {
      b(i * width + (Hashes.mulHashLong(pre, i) % width).toInt) += 1L
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += c(i); i += 1 }
    a
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(b.length * 8)
    val out = new DataOutputStream(bos)
    b.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(depth * width)(in.readLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "count_min"
}

object CountMin {

  /** JVM prehash: fold `acc·31 + codeUnit` mod P over the string's UTF-16
    * code units — the exact twin of [[strHash]]'s column fold (which splits
    * into code units and takes `ascii` of each). Identical for any BMP text;
    * agreement is what matters, and both sides walk the same units.
    */
  def charFold(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) { acc = (acc * 31L + s.charAt(i).toLong) % Hashes.Prime; i += 1 }
    acc
  }

  /** Column twin of [[charFold]]: `split(s, "")` yields one element per
    * UTF-16 code unit and `ascii` its code point. A per-character HOF —
    * meant for probe relations (a handful of rows), while the corpus-side
    * hashing runs inside the aggregate's JVM loop.
    */
  def strHash(s: Column): Column =
    aggregate(split(s, ""), lit(0L),
      (acc, c) => (acc * 31L + ascii(c).cast("long")) % Hashes.Prime)

  /** Column API: the depth×width counter matrix (row-major array<long>). */
  def sketch(item: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CountMinAgg(GraftColumnBridge.expression(item), depth, width)
        .toAggregateExpression())

  /** Point-query estimate as a pure expression: min over the item's `depth`
    * cells. `sk` is the [[sketch]] array (typically a broadcast 1-row
    * aggregate cross-joined onto the probe relation).
    */
  def estimate(sk: Column, item: Column, depth: Int, width: Int): Column = {
    val pre = strHash(item)
    val cells = (0 until depth).map { i =>
      element_at(sk, (lit(i * width) + Hashes.mulHash(pre, i) % width + 1).cast("int"))
    }
    least(cells: _*)
  }

  /** Driver-side estimate over a collected sketch — for O(1)-sized follow-up
    * checks in tests; bit-identical to [[estimate]].
    */
  def estimateLocal(sk: IndexedSeq[Long], item: String, depth: Int, width: Int): Long = {
    val pre = charFold(item)
    (0 until depth).map(i =>
      sk(i * width + (Hashes.mulHashLong(pre, i) % width).toInt)).min
  }
}
