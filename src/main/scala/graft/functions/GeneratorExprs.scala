package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst Generator (UDTF surface — SURVEY §2.11's
  * `Generator`/unnesting family): explodes a token array into one row per
  * 3-gram shingle, `(pos, shingle_hash)`, computing the hash in the SAME
  * kernel pass as the fan-out. The compose-built alternative
  * (`posexplode(shingle_hashes(tokens))`) materializes the full hash array
  * per row before exploding; this generator streams rows out of one
  * computation — the pattern for generators whose output is large relative
  * to their input (frame extraction, shingling long documents at 100 TB).
  *
  * Completes the custom-expression taxonomy next to the scalar kernels
  * (TextHashExprs, VectorExprs) and the TypedImperativeAggregate
  * (ChannelStats): scalar / aggregate / generator.
  */
case class ShingleExplodeExpr(child: Expression)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("shingle", LongType, nullable = false)

  // rows are emitted directly (not via an inline array/map collection)
  override def collectionType: DataType = ArrayType(elementSchema)
  override val inline: Boolean = false
  override def position: Boolean = false

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val sh = TextHashExprs.shingleHashesData(v.asInstanceOf[ArrayData])
    (0 until sh.numElements()).iterator.map { i =>
      InternalRow(i, sh.getLong(i))
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "shingle_explode"
}
