package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Probe-side test of a pre-built Bloom filter — the expression half of
  * [[graft.operators.BloomPrefilter]]'s semi-join prefilter (the explicit
  * counterpart of Spark's auto-injected runtime `bloom_filter_might_contain`:
  * same idea, but user-controlled, so it works where the optimizer's
  * injection heuristics don't reach — e.g. a filter built in a previous job,
  * or thresholds tuned per pipeline).
  *
  * The serialized filter travels as plain bytes inside the expression (one
  * copy per task via the plan broadcast, NOT per row), is deserialized once
  * lazily per executor, and is consulted through a codegen'd primitive call.
  * False positives are fine (the real join follows); false negatives cannot
  * happen (Bloom guarantee), so prefilter→join equals the plain join.
  */
object BloomExprs {

  /** Deserialize once per (de)serialized expression instance, not per row. */
  def readBloom(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** bloom_might_contain(bytes, key): true iff `key` may be in the filter.
    * Key must be LONG — the builder casts; the build side puts `putLong`,
    * so both sides hash identically.
    */
  case class BloomMightContainExpr(bytes: Array[Byte], child: Expression)
      extends UnaryExpression with Predicate {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a BIGINT key, got ${other.catalogString}")
    }

    @transient private lazy val bloom: BloomFilter = readBloom(bytes)

    override def nullSafeEval(v: Any): Any =
      bloom.mightContainLong(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // the deserialized filter rides the generated-code reference array
      // (BloomFilterImpl is Serializable), so the hot loop is one virtual call
      val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "bloom_might_contain"
    // default case-class toString would print the raw byte array reference
    override def toString: String = s"bloom_might_contain(<${bytes.length}B>, $child)"
    override def sql: String = s"bloom_might_contain(<${bytes.length}B>, ${child.sql})"
  }
}
