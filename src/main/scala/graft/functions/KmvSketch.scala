package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct sketch as a Dataset-typed
  * [[org.apache.spark.sql.expressions.Aggregator]].
  *
  * The sketch: keep the k smallest DISTINCT hash values seen; if the k-th
  * smallest is h_k over a hash space of size P, the distinct count is
  * estimated by (k−1)·P / h_k (Bar-Yossef et al. 2002's KMV estimator).
  * Mergeable by construction — the union's k minima are among the two
  * sides' k minima — so map-side partial aggregation forwards at most k
  * longs per group and the exchange never carries raw rows: the same
  * O(groups·k) scale posture as [[TopK]].
  *
  * Why this API (vs [[TopK]]'s Catalyst `TypedImperativeAggregate`): the
  * typed `Aggregator` + `functions.udaf` pair is Spark's PUBLIC stable
  * surface for user-defined aggregates — the path a library user extends
  * without touching catalyst internals. The engine carries one of each so
  * both extension points stay exercised.
  *
  * Determinism: the output is the SET of k smallest distinct longs — a
  * pure function of the input set, independent of partitioning and merge
  * order — emitted ascending. This aggregator is therefore oracle-exact
  * (the estimate it implies is a deterministic function of the data), even
  * though the estimate it yields is approximate.
  */
object KmvSketch {

  /** Sorted-ascending bounded buffer of distinct minima. */
  class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.empty[Long]

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) return buf // already present
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var n = 0
      var last = Long.MinValue
      var first = true
      while (n < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) a(i)
          else b(j)
        // advance whichever side(s) hold v, dedup across sides
        if (i < a.length && a(i) == v) i += 1
        if (j < b.length && b(j) == v) j += 1
        if (first || v != last) { out(n) = v; n += 1; last = v; first = false }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Column form: kmv(k)(hashCol) → array<long> of the k smallest
    * distinct hashes, ascending.
    */
  def kmv(k: Int): Column => Column = {
    val f = udaf(new KmvAgg(k))
    (c: Column) => f(c)
  }
}
