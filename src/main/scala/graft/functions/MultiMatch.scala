package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting via an Aho–Corasick automaton — the
  * blocklist/keyword-tagging kernel of a curation pipeline.
  *
  * Why custom (SURVEY preference order (b)): the relational formulation is a
  * cross join of the corpus against the pattern table with a per-pair scan —
  * K passes over every document (`K · N` string scans), and each `LIKE`/
  * `regexp_count` pass re-reads the text. The automaton matches ALL K
  * patterns in ONE left-to-right pass per document, O(len + matches),
  * independent of K. At 100 TB the pattern list (thousands of blocklist
  * phrases) ships once inside the serialized expression — plan-embedded
  * broadcast, no join, no shuffle; per-doc counts stay row-local.
  *
  * Counting semantics: every occurrence, overlapping included. For patterns
  * with no self-border (no proper prefix that is also a suffix) occurrences
  * cannot overlap each other, and the count equals the non-overlapping count
  * a `replace`-based oracle computes — the q149 contract states its patterns
  * borderless for exactly that reason.
  */
object MultiMatch {

  /** Serializable automaton: built once on the driver, shipped inside the
    * expression, used read-only by every task (thread-safe after build).
    */
  final class Automaton(val patterns: Array[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "patterns must be non-empty")

    // trie over UTF-16 chars: flat parallel arrays, built breadth-first
    private val children = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    private val patternAt = scala.collection.mutable.ArrayBuffer[Int](-1)

    for ((p, idx) <- patterns.zipWithIndex) {
      var node = 0
      p.foreach { ch =>
        val next = children(node).get(ch)
        node = if (next != null) next.intValue()
        else {
          children += new java.util.HashMap[Character, Integer]()
          patternAt += -1
          children(node).put(ch, children.size - 1)
          children.size - 1
        }
      }
      require(patternAt(node) == -1, s"duplicate pattern '$p'")
      patternAt(node) = idx
    }

    // BFS fail links + dictionary-suffix links (nearest failing ancestor
    // that ends a pattern) — matches are reported by chasing dict links,
    // so nested patterns ("spark" inside "spark sql") all count.
    private val fail = new Array[Int](children.size)
    private val dict = Array.fill(children.size)(-1)
    locally {
      val queue = new java.util.ArrayDeque[Integer]()
      children(0).forEach { (_, c) => fail(c) = 0; queue.add(c) }
      while (!queue.isEmpty) {
        val u = queue.poll().intValue()
        dict(u) = if (patternAt(fail(u)) >= 0) fail(u) else dict(fail(u))
        children(u).forEach { (ch, c) =>
          var f = fail(u)
          while (f != 0 && children(f).get(ch) == null) f = fail(f)
          val t = children(f).get(ch)
          fail(c) = if (t != null && t.intValue() != c.intValue()) t.intValue() else 0
          queue.add(c)
        }
      }
    }

    /** One pass over `text`: per-pattern occurrence counts (all matches,
      * overlapping included).
      */
    def countsData(text: UTF8String): ArrayData = {
      val s = text.toString
      val out = new Array[Long](patterns.length)
      var node = 0
      var i = 0
      while (i < s.length) {
        val ch = s.charAt(i)
        var next = children(node).get(ch)
        while (next == null && node != 0) {
          node = fail(node)
          next = children(node).get(ch)
        }
        if (next != null) node = next.intValue()
        if (patternAt(node) >= 0) out(patternAt(node)) += 1
        var d = dict(node)
        while (d >= 0) {
          out(patternAt(d)) += 1
          d = dict(d)
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** string text → array<long> per-pattern occurrence counts. */
  case class MultiCountExpr(child: Expression, automaton: Automaton)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      automaton.countsData(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ac = ctx.addReferenceObj("automaton", automaton,
        classOf[Automaton].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ac.countsData($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "multi_count"
  }

  /** Per-pattern occurrence counts of `patterns` in `text`, one scan. */
  def multi_count(text: Column, patterns: Seq[String]): Column =
    GraftColumnBridge.column(MultiCountExpr(GraftColumnBridge.expression(text),
      new Automaton(patterns.toArray)))

  /** True iff `p` has a border (a proper prefix that is also a suffix) —
    * bordered patterns can self-overlap, where overlapping (automaton) and
    * non-overlapping (`replace`-trick oracle) counts diverge; q149 asserts
    * its patterns borderless at build time.
    */
  def hasBorder(p: String): Boolean =
    (1 until p.length).exists(k => p.startsWith(p.substring(p.length - k)))
}
