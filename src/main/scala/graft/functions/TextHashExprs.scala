package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the shingle/minhash hot path.
  *
  * Why custom (SURVEY preference order (b)): the pure-HOF formulation of
  * 3-token shingling needs indexed access (`element_at(tokens, i+k)`) inside
  * a `transform` lambda. When the resulting expression tree exceeds codegen
  * limits Spark falls back to interpreted eval, where every `element_at`
  * re-evaluates the `split()` subtree — O(shingles) re-tokenizations per row,
  * quadratic wall-clock observed in practice. These expressions do the whole
  * tokens→shingles→signature pass in one tight Scala loop per row: one
  * evaluation of the child, zero re-tokenization, and the arithmetic is the
  * exact integer semantics of [[Hashes]], so DuckDB oracles still replay it.
  */
object TextHashExprs {
  import Hashes.{Mult, Prime}

  /** tokenHash(t) — must stay bit-identical to Hashes.tokenHash/tokenHashSql:
    * a FULL-CONTENT codepoint polynomial,
    * `(fold_{cp ∈ codepoints(t)} acc = (acc·131 + cp) mod P) · Mult mod P`.
    * Iterates CODEPOINTS (not UTF-16 chars) so non-BMP input matches
    * DuckDB's `unicode()` per split character. Replaces the round-1..9
    * (first char, last char, length) fingerprint whose structural
    * collisions ("cat"/"cot", "walked"/"warmed") inflated every near-dup
    * consumer's candidate sets; the polynomial collides only at the
    * birthday bound of the 1e9+7 modulus.
    */
  private[graft] def tokenHash(t: UTF8String): Long = {
    val s = t.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 131L + cp) % Prime
      i += Character.charCount(cp)
    }
    (acc * Mult) % Prime
  }

  /** Static forwarder for [[TokenHashExpr]] codegen. */
  def tokenHashValue(t: UTF8String): Long = tokenHash(t)

  /** string → long: the full-content token hash (see [[tokenHash]]). A
    * custom expression (not an `aggregate`-over-`split` HOF tree) so the
    * per-token loop stays a tight JVM loop inside whole-stage codegen and
    * composes inside other HOF lambdas (DSIR's bucket filter).
    */
  case class TokenHashExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      java.lang.Long.valueOf(tokenHash(v.asInstanceOf[UTF8String]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextHashExprs.tokenHashValue($c);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "token_hash"
  }

  def token_hash(t: Column): Column =
    GraftColumnBridge.column(TokenHashExpr(GraftColumnBridge.expression(t)))

  /** Shingle-hash array of a token array (3-gram):
    * sh_i = (th_i·961 + th_{i+1}·31 + th_{i+2}) mod P.
    */
  private[graft] def shingleHashes(tokens: ArrayData): Array[Long] = {
    val n = tokens.numElements()
    if (n < 3) return Array.empty
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = tokenHash(tokens.getUTF8String(i)); i += 1 }
    val out = new Array[Long](n - 2)
    i = 0
    while (i < n - 2) {
      out(i) = (th(i) * 961L + th(i + 1) * 31L + th(i + 2)) % Prime
      i += 1
    }
    out
  }

  /** array<string> tokens → array<long> 3-gram shingle hashes. */
  case class ShingleHashesExpr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      shingleHashesData(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextHashExprs.shingleHashesData($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
    override def prettyName: String = "shingle_hashes"
  }

  /** array<string> tokens → array<long> of width-w FOLD shingle hashes:
    * per window, acc = (acc·31 + tokenHash(t)) mod P over the w tokens —
    * the [[graft.operators.DupSpans]] hash family (NOT the 3-gram quadratic
    * form above: the fold reduces mod P between steps, so the families
    * differ; each pairs with its own oracle twin). Same codegen rationale:
    * the HOF formulation (`transform` + `aggregate(slice(...))` per window)
    * degrades to interpreted eval at O(n·w) lambda dispatches per row —
    * measured ~16 s for q128's island pass at sf0.1 vs ~2 s through this
    * kernel.
    */
  case class FoldShinglesExpr(child: Expression, width: Int)
      extends UnaryExpression {
    require(width >= 1, s"width must be >= 1, got $width")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      foldShinglesData(v.asInstanceOf[ArrayData], width)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextHashExprs.foldShinglesData($c, $width);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "fold_shingles"
  }

  /** array<string> tokens → array<string> of width-w windows, each window's
    * tokens joined by the U+0001 separator — EXACT duplicate-window keys
    * (no hash collisions), the census key of
    * [[graft.operators.DupSpans.islandsExact]]. Same kernel rationale as
    * [[FoldShinglesExpr]]: one tight loop per row instead of a per-window
    * `concat_ws(slice(...))` HOF tree.
    */
  case class WindowJoinExpr(child: Expression, width: Int)
      extends UnaryExpression {
    require(width >= 1, s"width must be >= 1, got $width")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      windowJoinData(v.asInstanceOf[ArrayData], width)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextHashExprs.windowJoinData($c, $width);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "window_join"
  }

  /** array<string> tokens → array<long> of k minhash values:
    * mh_j = min over shingles of ((2j+1)·h + 12345j+678) mod P; P if empty.
    */
  case class MinHashSignatureExpr(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      minhashSignatureData(v.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextHashExprs.minhashSignatureData($c, $k);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "minhash_signature"
  }

  // Codegen strategy for all three expressions: the generated Java calls one
  // static forwarder on this object per row (tight JVM loop inside), so the
  // expressions participate in whole-stage codegen — no interpreted-eval
  // fallback barrier splitting the surrounding projection.

  /** Static-forwarder kernels (public so Janino-generated Java can call). */
  def shingleHashesData(tokens: ArrayData): ArrayData =
    new GenericArrayData(shingleHashes(tokens))

  def foldShinglesData(tokens: ArrayData, width: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < width) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = tokenHash(tokens.getUTF8String(i)); i += 1 }
    val out = new Array[Long](n - width + 1)
    i = 0
    while (i <= n - width) {
      var acc = 0L
      var j = 0
      while (j < width) { acc = (acc * 31L + th(i + j)) % Prime; j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  def windowJoinData(tokens: ArrayData, width: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < width) return new GenericArrayData(Array.empty[Any])
    val ts = new Array[UTF8String](n)
    var i = 0
    while (i < n) { ts(i) = tokens.getUTF8String(i); i += 1 }
    val sep = UTF8String.fromString("\u0001")
    val out = new Array[Any](n - width + 1)
    i = 0
    while (i <= n - width) {
      var w = ts(i)
      var j = 1
      while (j < width) { w = UTF8String.concat(w, sep, ts(i + j)); j += 1 }
      out(i) = w
      i += 1
    }
    new GenericArrayData(out)
  }

  def minhashSignatureData(tokens: ArrayData, k: Int): ArrayData = {
    val sh = shingleHashes(tokens)
    val sig = Array.fill(k)(Prime)
    var i = 0
    while (i < sh.length) {
      val h = sh(i)
      var j = 0
      while (j < k) {
        val cand = (h * (2L * j + 1) + 12345L * j + 678) % Prime
        if (cand < sig(j)) sig(j) = cand
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def simhashValue(tokens: ArrayData, bits: Int): Long = {
    val votes = new Array[Long](bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = tokenHash(tokens.getUTF8String(i))
      var b = 0
      while (b < bits) {
        votes(b) += ((h >> b) & 1L) * 2L - 1L
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** array<string> tokens → simhash long: bit b set when
    * Σ_tokens (±1 by bit b of tokenHash) > 0. One pass over the tokens —
    * the HOF form re-hashed the token stream once per bit (16×).
    */
  case class SimHashExpr(child: Expression, bits: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      java.lang.Long.valueOf(simhashValue(v.asInstanceOf[ArrayData], bits))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextHashExprs.simhashValue($c, $bits);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "simhash"
  }

  /** Best-segmentation DP value for `word` under `vocab` (gram → score):
    * maximize Σ piece-scores, tie-break to FEWER pieces, both packed into
    * one long v = 64·Σscores − pieces (pieces ≤ 63 by the caller's word-
    * length cap, so ordering on v IS the lexicographic (score, −pieces)
    * order). Pieces are vocab grams of length 2–4; any single char is
    * always a piece at score 1 (the SentencePiece character fallback that
    * guarantees every word segments). dp[i] = max(dp[i−1] + 63,
    * max_{L=2..4, gram ∈ vocab} dp[i−L] + 64·score − 1) — identical to
    * the q273 oracle's recursive-CTE frontier.
    */
  def viterbiSegValue(w: UTF8String,
                      vocab: java.util.HashMap[String, java.lang.Long]): Long = {
    val s = w.toString
    val n = s.length
    val dp = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var best = dp(i - 1) + 63
      var l = 2
      while (l <= 4 && l <= i) {
        val sc = vocab.get(s.substring(i - l, i))
        if (sc != null) {
          val cand = dp(i - l) + 64L * sc.longValue - 1
          if (cand > best) best = cand
        }
        l += 1
      }
      dp(i) = best
      i += 1
    }
    dp(n)
  }

  /** viterbi_seg(word): the packed DP value (see [[viterbiSegValue]]);
    * the vocab rides along as a codegen reference object, so the whole
    * segmentation is one fused loop per row — no join fan-out over
    * per-position candidate grams on the Spark side.
    */
  case class ViterbiSegExpr(child: Expression,
                            vocab: java.util.HashMap[String, java.lang.Long])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      java.lang.Long.valueOf(viterbiSegValue(v.asInstanceOf[UTF8String], vocab))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val vRef = ctx.addReferenceObj("viterbiVocab", vocab, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextHashExprs.viterbiSegValue($c, $vRef);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "viterbi_seg"
  }

  def viterbi_seg(word: Column,
                  vocab: java.util.HashMap[String, java.lang.Long]): Column =
    GraftColumnBridge.column(
      ViterbiSegExpr(GraftColumnBridge.expression(word), vocab))

  def simhash_expr(tokens: Column, bits: Int): Column =
    GraftColumnBridge.column(SimHashExpr(GraftColumnBridge.expression(tokens), bits))

  def shingle_hashes(tokens: Column): Column =
    GraftColumnBridge.column(ShingleHashesExpr(GraftColumnBridge.expression(tokens)))

  def minhash_signature(tokens: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinHashSignatureExpr(GraftColumnBridge.expression(tokens), k))
}
