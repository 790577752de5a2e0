package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.BinaryType

import graft.functions.{BloomExprs, ChannelStatsAgg, ShingleExplodeExpr, TextHashExprs, VectorExprs}

/** Session extensions (SparkSessionExtensions → injectFunction): exposes the
  * engine's custom Catalyst expressions to SQL, so `spark.sql` users get the
  * same operators as the Column API:
  *
  *   SELECT simhash(split(text, ' '), 16) FROM documents
  *   SELECT minhash_signature(split(text, ' '), 8) FROM documents
  *   SELECT shingle_hashes(split(text, ' ')) FROM documents
  *   SELECT channel_stats(embedding, 64) FROM embeddings
  *   SELECT vec_dot(embedding, embedding) FROM embeddings
  *
  * Register with:
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  * or spark.sql.extensions=graft.GraftExtensions.
  *
  * One planner strategy is injected: [[graft.plans.AsofJoinStrategy]] plans
  * the custom [[graft.plans.AsofJoinPlan]] logical node into the native
  * merge-scan [[graft.plans.AsofJoinExec]] — the whole-operator escalation
  * for the as-of join, which no composition of built-in operators executes
  * in one pass. (SURVEY §4 #3 found no REFERENCE operator needing this; the
  * as-of node is part of the additive pipeline surface, and the stats
  * literal-fold (§4 #2) stays collect-side in ScalerPipeline.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsof)

    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[TextHashExprs.ShingleHashesExpr].getName, "shingle_hashes"),
      (args: Seq[Expression]) => TextHashExprs.ShingleHashesExpr(args.head)))

    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[TextHashExprs.MinHashSignatureExpr].getName, "minhash_signature"),
      (args: Seq[Expression]) =>
        TextHashExprs.MinHashSignatureExpr(args.head, intArg(args(1), "k"))))

    ext.injectFunction((
      new FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[TextHashExprs.SimHashExpr].getName, "simhash"),
      (args: Seq[Expression]) =>
        TextHashExprs.SimHashExpr(args.head, intArg(args(1), "bits"))))

    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorExprs.DotProductExpr].getName, "vec_dot"),
      (args: Seq[Expression]) => VectorExprs.DotProductExpr(args.head, args(1))))

    ext.injectFunction((
      new FunctionIdentifier("vec_dist_sq"),
      new ExpressionInfo(classOf[VectorExprs.L2DistSqExpr].getName, "vec_dist_sq"),
      (args: Seq[Expression]) => VectorExprs.L2DistSqExpr(args.head, args(1))))

    ext.injectFunction((
      new FunctionIdentifier("grid_rot90"),
      new ExpressionInfo(classOf[VectorExprs.GridRot90Expr].getName, "grid_rot90"),
      (args: Seq[Expression]) => VectorExprs.GridRot90Expr(
        args.head, intArg(args(1), "n"), intArg(args(2), "k"))))

    ext.injectFunction((
      new FunctionIdentifier("shingle_explode"),
      new ExpressionInfo(classOf[ShingleExplodeExpr].getName, "shingle_explode"),
      (args: Seq[Expression]) => ShingleExplodeExpr(args.head)))

    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomExprs.BloomMightContainExpr].getName, "bloom_might_contain"),
      (args: Seq[Expression]) => {
        val bytes = args.head match {
          case Literal(b: Array[Byte], BinaryType) => b
          case other => throw new IllegalArgumentException(
            s"bloom_might_contain: first arg must be a BINARY literal (a serialized filter), got $other")
        }
        BloomExprs.BloomMightContainExpr(bytes, args(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("channel_stats"),
      new ExpressionInfo(classOf[ChannelStatsAgg].getName, "channel_stats"),
      (args: Seq[Expression]) =>
        ChannelStatsAgg(args.head, intArg(args(1), "dim")).toAggregateExpression()))

    ext.injectFunction((
      new FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[graft.functions.MisraGriesAgg].getName, "misra_gries"),
      (args: Seq[Expression]) =>
        graft.functions.MisraGriesAgg(args.head, intArg(args(1), "k"))
          .toAggregateExpression()))

    ext.injectFunction((
      new FunctionIdentifier("count_min"),
      new ExpressionInfo(classOf[graft.functions.CountMinAgg].getName, "count_min"),
      (args: Seq[Expression]) =>
        graft.functions.CountMinAgg(args.head,
          intArg(args(1), "depth"), intArg(args(2), "width"))
          .toAggregateExpression()))
  }
}
