package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** The one Catalyst extension point the expression/aggregate/generator/DSv2
  * surfaces don't reach: a WHOLE-OPERATOR escalation — custom LogicalPlan →
  * SparkStrategy → SparkPlan, registered through SparkSessionExtensions
  * (builder-prompt preference (c), for semantics no composition of built-in
  * operators executes optimally).
  *
  * The operator that earns it is the as-of join. Spark has no native ASOF
  * JOIN; the compositional form (operators/AsofJoin — union + running-max
  * window) is scale-safe but pays a union of both sides through one window
  * and can only attach the TIME, not the matched row's payload (attaching
  * payload compositionally needs a second join back). This physical
  * operator is the textbook database answer: co-partition both sides by
  * key, sort each partition by (key, time), and stream BOTH sides once with
  * a per-partition merge cursor — O(|L| + |R|) per partition, zero extra
  * exchanges beyond the two key shuffles, full right payload attached, the
  * plan a first-class node the optimizer can see.
  *
  * Semantics: for each left row, the right row with the GREATEST time ≤ the
  * left time within the same key (at-or-before, matching AsofJoin and
  * DuckDB's `ASOF LEFT JOIN`); unmatched left rows keep null right columns;
  * null keys/times never match (SQL join-key semantics). Key and time are
  * restricted to LongType — the engine's event-time playbook is integer
  * microseconds anyway, and primitive comparisons keep the merge loop
  * allocation-free. Determinism: callers must give the right side unique
  * (key, time) rows (pre-aggregate duplicates) — among equal (key, time)
  * right rows the sort order is not defined, so the attached payload would
  * not be either. Left-side ties are fine: every left row at time t sees
  * the same latest-right-row.
  */
object NativeAsof {

  /** As-of left join via the native operator. All four name LongType
    * columns; right columns are appended nullable (rename collisions
    * upstream — distinct right-side names keep the output unambiguous).
    */
  def join(left: DataFrame, right: DataFrame, leftKey: String,
           rightKey: String, leftTime: String, rightTime: String): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found among ${p.output.map(_.name).mkString(", ")}"))
    def longAttr(p: LogicalPlan, n: String): Attribute = {
      val a = attr(p, n)
      require(a.dataType == LongType,
        s"native asof needs LongType for $n, got ${a.dataType.catalogString}")
      a
    }
    org.apache.spark.sql.GraftColumnBridge.ofRows(left.sparkSession,
      AsofJoinPlan(lp, rp, longAttr(lp, leftKey), longAttr(rp, rightKey),
        longAttr(lp, leftTime), longAttr(rp, rightTime)))
  }
}

/** Logical node: left output in full, right output appended nullable. Built
  * from ANALYZED children with attributes taken from their outputs, so the
  * node arrives at the analyzer already resolved.
  */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy, injected via SparkSessionExtensions
  * .injectPlannerStrategy (see [[graft.GraftExtensions]]).
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: requiredChildDistribution co-partitions both sides
  * on the key (EnsureRequirements inserts the two exchanges and checks
  * compatibility exactly as it does for SortMergeJoin), requiredChildOrdering
  * sorts each partition by (key, time), and doExecute zips partitions with a
  * single forward-only merge cursor — the right side is scanned at most once
  * per partition no matter how many left rows probe it.
  */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey
    val lt = leftTime
    val rk = rightKey
    val rt = rightTime
    val out = output
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lProj = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rProj = UnsafeProjection.create(Seq(rk, rt), rOut)
      // bind the output against NULLABLE right attrs — unmatched left rows
      // feed an all-null right buffer, and a non-nullable binding would
      // read primitive zeros instead of nulls
      val joiner = UnsafeProjection.create(out,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      // forward-only right cursor
      var rRow: InternalRow = null
      var rKey = 0L
      var rTs = 0L
      def advanceRight(): Unit = {
        rRow = null
        while (rRow == null && ri.hasNext) {
          val cand = ri.next()
          val kt = rProj(cand)
          // null key or null time never matches — skip (SQL semantics)
          if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
            rRow = cand
            rKey = kt.getLong(0)
            rTs = kt.getLong(1)
          }
        }
      }
      advanceRight()

      // latest matched right row for the current left key (copied — the
      // child iterator reuses its row buffer)
      var haveMatch = false
      var matchKey = 0L
      var matchRow: InternalRow = null

      li.map { lRow =>
        val kt = lProj(lRow)
        if (kt.isNullAt(0) || kt.isNullAt(1)) {
          joiner(joined(lRow, nullRight))
        } else {
          val lKeyV = kt.getLong(0)
          val lTsV = kt.getLong(1)
          if (haveMatch && matchKey != lKeyV) { haveMatch = false; matchRow = null }
          while (rRow != null &&
            (rKey < lKeyV || (rKey == lKeyV && rTs <= lTsV))) {
            if (rKey == lKeyV) {
              matchRow = rRow.copy()
              matchKey = lKeyV
              haveMatch = true
            }
            advanceRight()
          }
          joiner(joined(lRow, if (haveMatch) matchRow else nullRight))
        }
      }
    }
  }
}
