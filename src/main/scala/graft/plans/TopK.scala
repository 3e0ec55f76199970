package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.{col, row_number}

/** Per-key top-k as a WHOLE-OPERATOR Catalyst extension — logical
  * node + rewrite rule + strategy + physical exec — for the pattern
  * every leaderboard/upsert-latest/dedup-keep-best query states:
  *
  * {{{ row_number() OVER (PARTITION BY key ORDER BY s) <= k }}}
  *
  * Spark's own plan for that shape sorts EVERY row of every partition
  * (WindowGroupLimit prunes per-key to k, but both its phases require
  * a full local sort first — O(n log n) per partition and sort-spill
  * pressure at 100 TB). [[PerKeyTopKExec]] replaces sort + window +
  * filter with bounded per-key heaps: O(n log k) compares, memory
  * O(keys × k) per task, and the map-side phase shrinks each
  * partition to ≤ keys·k rows BEFORE the shuffle — the map-side-
  * combine stance applied to top-k. The shuffle itself is planned by
  * `EnsureRequirements` from a declared `ClusteredDistribution`, so
  * an already-co-partitioned child skips it entirely (bucketed reads,
  * post-aggregation pipelines).
  *
  * The rewrite fires ONLY on the marker column [[TopK.Marker]] that
  * [[TopK.perKey]] emits — an explicit opt-in, so enabling the rule
  * session-wide can never change another query's plan under it, and
  * un-enabled sessions run the identical declarative window form
  * (same rows, same oracle). This is the (c)-level rung of the
  * extension ladder: [[graft.functions.TopKAgg]] is the typed-
  * aggregator (b)-level answer for a fixed (id, score) shape; this
  * operator handles ANY row shape with zero repacking.
  *
  * Sibling of the reference's per-entity "latest report wins" reads
  * (ref src/db/report.py:170-314 upsert keyed by reported id) — k=1
  * of exactly this operator.
  */
object TopK {
  /** The opt-in marker: only rank columns with this name rewrite. */
  val Marker = "__graft_topk_rn"

  /** The declarative form (always correct, accelerated when
    * [[enable]] has installed the rewrite): rank by `order` within
    * `keys`, keep ranks 1..k, drop the rank column. `order` must be a
    * TOTAL order (tie-break explicitly) for deterministic output —
    * the repo-wide oracle contract.
    */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn(Marker, row_number().over(w))
      .filter(col(Marker) <= k)
      .drop(Marker)
  }

  /** Install rule + strategy on an EXISTING session via the public
    * `experimental` surface (idempotent). Sessions built from config
    * get the same pair through [[graft.GraftExtensions]].
    */
  def enable(spark: SparkSession): Unit = {
    val e = spark.experimental
    if (!e.extraOptimizations.contains(RewriteRankLimitToTopK))
      e.extraOptimizations = e.extraOptimizations :+ RewriteRankLimitToTopK
    if (!e.extraStrategies.contains(PerKeyTopKStrategy))
      e.extraStrategies = e.extraStrategies :+ PerKeyTopKStrategy
  }
}

/** Logical "k best rows per key": output = child's rows, restricted
  * per `partitionSpec` group to the first k under `orderSpec`.
  */
case class PerKeyTopK(partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): PerKeyTopK = copy(child = newChild)
}

/** Rewrites the marker-gated rank-filter pattern
  * `Project(cols, Filter(rn <= k, Window(rn := row_number() ...)))`
  * to [[PerKeyTopK]]. Runs in the user batch (after Spark's own
  * optimizer), so it also strips the `WindowGroupLimit` node
  * `InferWindowGroupLimit` has inserted below the window by then.
  */
object RewriteRankLimitToTopK extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
          if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k))
          if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1))
          if a.semanticEquals(rn) => Some(1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projectList, Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, order, _)), TopK.Marker)),
          _, _, wchild, _)))
        if part.nonEmpty && order.nonEmpty &&
          limitOf(cond, alias.toAttribute).exists(_ >= 1) &&
          // the rank column must be projected AWAY above the filter:
          // PerKeyTopK emits child rows only, never the rank itself
          AttributeSet(projectList.flatMap(_.references))
            .subsetOf(wchild.outputSet) =>
      // Spark's own rank-limit pushdown has already wrapped the child;
      // our operator subsumes it
      val inner = wchild match {
        case WindowGroupLimit(_, _, _, _, gchild) => gchild
        case other => other
      }
      Project(projectList,
        PerKeyTopK(part, order, limitOf(cond, alias.toAttribute).get, inner))
  }
}

/** Plans [[PerKeyTopK]] as partial (map-side, any distribution) +
  * final (clustered on the keys); `EnsureRequirements` inserts the
  * key exchange between them only when the child isn't already
  * co-partitioned.
  */
object PerKeyTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PerKeyTopK(part, order, k, child) =>
      val flushKeys = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topk.flushKeys",
          PerKeyTopKExec.DefaultFlushKeys.toString).toInt
      PerKeyTopKExec(part, order, k, partial = false, flushKeys,
        PerKeyTopKExec(part, order, k, partial = true, flushKeys,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-key top-k over InternalRows. Each task keeps one
  * k-element heap per key it sees (head = current worst kept row);
  * a row enters only if it beats the worst — O(log k) per accepted
  * row, one compare per rejected one.
  *
  * The partial phase is a candidate PRE-FILTER, so it may legally
  * emit supersets: if a skewed task accumulates more than `flushKeys`
  * distinct keys ([[PerKeyTopKExec.DefaultFlushKeys]], conf
  * `spark.graft.topk.flushKeys`), it flushes its heaps downstream and
  * starts fresh — memory stays bounded no matter how many keys land
  * in one input split, and the final phase (keys clustered, so
  * per-task key count is 1/numPartitions of the total) re-applies the
  * exact bound.
  */
case class PerKeyTopKExec(partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder], k: Int, partial: Boolean,
    flushKeys: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(partitionSpec) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val partExprs = partitionSpec
    val order = orderSpec
    val kk = k
    val isPartial = partial
    val childOutput = child.output
    val flushAt = flushKeys
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ord = GenerateOrdering.generate(order, childOutput)
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      val flushed = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var pq = heaps.get(key)
        if (pq == null) {
          if (isPartial && heaps.size() >= flushAt) {
            // skew guard (partial only): emit current candidates and
            // reset — a superset is fine, the final phase re-bounds
            val it = heaps.values().iterator()
            while (it.hasNext) {
              val pit = it.next().iterator()
              while (pit.hasNext) flushed += pit.next()
            }
            heaps.clear()
          }
          pq = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), pq)
        }
        if (pq.size() < kk) pq.add(row.copy())
        else if (ord.compare(row, pq.peek()) < 0) {
          pq.poll(); pq.add(row.copy())
        }
      }
      val tail = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      val hit = heaps.values().iterator()
      while (hit.hasNext) {
        val pit = hit.next().iterator()
        while (pit.hasNext) tail += pit.next()
      }
      (flushed.iterator ++ tail.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): PerKeyTopKExec = copy(child = newChild)
}

object PerKeyTopKExec {
  /** Default max distinct keys a PARTIAL task holds before flushing
    * (override: `spark.graft.topk.flushKeys`). At k≤16 and ~100-byte
    * rows this caps heap state near 200 MB worst-case; typical tasks
    * never hit it.
    */
  val DefaultFlushKeys: Int = 1 << 17
}
