package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, DenseRank, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, Rank, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
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
  * The rewrite fires on the GENERIC pattern — any
  * `Filter(rn <= k)` over a single `row_number()` window whose rank
  * column is projected away above the filter — so every downstream
  * query written in the vanilla window idiom gets the heap operator
  * without opting in (`spark.graft.topk.rewrite=marker` narrows it
  * back to the explicit [[TopK.Marker]] column; `off` disables it).
  * Un-enabled sessions run the identical declarative window form
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
  /** Rank-column name [[perKey]] emits. Rewrites regardless of the
    * `spark.graft.topk.rewrite` mode (explicit opt-in always wins).
    */
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

/** Retention contract of a [[PerKeyTopK]] — the three rank-family
  * window functions state three different boundaries:
  *  - [[TopKMode.RowNum]]: `row_number() <= k` — exactly k rows, the
  *    total order decides;
  *  - [[TopKMode.RankTies]]: `rank() <= k` — every row tying the
  *    k-th smallest sort key stays (boundary tie group whole);
  *  - [[TopKMode.Dense]]: `dense_rank() <= k` — every row whose sort
  *    key is among the k smallest DISTINCT keys stays (k whole value
  *    groups).
  */
sealed trait TopKMode extends Serializable
object TopKMode {
  case object RowNum extends TopKMode
  case object RankTies extends TopKMode
  case object Dense extends TopKMode
}

/** Logical "k best rows per key": output = child's rows, restricted
  * per `partitionSpec` group to the first k under `orderSpec`, with
  * the boundary contract `mode` states.
  */
case class PerKeyTopK(partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder], k: Int, mode: TopKMode,
    child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): PerKeyTopK = copy(child = newChild)
}

/** Rewrites the rank-filter pattern
  * `Project(cols, Filter(rn <= k, Window(rn := row_number() ...)))`
  * to [[PerKeyTopK]] — for ANY rank-column name, provided the rank is
  * projected away above the filter (it is only a selection device, so
  * replacing the sort+window with bounded heaps is row-equivalent).
  * `spark.graft.topk.rewrite` gates the generic match: `generic`
  * (default) rewrites every such plan, `marker` only the explicit
  * [[TopK.Marker]] column, `off` none (the marker still honors
  * marker-mode — it IS the opt-in). Runs in the user batch (after
  * Spark's own optimizer), so it also strips the `WindowGroupLimit`
  * node `InferWindowGroupLimit` has inserted below the window by then.
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
      // reversed literal-first spellings (`k >= rn`) — Catalyst does
      // not canonicalize comparison orientation before the user batch
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute)
          if a.semanticEquals(rn) => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute)
          if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(IntegerLiteral(1), a: Attribute)
          if a.semanticEquals(rn) => Some(1)
      case _ => None
    }

  private def mode: String = conf.getConfString(
    "spark.graft.topk.rewrite", "generic")

  /** The window functions the heap operator stands in for, each with
    * its own retention contract ([[TopKMode]]): row_number (exact k),
    * rank (k + boundary ties), dense_rank (k whole value groups).
    */
  private def rankLike(fn: Expression): Option[TopKMode] = fn match {
    case RowNumber()  => Some(TopKMode.RowNum)
    case Rank(_)      => Some(TopKMode.RankTies)
    case DenseRank(_) => Some(TopKMode.Dense)
    case _            => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projectList, Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(fn,
          WindowSpecDefinition(part, order, _)), name)),
          _, _, wchild, _)))
        if part.nonEmpty && order.nonEmpty && rankLike(fn).isDefined &&
          (mode match {
            case "off"    => false
            case "marker" => name == TopK.Marker
            case _        => true
          }) &&
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
        PerKeyTopK(part, order, limitOf(cond, alias.toAttribute).get,
          rankLike(fn).get, inner))
  }
}

/** Plans [[PerKeyTopK]] as partial (map-side, any distribution) +
  * final (clustered on the keys); `EnsureRequirements` inserts the
  * key exchange between them only when the child isn't already
  * co-partitioned.
  */
object PerKeyTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PerKeyTopK(part, order, k, mode, child) =>
      val flushKeys = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topk.flushKeys",
          PerKeyTopKExec.DefaultFlushKeys.toString).toInt
      PerKeyTopKExec(part, order, k, mode, partial = false, flushKeys,
        PerKeyTopKExec(part, order, k, mode, partial = true, flushKeys,
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
  * `spark.graft.topk.flushKeys`), it ends the current SEGMENT — the
  * segment's heaps stream downstream immediately (a lazy segment
  * iterator, not a buffer held to partition end) and a fresh heap map
  * starts. Task memory is therefore bounded at O(flushKeys × k) rows
  * no matter how many keys land in one input split, and the final
  * phase (keys clustered, so per-task key count is 1/numPartitions of
  * the total) re-applies the exact bound.
  */
case class PerKeyTopKExec(partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder], k: Int, mode: TopKMode, partial: Boolean,
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
    val theMode = mode
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
      /** rank()-mode insert: keep `row` iff fewer than k retained rows
        * strictly precede it. The heap may exceed k by the boundary
        * tie group — `rank() <= k` OUTPUTS those rows, so the extra
        * memory is the output's own size, not overhead. Rejection
        * (strictly worse than the head with ≥ k rows held) is sound
        * because the head value only ever improves; eviction drops the
        * worst tie group whole, and only when ≥ k strictly-better rows
        * remain — exactly "that group's rank exceeds k".
        */
      def addWithTies(pq: java.util.PriorityQueue[InternalRow],
          row: InternalRow): Unit = {
        if (pq.size() < kk) { pq.add(row.copy()); return }
        if (ord.compare(row, pq.peek()) > 0) return // rank > k forever
        pq.add(row.copy())
        var dropping = true
        while (dropping && pq.size() > kk) {
          val head = pq.peek()
          var tieCount = 0
          val it = pq.iterator()
          while (it.hasNext) {
            if (ord.compare(it.next(), head) == 0) tieCount += 1
          }
          if (pq.size() - tieCount >= kk) {
            var i = 0
            while (i < tieCount) { pq.poll(); i += 1 }
          } else dropping = false
        }
      }
      /** dense_rank()-mode insert: keep `row` iff its sort key is
        * among the k smallest DISTINCT keys seen. `reps` holds one
        * representative per retained distinct key (a TreeSet under
        * the row ordering, ≤ k+1 entries) — O(log k) membership, and
        * when a (k+1)-th distinct key appears the worst whole value
        * group leaves the heap (it sits contiguously at the worst-
        * first head). Memory is k value groups — again output-sized.
        */
      def addDense(pq: java.util.PriorityQueue[InternalRow],
          reps: java.util.TreeSet[InternalRow],
          row: InternalRow): Unit = {
        if (reps.size() >= kk && ord.compare(row, reps.last()) > 0)
          return // beyond the k-th distinct key, and keys only shrink
        pq.add(row.copy())
        reps.add(row.copy()) // no-op when the key is already present
        if (reps.size() > kk) {
          val worst = reps.pollLast()
          while (!pq.isEmpty && ord.compare(pq.peek(), worst) == 0)
            pq.poll()
        }
      }
      // Lazy SEGMENTS: each next() consumes input until either the
      // input ends or (partial only, skew guard) a new key would push
      // the heap map past flushAt — the segment's heaps then stream
      // downstream right away instead of accumulating to partition
      // end, so a billion-key skewed split never holds more than
      // O(flushAt × k) row copies at once. A flushed superset is
      // fine: the final phase re-applies the exact per-key bound.
      var pendingRow: InternalRow = null // the row that tripped the cap
      new Iterator[Iterator[InternalRow]] {
        override def hasNext: Boolean = pendingRow != null || iter.hasNext
        override def next(): Iterator[InternalRow] = {
          val heaps = new java.util.HashMap[UnsafeRow,
            java.util.PriorityQueue[InternalRow]]()
          // dense mode: one distinct-key representative set per key,
          // parallel to `heaps` (allocated only when used)
          val repSets =
            if (theMode == TopKMode.Dense)
              new java.util.HashMap[UnsafeRow,
                java.util.TreeSet[InternalRow]]()
            else null
          var capped = false
          while (!capped && (pendingRow != null || iter.hasNext)) {
            val row = if (pendingRow != null) {
              val r = pendingRow; pendingRow = null; r
            } else iter.next()
            val key = keyProj(row)
            var pq = heaps.get(key)
            if (pq == null && isPartial && heaps.size() >= flushAt) {
              // the row opens the NEXT segment (copy: the child may
              // reuse its row buffer across next() calls)
              pendingRow = row.copy()
              capped = true
            } else {
              if (pq == null) {
                pq = new java.util.PriorityQueue[InternalRow](kk + 1,
                  worstFirst)
                val keyCopy = key.copy()
                heaps.put(keyCopy, pq)
                if (repSets != null)
                  repSets.put(keyCopy,
                    new java.util.TreeSet[InternalRow](
                      new java.util.Comparator[InternalRow] {
                        override def compare(a: InternalRow,
                            b: InternalRow): Int = ord.compare(a, b)
                      }))
              }
              theMode match {
                case TopKMode.RankTies => addWithTies(pq, row)
                case TopKMode.Dense => addDense(pq, repSets.get(key), row)
                case TopKMode.RowNum =>
                  if (pq.size() < kk) pq.add(row.copy())
                  else if (ord.compare(row, pq.peek()) < 0) {
                    pq.poll(); pq.add(row.copy())
                  }
              }
            }
          }
          // heaps is final for this segment — drain it lazily too
          import scala.jdk.CollectionConverters._
          heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
        }
      }.flatten
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
