package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}


/** `|a ∩ b|` over two SORTED-ascending DISTINCT `array<bigint>`
  * columns as one two-pointer merge — the exact-verify kernel of the
  * dedup family (r16).
  *
  * `size(array_intersect(g_a, g_b))` is semantically identical on
  * distinct inputs but pays, PER PAIR, a hash-set build of one side,
  * a membership probe per element of the other, and the
  * materialization of the intersection ARRAY that `size` immediately
  * throws away. At sf1 the LSH verify relation is ~10⁷ pairs of
  * ~kilobyte gram arrays, and that allocation-heavy kernel was 29%
  * of the whole 167-query map (d_lsh_jaccard 91.5 s warm). The merge
  * loop is zero-allocation, branch-predictable, and [[doGenCode]]
  * keeps it inside whole-stage codegen.
  *
  * CONTRACT (callers: the gram-array builders sort at the source):
  * both inputs sorted ascending with distinct non-null elements —
  * exactly what `sort_array(array_distinct(...))` produces. On such
  * inputs the count equals `size(array_intersect(a, b))` element for
  * element (set intersection of distinct sets), so every oracle and
  * basis-point ratio downstream is unchanged. Unsorted input would
  * undercount — the parity spec pins the kernel against the
  * `array_intersect` form on the real gram relation.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes needs the private[sql] AbstractDataType; check
  // the element type directly instead
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |${ev.value} = 0L;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { ${ev.value}++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** The count as a Column over two sorted-distinct gram arrays. */
  def count(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SortedIntersectCount(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))
}
