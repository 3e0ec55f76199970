package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Count of positions where two `array<string>` columns hold equal
  * non-null elements — the minhash signature-agreement kernel (F15).
  *
  * Semantically identical on the engine's inputs to
  * `aggregate(zip_with(a, b, (x, y) -> IF(x = y, 1L, 0L)), 0L,
  * (acc, v) -> acc + v)`, but that form is built from higher-order
  * functions, which are `CodegenFallback` expressions: every
  * candidate pair paid an interpreted two-lambda evaluation PLUS the
  * fallback broke whole-stage codegen for the entire verify
  * projection it sat in (the same stage that runs the
  * [[SortedIntersectCount]] gram kernel — r20 profile: d_minhash_est
  * 25 s of stage CPU vs the sig-free d_lsh_jaccard's 11 s on the same
  * banding join). This kernel is one zero-allocation loop and
  * [[doGenCode]] keeps the stage fused.
  *
  * Equivalence contract (pinned by EqCountSpec against the zip_with
  * form): positions are compared up to the SHORTER length — zip_with
  * pads the longer side with nulls and `IF(null = x, 1, 0)` is 0, so
  * padded positions never count; a null element on either side
  * contributes 0 the same way. The engine's signatures are
  * fixed-length ([[graft.operators.Dedup.NumHashes]] md5 strings,
  * never null), where both forms are trivially the per-seed
  * agreement count.
  */
case class EqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "eq_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var c = 0L
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) &&
        x.getUTF8String(i) == y.getUTF8String(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getUTF8String($i).equals($b.getUTF8String($i))) {
         |    ${ev.value}++;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object EqCount {
  /** Positions with equal non-null elements, as a Column. */
  def count(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      EqCount(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))
}
