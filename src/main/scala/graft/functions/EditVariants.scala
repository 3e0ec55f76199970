package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The SymSpell deletion neighborhood of a string key as ONE compiled
  * kernel — identity + every 1-deletion (+ every 2-deletion at
  * depth 2), first-occurrence-deduplicated, exactly the value of the
  * F30 `editVarsExpr` / `editVars2Expr` SQL forms it replaces.
  *
  * Those forms are built from higher-order functions
  * (transform/filter/flatten + array_distinct over lambda variables),
  * which are `CodegenFallback`: every doc paid an interpreted
  * tree-walk PER VARIANT (301 variants/doc at depth 2 — the r20
  * profile's dominant map stage for d_edit_dup2 even after the fan),
  * and the fallback broke whole-stage codegen for the generate stage.
  * This kernel is one byte-slicing loop over the key; [[doGenCode]]
  * emits a plain static call so the stage stays fused (the EqCount
  * treatment, r20 verdict #4).
  *
  * Equivalence contract (pinned by EditVariantsSpec against the SQL
  * forms, including multi-byte and over-length keys):
  *  - deletions index CODE POINTS (Spark `substring` semantics), so
  *    multi-byte characters delete atomically;
  *  - the trailing piece of every variant is capped at `cap` chars —
  *    the SQL forms write `substring(k, i+1, $EditKeyLen)`, so keys
  *    LONGER than cap+1 chars truncate their tail identically;
  *  - dedup keeps first occurrence in identity → 1-deletions (position
  *    order) → 2-deletions ((i,j) lexicographic) order, as
  *    array_distinct does;
  *  - a NULL key yields the single-element array [NULL] (the SQL form:
  *    `array(k)` keeps the null element, both CASE guards are false).
  */
case class EditVariants(child: Expression, depth: Int, cap: Int)
    extends UnaryExpression {

  require(depth == 1 || depth == 2, s"unsupported edit depth $depth")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got " +
        child.dataType.simpleString)

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "edit_variants"

  // the SQL form never returns null (a null key becomes [null]), so
  // the expression itself is non-nullable and must bypass the default
  // null-in/null-out eval
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val k = child.eval(input)
    EditVariants.compute(k.asInstanceOf[UTF8String], depth, cap)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    // the kernel object rides the references array (the standard way
    // to call into Scala from generated Java); the stage stays fused —
    // no CodegenFallback — and the loop itself is compiled bytecode
    val obj = ctx.addReferenceObj("editVariants", EditVariants,
      EditVariants.getClass.getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $obj.compute(${c.isNull} ? null : ${c.value}, $depth, $cap);
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object EditVariants {

  /** The deletion neighborhood of `k` (null ⇒ [null]); see the class
    * doc for the exact contract. Byte-slicing over one code-point
    * offset table — no per-variant expression evaluation.
    */
  def compute(k: UTF8String, depth: Int, cap: Int): GenericArrayData = {
    if (k == null) return new GenericArrayData(Array[Any](null))
    val bytes = k.getBytes
    // offsets(c) = byte offset where code point c starts; offsets(n) = end
    val n = k.numChars()
    val offsets = new Array[Int](n + 1)
    var c = 0
    var b = 0
    while (c < n) {
      offsets(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offsets(n) = bytes.length
    // trailing-piece cap in code points: piece starting at code point
    // `from` (0-based) keeps at most `cap` chars
    def tail(from: Int): (Int, Int) = {
      val until = math.min(n, from + cap)
      (offsets(math.min(from, n)), offsets(until))
    }
    val seen = new java.util.LinkedHashSet[UTF8String](
      if (depth == 1) n + 2 else n * n / 2 + n + 2)
    seen.add(k)
    if (n >= 1) {
      // 1-deletions: delete code point i (0-based), tail capped
      var i = 0
      while (i < n) {
        val (ts, te) = tail(i + 1)
        val out = new Array[Byte](offsets(i) + (te - ts))
        System.arraycopy(bytes, 0, out, 0, offsets(i))
        System.arraycopy(bytes, ts, out, offsets(i), te - ts)
        seen.add(UTF8String.fromBytes(out))
        i += 1
      }
    }
    if (depth == 2 && n >= 2) {
      // 2-deletions (i < j, 0-based): head [0,i) ++ middle (i,j) ++
      // tail from j+1 capped
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val midS = offsets(i + 1)
          val midE = offsets(j)
          val (ts, te) = tail(j + 1)
          val out = new Array[Byte](offsets(i) + (midE - midS) + (te - ts))
          System.arraycopy(bytes, 0, out, 0, offsets(i))
          System.arraycopy(bytes, midS, out, offsets(i), midE - midS)
          System.arraycopy(bytes, ts, out, offsets(i) + (midE - midS),
            te - ts)
          seen.add(UTF8String.fromBytes(out))
          j += 1
        }
        i += 1
      }
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next(); x += 1 }
    new GenericArrayData(arr)
  }

  /** The deletion neighborhood as a Column. */
  def of(k: Column, depth: Int, cap: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      EditVariants(
        org.apache.spark.sql.GraftColumnBridge.expression(k), depth, cap))
}
