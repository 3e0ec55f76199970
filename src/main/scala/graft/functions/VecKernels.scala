package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Compiled kernels for the ANN quantizer family (r21, the IvfCells /
  * EqCount treatment applied to the remaining interpreted hot-path
  * expressions): micro-quantization, PQ encode/reconstruction, SQ8
  * reconstruction, and integer squared-L2. Each replaces a
  * higher-order-function form (transform / zip_with / aggregate over
  * lambda variables) that evaluated as an interpreted tree walk PER
  * ROW and, being CodegenFallback, broke whole-stage codegen for the
  * projection stage it sat in — the r21 profile put 4.8 s of stage
  * CPU on the fanned PQ/SQ8 encode stages of the s_ann_recall sweep.
  *
  * Arithmetic fidelity (oracle parity depends on it, the IvfCells
  * stance): quantization is EXACTLY Spark's `CAST(round(CAST(x AS
  * DOUBLE) * scale, 0) AS BIGINT)` — `BigDecimal.valueOf(v * scale)
  * .setScale(0, HALF_UP)` then truncating cast; PQ argmin compares
  * (dist, cell) lexicographically like `array_min` over the struct
  * table; SQ8's floor divisions run on provably non-negative operands
  * where Java `/` equals the composed `(n - pmod(n, d)) / d` exactly;
  * sums accumulate in Long in index order, the `aggregate` fold.
  *
  * Null/length contract: [[SqDistL2]] is FAITHFUL to the zip_with
  * form (length mismatch or a null element ⇒ NULL — padding makes the
  * fold null). [[MicroVec]] is faithful to `transform` (per-element
  * null in ⇒ null out, length preserved). [[PqRecon]]/[[Sq8Recon]]
  * are intentionally STRICTER than their composed forms on RAGGED
  * input (whole-result NULL instead of per-element nulls), the
  * documented IvfCells deviation: the ANN corpora are fixed-dim
  * non-null, and a corrupt vector should fail loudly as one countable
  * null. VecKernelsSpec pins every kernel against its HOF form on the
  * real embeddings plus adversarial rows.
  */
case class MicroVec(child: Expression, scale: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "micro_vec"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (x.isNullAt(i)) null
        else java.lang.Long.valueOf(MicroVec.micro(x.getFloat(i), scale))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $x.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    $out[$i] = java.lang.Long.valueOf(
         |      graft.functions.MicroVec.micro($x.getFloat($i), ${scale}L));
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object MicroVec {
  /** Spark's `CAST(round(CAST(x AS DOUBLE) * scale) AS BIGINT)`. */
  def micro(x: Float, scale: Long): Long =
    java.math.BigDecimal.valueOf(x.toDouble * scale)
      .setScale(0, java.math.RoundingMode.HALF_UP)
      .doubleValue().toLong

  def of(v: Column, scale: Long): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MicroVec(org.apache.spark.sql.GraftColumnBridge.expression(v), scale))
}

/** `Σ (a_i − b_i)²` over two `array<long>` columns — NULL on length
  * mismatch or any null element, exactly the
  * `aggregate(zip_with(a, b, (x, c) -> (x-c)*(x-c)), 0L, +)` form.
  */
case class SqDistL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist_l2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var d = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val t = x.getLong(i) - y.getLong(i)
      d += t * t
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    long $t = $a.getLong($i) - $b.getLong($i);
         |    ${ev.value} += $t * $t;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqDistL2 {
  def of(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SqDistL2(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))
}

/** PQ encode/reconstruct over an `array<float>` embedding under a
  * shipped codebook: quantize once, then per subspace the argmin
  * sub-centroid by exact integer squared-L2 (ties → smallest cell id,
  * the `array_min` struct order). `emitCodes = false` emits the
  * 64-long reconstruction (winning sub-centroids concatenated),
  * `true` the PqSub winning cell ids. Whole-result NULL on ragged or
  * null-element input (see the file doc). Codebook rides as
  * IndexedSeq for value equality under plan canonicalization (the
  * IvfCells stance).
  */
case class PqRecon(child: Expression, ids: IndexedSeq[Long],
    cents: IndexedSeq[IndexedSeq[Long]], pqSub: Int,
    emitCodes: Boolean) extends UnaryExpression {

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val centArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray

  private def dim: Int = if (cents.isEmpty) 0 else cents(0).length
  private def subDim: Int = dim / pqSub

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = if (emitCodes) "pq_codes" else "pq_recon"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val eq = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      eq(i) = MicroVec.micro(x.getFloat(i), 1000000L)
      i += 1
    }
    val out = new Array[Any](if (emitCodes) pqSub else dim)
    var j = 0
    while (j < pqSub) {
      var bestD = Long.MaxValue
      var bestI = -1
      var c = 0
      while (c < centArr.length) {
        val cv = centArr(c)
        var d = 0L
        var k = j * subDim
        val end = k + subDim
        while (k < end) {
          val t = eq(k) - cv(k)
          d += t * t
          k += 1
        }
        // codebook is sorted by id, so strict < keeps the smallest
        // cell id on ties — the array_min struct order
        if (d < bestD) { bestD = d; bestI = c }
        c += 1
      }
      if (emitCodes) out(j) = java.lang.Long.valueOf(idArr(bestI))
      else {
        val cv = centArr(bestI)
        var k = j * subDim
        val end = k + subDim
        while (k < end) {
          out(k) = java.lang.Long.valueOf(cv(k))
          k += 1
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("pqRecon", this,
      classOf[PqRecon].getName)
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $obj.nullSafeEvalPublic($x);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  /** codegen entry — same body as nullSafeEval, public for janino. */
  def nullSafeEvalPublic(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object PqRecon {
  def recon(embedding: Column, codebook: Array[(Long, Array[Long])],
      pqSub: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      PqRecon(
        org.apache.spark.sql.GraftColumnBridge.expression(embedding),
        codebook.map(_._1).toIndexedSeq,
        codebook.map(_._2.toIndexedSeq).toIndexedSeq, pqSub,
        emitCodes = false))

  def codes(embedding: Column, codebook: Array[(Long, Array[Long])],
      pqSub: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      PqRecon(
        org.apache.spark.sql.GraftColumnBridge.expression(embedding),
        codebook.map(_._1).toIndexedSeq,
        codebook.map(_._2.toIndexedSeq).toIndexedSeq, pqSub,
        emitCodes = true))
}

/** SQ8 midpoint reconstruction over an `array<float>` embedding under
  * shipped per-dim (min, span) bounds: code = (x_micro − mn)·255 DIV
  * (span+1), recon = mn + (2·code+1)·(span+1) DIV 510 — every operand
  * non-negative (mn/mx are corpus bounds), so Java `/` is the exact
  * floor the composed `(n - pmod(n, d)) / d` computes. Whole-result
  * NULL on ragged or null-element input.
  */
case class Sq8Recon(child: Expression, mins: IndexedSeq[Long],
    spans: IndexedSeq[Long]) extends UnaryExpression {

  @transient private lazy val mnArr: Array[Long] = mins.toArray
  @transient private lazy val spArr: Array[Long] = spans.toArray

  private def dim: Int = mins.length

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_recon"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      val m = MicroVec.micro(x.getFloat(i), 1000000L)
      val code = ((m - mnArr(i)) * 255L) / (spArr(i) + 1L)
      out(i) = java.lang.Long.valueOf(
        mnArr(i) + ((code * 2L + 1L) * (spArr(i) + 1L)) / 510L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("sq8Recon", this,
      classOf[Sq8Recon].getName)
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $obj.nullSafeEvalPublic($x);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  def nullSafeEvalPublic(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object Sq8Recon {
  def of(embedding: Column, mn: Array[Long], span: Array[Long]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Sq8Recon(
        org.apache.spark.sql.GraftColumnBridge.expression(embedding),
        mn.toIndexedSeq, span.toIndexedSeq))
}
