package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Fused IVF distance table over an `array<float>` embedding column:
  * per row, the array of (squared-L2-micro, cell) structs against a
  * SHIPPED codebook — `array_min` over it is the coarse-quantizer
  * assignment, `array_sort` + `slice` the multi-assignment / nprobe
  * ranking.
  *
  * The composable form (one `transform` over the codebook with a
  * nested `zip_with` + `aggregate` per centroid) is semantically
  * right but evaluates as interpreted higher-order functions with an
  * allocation and a boxed lambda call per element — measured
  * ~1.6 ms/row at k = 64 × dim 64, which made every km-codebook
  * consumer pay whole seconds per query once the r15 √n codebook
  * landed. This expression is the same arithmetic as two primitive
  * loops: quantize once per row (k-reused), then k × dim subtract-
  * square-accumulate — microseconds per row at the same shape — and
  * [[doGenCode]] emits those loops as Java so the projection stage
  * it sits in stays inside whole-stage codegen (a CodegenFallback
  * here would break the fused stage around it).
  *
  * Arithmetic fidelity (oracle parity depends on it): quantization is
  * EXACTLY Spark's `CAST(round(CAST(x AS DOUBLE) * 1e6, 0) AS
  * BIGINT)` — `BigDecimal.valueOf(v * 1e6).setScale(0, HALF_UP)` then
  * truncating cast, the same path `Round` + `Cast` take — and
  * distances accumulate in Long in index order, exactly the
  * `aggregate` fold. Output order is codebook order; struct
  * comparison downstream breaks distance ties by cell id, unchanged.
  *
  * Null/length contract (intentionally STRICTER than the composed
  * form): an embedding whose length differs from the codebook's dim
  * yields NULL for the whole array (the composed `zip_with` nulled
  * the fold the same way), and a NULL ELEMENT inside the embedding
  * also yields NULL for the whole array — the composed form would
  * have produced per-struct NULL dists instead; collapsing to one
  * row-level NULL keeps the struct fields non-nullable (the argmin /
  * sort consumers never see a null dist) and surfaces a corrupt
  * vector as one countable null rather than a silently-misranked
  * cell list. Moot for the fixed-dim non-null corpora the ANN family
  * runs on, asserted here so ragged inputs fail loudly.
  *
  * The codebook rides as `IndexedSeq` fields (not `Array`) so the
  * case-class equality Catalyst uses for canonicalized-plan matching
  * (cache entry sharing, ReuseExchange) compares by VALUE: two plans
  * built from separately-collected but identical codebooks stay the
  * same plan, exactly like the old `typedlit` form whose Literals
  * compared by value. Eval paths use the transient array mirrors.
  */
case class IvfCells(child: Expression, ids: IndexedSeq[Long],
    cents: IndexedSeq[IndexedSeq[Long]],
    microInput: Boolean = false) extends UnaryExpression {

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val centArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray

  private def dim: Int = if (cents.isEmpty) 0 else cents(0).length

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("cell", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true
  override def prettyName: String = "ivf_cells"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val eq = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      eq(i) =
        if (microInput) x.getLong(i)
        else java.math.BigDecimal
          .valueOf(x.getFloat(i).toDouble * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP)
          .doubleValue().toLong
      i += 1
    }
    val cs = centArr
    val out = new Array[Any](cs.length)
    var j = 0
    while (j < cs.length) {
      val c = cs(j)
      var d = 0L
      var k = 0
      while (k < dim) {
        val t = eq(k) - c(k)
        d += t * t
        k += 1
      }
      out(j) = InternalRow(d, idArr(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ivfIds", idArr, "long[]")
    val centsRef = ctx.addReferenceObj("ivfCents", centArr, "long[][]")
    val k = centArr.length
    nullSafeCodeGen(ctx, ev, x => {
      val eq = ctx.freshName("eq")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      val bad = ctx.freshName("bad")
      val load =
        if (microInput) s"$eq[$i] = $x.getLong($i);"
        else
          s"""$eq[$i] = (long) java.math.BigDecimal
             |      .valueOf(((double) $x.getFloat($i)) * 1.0E6)
             |      .setScale(0, java.math.RoundingMode.HALF_UP)
             |      .doubleValue();""".stripMargin
      s"""
         |if ($x.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $bad = false;
         |  long[] $eq = new long[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($x.isNullAt($i)) { $bad = true; break; }
         |    $load
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    Object[] $out = new Object[$k];
         |    for (int $j = 0; $j < $k; $j++) {
         |      long[] $c = $centsRef[$j];
         |      long $d = 0L;
         |      for (int $m = 0; $m < $dim; $m++) {
         |        long $t = $eq[$m] - $c[$m];
         |        $d += $t * $t;
         |      }
         |      $out[$j] =
         |        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |          new Object[]{ java.lang.Long.valueOf($d),
         |            java.lang.Long.valueOf($idsRef[$j]) });
         |    }
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** [[IvfCells]] with the codebook as a COLUMN child instead of a
  * shipped literal — the assignment kernel of the PER-TOP (local)
  * residual sub-codebooks the two-level quantizer trains (r20): each
  * probed top cell carries its OWN k2-entry sub-codebook, attached by
  * a broadcast join keyed on the top id, so the codebook relation
  * scales as (effective cells)·dim rows of BROADCAST state with no
  * plan-literal ceiling (a literal combined codebook is ~134 MB of
  * plan at the 33M-vector sizing — a non-starter; the broadcast is
  * the same bytes where they belong). Same primitive loops, same
  * micro-long arithmetic, same (dist, cell) struct table out, same
  * whole-array-NULL strictness on ragged input — only the codebook's
  * residence changes. `subs` elements are struct<cell: long,
  * v: array<long>> in cell order.
  */
case class IvfCellsLocal(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("cell", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true
  override def prettyName: String = "ivf_cells_local"

  override protected def nullSafeEval(micro: Any, subs: Any): Any = {
    val x = micro.asInstanceOf[ArrayData]
    val sb = subs.asInstanceOf[ArrayData]
    val dim = x.numElements()
    val eq = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      eq(i) = x.getLong(i)
      i += 1
    }
    val n = sb.numElements()
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      if (sb.isNullAt(j)) return null
      val row = sb.getStruct(j, 2)
      val cv = row.getArray(1)
      if (cv.numElements() != dim) return null
      var d = 0L
      var k = 0
      while (k < dim) {
        val t = eq(k) - cv.getLong(k)
        d += t * t
        k += 1
      }
      out(j) = InternalRow(d, row.getLong(0))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, sb) => {
      val dim = ctx.freshName("dim")
      val eq = ctx.freshName("eq")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val nSubs = ctx.freshName("nSubs")
      val row = ctx.freshName("row")
      val cv = ctx.freshName("cv")
      val bad = ctx.freshName("bad")
      s"""
         |int $dim = $x.numElements();
         |boolean $bad = false;
         |long[] $eq = new long[$dim];
         |for (int $i = 0; $i < $dim; $i++) {
         |  if ($x.isNullAt($i)) { $bad = true; break; }
         |  $eq[$i] = $x.getLong($i);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $nSubs = $sb.numElements();
         |  Object[] $out = new Object[$nSubs];
         |  for (int $j = 0; $j < $nSubs && !$bad; $j++) {
         |    if ($sb.isNullAt($j)) { $bad = true; break; }
         |    org.apache.spark.sql.catalyst.InternalRow $row =
         |      $sb.getStruct($j, 2);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv =
         |      $row.getArray(1);
         |    if ($cv.numElements() != $dim) { $bad = true; break; }
         |    long $d = 0L;
         |    for (int $m = 0; $m < $dim; $m++) {
         |      long $t = $eq[$m] - $cv.getLong($m);
         |      $d += $t * $t;
         |    }
         |    $out[$j] =
         |      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |        new Object[]{ java.lang.Long.valueOf($d),
         |          java.lang.Long.valueOf($row.getLong(0)) });
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IvfCells {
  /** The distance table as a Column over `embeddingCol`. */
  def cells(embedding: Column, codebook: Array[(Long, Array[Long])])
      : Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      IvfCells(
        org.apache.spark.sql.GraftColumnBridge.expression(embedding),
        codebook.map(_._1).toIndexedSeq,
        codebook.map(_._2.toIndexedSeq).toIndexedSeq))

  /** The same table over an ALREADY-QUANTIZED `array<long>` column —
    * the residual-space assignment of the two-level quantizer (r19):
    * identical loops, the quantization step skipped (residuals are
    * exact micro-unit differences; re-quantizing would be a no-op on
    * longs but the input type is long, not float).
    */
  def cellsMicro(micro: Column, codebook: Array[(Long, Array[Long])])
      : Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      IvfCells(
        org.apache.spark.sql.GraftColumnBridge.expression(micro),
        codebook.map(_._1).toIndexedSeq,
        codebook.map(_._2.toIndexedSeq).toIndexedSeq,
        microInput = true))

  /** The distance table against a PER-ROW codebook column (broadcast-
    * joined local sub-codebooks — [[IvfCellsLocal]]).
    */
  def cellsLocal(micro: Column, subs: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      IvfCellsLocal(
        org.apache.spark.sql.GraftColumnBridge.expression(micro),
        org.apache.spark.sql.GraftColumnBridge.expression(subs)))
}
