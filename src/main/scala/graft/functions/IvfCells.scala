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
}
