package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * square-accumulate — microseconds per row at the same shape.
  *
  * Arithmetic fidelity (oracle parity depends on it): quantization is
  * EXACTLY Spark's `CAST(round(CAST(x AS DOUBLE) * 1e6, 0) AS
  * BIGINT)` — `BigDecimal.valueOf(v).setScale(0, HALF_UP)` then
  * truncating cast, the same path `Round` + `Cast` take — and
  * distances accumulate in Long in index order, exactly the
  * `aggregate` fold. Output order is codebook order; struct
  * comparison downstream breaks distance ties by cell id, unchanged.
  *
  * Length contract: an embedding whose length differs from the
  * codebook's dim yields NULL (the composed `zip_with` nulled the
  * whole fold the same way).
  */
case class IvfCells(child: Expression, ids: Array[Long],
    cents: Array[Array[Long]]) extends UnaryExpression
    with CodegenFallback {

  private val dim = if (cents.isEmpty) 0 else cents(0).length

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
      eq(i) = java.math.BigDecimal
        .valueOf(x.getFloat(i).toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP)
        .doubleValue().toLong
      i += 1
    }
    val out = new Array[Any](cents.length)
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var d = 0L
      var k = 0
      while (k < dim) {
        val t = eq(k) - c(k)
        d += t * t
        k += 1
      }
      out(j) = InternalRow(d, ids(j))
      j += 1
    }
    new GenericArrayData(out)
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
        codebook.map(_._1), codebook.map(_._2)))
}
