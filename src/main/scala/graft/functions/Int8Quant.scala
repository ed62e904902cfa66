package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static kernel shared by interpreted eval and generated code. */
object Int8QuantUtil {
  /** Symmetric int8 quantization of one array<double> vector in a
    * single primitive pass: scale = max|x| / 127, codes =
    * floor(x/scale + 0.5) as int, max_err = max|code·scale − x|.
    *
    * Bit-replicates the composed HOF form (quantScaleHof /
    * quantCodesHof / dequantMaxErrHof in [[graft.llm.Similarity]]),
    * including the edges:
    *  - empty vector → (null scale, empty codes, null err) — exactly
    *    what array_max(empty) = NULL produces through the fold;
    *  - all-zero vector → scale 0.0 branch: all-zero codes, err 0.0;
    *  - null element → null code at that position, skipped by both
    *    maxes (array_max skips nulls);
    *  - NaN element → NaN scale (array_max orders NaN greatest), codes
    *    go through NaN/NaN arithmetic (→ (long) NaN = 0), NaN err —
    *    the same IEEE path the interpreted lambdas take;
    *  - floor’s double→long→int conversion chain is preserved
    *    verbatim (saturate at Long.MIN/MAX, then truncate to int).
    */
  def quant(a: ArrayData): GenericInternalRow = {
    val n = a.numElements()
    // pass 1: scale = array_max(|x|) / 127  (array_max skips nulls,
    // orders NaN greatest → plain `>` plus an isNaN latch replicates)
    var best = java.lang.Double.NEGATIVE_INFINITY
    var seen = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = java.lang.Math.abs(a.getDouble(i))
        if (!seen || v > best || java.lang.Double.isNaN(v)) best = v
        seen = true
      }
      i += 1
    }
    if (!seen) {
      // array_max(empty-or-all-null) is NULL → NULL scale; codes =
      // transform over the same elements (null lambda results), err =
      // array_max of nulls = NULL
      val codes = new Array[Any](n)
      return new GenericInternalRow(
        Array[Any](null, new GenericArrayData(codes), null))
    }
    val scale = best / 127.0
    val codes = new Array[Any](n)
    if (scale == 0.0) {
      // the when(scale === 0.0) branch: all-zero codes, zero error
      i = 0
      while (i < n) { codes(i) = 0; i += 1 }
      return new GenericInternalRow(
        Array[Any](scale, new GenericArrayData(codes), 0.0))
    }
    // pass 2: codes + reconstruction error in one loop
    var err = java.lang.Double.NEGATIVE_INFINITY
    var errSeen = false
    i = 0
    while (i < n) {
      if (a.isNullAt(i)) codes(i) = null
      else {
        val x = a.getDouble(i)
        val c = java.lang.Math.floor(x / scale + 0.5).toLong.toInt
        codes(i) = c
        val e = java.lang.Math.abs(c.toDouble * scale - x)
        if (!errSeen || e > err || java.lang.Double.isNaN(e)) err = e
        errSeen = true
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](scale, new GenericArrayData(codes),
      if (errSeen) err else null))
  }
}

/** Struct(scale D?, codes array<int?>, max_err D?) — the one-pass
  * native form of symmetric int8 embedding quantization. The composed
  * form is three CodegenFallback HOF passes per row (abs-transform,
  * code-transform, zip_with error) ≈ 3·dims interpreted lambda calls
  * on every embedding the corpus ships — the PqEncodeCodes pathology.
  * Parity vs the retained HOF baselines is pinned in QuantKernelSpec.
  */
case class Int8QuantStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = true),
    StructField("codes", ArrayType(IntegerType, containsNull = true),
      nullable = false),
    StructField("max_err", DoubleType, nullable = true)))
  override def prettyName: String = "int8_quant_stats"

  override def nullSafeEval(v: Any): Any =
    Int8QuantUtil.quant(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Int8QuantUtil.quant($v);")

  override protected def withNewChildInternal(
      newChild: Expression): Int8QuantStats = copy(child = newChild)
}
