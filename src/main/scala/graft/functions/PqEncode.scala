package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Static kernel shared by interpreted eval and generated code. */
object PqEncodeUtil {
  /** All-m nearest-centroid codes in one tight primitive pass.
    * `cb` is the m × k × subDim codebook flattened row-major; ties
    * take the LOWEST code (first strict improvement wins). */
  /** Nearest-centroid argmin for ONE subspace — the shared inner loop
    * of [[encode]] and [[encodeRecon]] (a fix to the search must hit
    * both paths once). */
  private def argmin(vec: ArrayData, cb: Array[Double], mi: Int,
                     k: Int, subDim: Int): Int = {
    val base = mi * subDim
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      val off = (mi * k + c) * subDim
      var d = 0.0
      var i = 0
      while (i < subDim) {
        val x = vec.getDouble(base + i) - cb(off + i)
        d += x * x
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  def encode(vec: ArrayData, cb: Array[Double], m: Int, k: Int,
             subDim: Int): ArrayData = {
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      codes(mi) = argmin(vec, cb, mi, k, subDim)
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** Codes AND the reconstruction (concat of the selected centroids)
    * in the same pass — the recon lookup is a codebook copy per
    * subspace, so emitting it here removes the composed form's
    * per-row `flatten(zip_with(...))` interpreted lambda. */
  def encodeRecon(vec: ArrayData, cb: Array[Double], m: Int, k: Int,
                  subDim: Int): org.apache.spark.sql.catalyst
                    .expressions.GenericInternalRow = {
    val codes = new Array[Int](m)
    val recon = new Array[Double](m * subDim)
    var mi = 0
    while (mi < m) {
      val best = argmin(vec, cb, mi, k, subDim)
      codes(mi) = best
      System.arraycopy(cb, (mi * k + best) * subDim, recon,
        mi * subDim, subDim)
      mi += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(codes), new GenericArrayData(recon)))
  }

  /** Reconstruction from a PERSISTED code array — the probe-time half
    * of the IVF-PQ index (codes are the stored artifact; decode happens
    * only on probed candidates). Null for a wrong-length code array, a
    * null code element, or a code outside [0, k) — a corrupt index row
    * must never reconstruct to a plausible vector. */
  def decode(codes: ArrayData, cb: Array[Double], m: Int, k: Int,
             subDim: Int): ArrayData = {
    if (codes.numElements() != m) return null
    val recon = new Array[Double](m * subDim)
    var mi = 0
    while (mi < m) {
      if (codes.isNullAt(mi)) return null
      val c = codes.getInt(mi)
      if (c < 0 || c >= k) return null
      System.arraycopy(cb, (mi * k + c) * subDim, recon,
        mi * subDim, subDim)
      mi += 1
    }
    new GenericArrayData(recon)
  }
}

/** Native product-quantization encoder: the m nearest-centroid codes
  * of a vector against an m × k × subDim codebook, as ONE expression
  * with a primitive loop.
  *
  * Why native (the repo's expression-preference order, applied): the
  * composed forms are pathological at PQ sizes. A per-centroid
  * `struct(dot, code)` forest is m·k Catalyst nodes (1024 at m=16,
  * k=64 — measured 9 s for 2000 rows once the generated method blows
  * past codegen limits), and `transform` over a codebook literal is a
  * higher-order function — CodegenFallback, ~2 µs per interpreted
  * lambda element, measured 4 s for the same 2000 rows. This kernel
  * is ~m·k·subDim fused multiply-adds per row (sub-µs).
  *
  * Ragged input (length ≠ m·subDim) yields NULL — the corrupt-vector
  * contract of [[DotProduct]]. Ties take the lowest code. L2 argmin
  * here ≡ the (dot − ‖c‖²/2) argmax form algebraically; only
  * borderline float ties could differ, and nothing oracle-visible
  * depends on individual codes (summary-oracle convention). */
case class PqEncodeCodes(child: Expression, codebook: Array[Double],
                         m: Int, k: Int, subDim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(codebook.length == m * k * subDim,
    s"codebook length ${codebook.length} != m*k*subDim ${m * k * subDim}")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    if (vec.numElements() != m * subDim) null
    else PqEncodeUtil.encode(vec, codebook, m, k, subDim)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      if ($v.numElements() != ${m * subDim}) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.PqEncodeUtil.encode(
          $v, $cbRef, $m, $k, $subDim);
      }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncodeCodes = copy(child = newChild)
}

/** struct<codes array<int>, recon array<double>> — [[PqEncodeCodes]]
  * plus the reconstruction in the SAME primitive loop. The composed
  * recon (`flatten(zip_with(sequence, codes, element_at·element_at))`)
  * is only m interpreted lambda elements per row, but it is still a
  * CodegenFallback in the hot encode projection AND re-reads the
  * codebook literal through two element_at indirections; fusing it
  * here is one `System.arraycopy` per subspace. Parity vs the
  * retained zip_with baseline is pinned in LlmSpec. Ragged input
  * (length ≠ m·subDim) yields a NULL struct — both fields null, the
  * same observable as the codes-null → zip_with-null chain. */
case class PqEncodeWithRecon(child: Expression, codebook: Array[Double],
                             m: Int, k: Int, subDim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(codebook.length == m * k * subDim,
    s"codebook length ${codebook.length} != m*k*subDim ${m * k * subDim}")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("codes",
        ArrayType(IntegerType, false), nullable = false),
      org.apache.spark.sql.types.StructField("recon",
        ArrayType(DoubleType, false), nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_recon"

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    if (vec.numElements() != m * subDim) null
    else PqEncodeUtil.encodeRecon(vec, codebook, m, k, subDim)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      if ($v.numElements() != ${m * subDim}) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.PqEncodeUtil.encodeRecon(
          $v, $cbRef, $m, $k, $subDim);
      }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncodeWithRecon = copy(child = newChild)
}

/** Decode a persisted PQ code array back to its reconstruction — the
  * probe-time half of the IVF-PQ index ([[PqEncodeWithRecon]] is the
  * build-time half). One `System.arraycopy` per subspace; null for any
  * corrupt row (wrong length, null element, code out of range) per the
  * PqEncodeUtil.decode contract. */
case class PqDecode(child: Expression, codebook: Array[Double],
                    m: Int, k: Int, subDim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(codebook.length == m * k * subDim,
    s"codebook length ${codebook.length} != m*k*subDim ${m * k * subDim}")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(DoubleType, false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_decode"

  override def nullSafeEval(v: Any): Any =
    PqEncodeUtil.decode(v.asInstanceOf[ArrayData], codebook, m, k, subDim)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.PqEncodeUtil.decode(
        $v, $cbRef, $m, $k, $subDim);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqDecode = copy(child = newChild)
}
