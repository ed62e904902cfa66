package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native per-vector kernels for the embedding hot paths. Every vector
  * in the ANN / semantic-dedup operators flows through unit
  * normalization and (for IVF) cell assignment; the HOF forms ran an
  * interpreted lambda per element (normalize) and an interpreted
  * struct-array sort per row (cell ranking). Parity with the retained
  * `*Hof` baselines is pinned in QuantKernelSpec, including the
  * Spark-ordering edges (NaN greatest, -0.0 == 0.0, null-dot structs
  * first ascending). */
object VecKernelUtil {

  /** Spark double ordering (SQLOrderingUtil.compareDoubles): NaN is
    * greatest, NaN == NaN, -0.0 == 0.0. */
  @inline private def cmpDouble(x: Double, y: Double): Int = {
    if (x < y) -1
    else if (x > y) 1
    else if (x == y) 0
    else {
      val nx = java.lang.Double.isNaN(x)
      val ny = java.lang.Double.isNaN(y)
      if (nx && ny) 0 else if (nx) 1 else -1
    }
  }

  /** `when(nrm === 0.0, vec).otherwise(transform(vec, _ / nrm))` —
    * null elements stay null, nrm == ±0.0 returns the input array
    * unchanged. */
  def normalizeByNorm(vec: ArrayData, nrm: Double): ArrayData = {
    if (nrm == 0.0) return vec
    val n = vec.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (vec.isNullAt(i)) null
               else java.lang.Double.valueOf(vec.getDouble(i) / nrm)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All-null array of the input's length — the `transform(vec,
    * _ / NULL)` result the HOF form yields for a null norm. */
  def allNulls(vec: ArrayData): ArrayData =
    new GenericArrayData(new Array[Any](vec.numElements()))

  /** `transform(slice(reverse(array_sort(array(struct(dot_i, i)…))),
    * 1, nProbe), _.cell)`: dot products against every centroid, cells
    * ranked by (dot DESC, cell DESC — the reverse of the ascending
    * struct sort, whose per-field ordering puts a NULL dot FIRST so a
    * ragged vector's all-null dots land LAST after the reverse in
    * cell-descending order), top `nProbe` cell ids. Cells are unique
    * so the sort is total — stability can't matter. */
  def topCellsByDot(vec: ArrayData, cents: Array[Array[Double]],
                    nProbe: Int): ArrayData = {
    val k = cents.length
    val dots = new Array[Double](k)
    val isNull = new Array[Boolean](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      if (vec.numElements() != cent.length) isNull(c) = true
      else {
        var s = 0.0
        var i = 0
        while (i < cent.length) {
          if (!vec.isNullAt(i)) s += vec.getDouble(i) * cent(i)
          i += 1
        }
        dots(c) = s
      }
      c += 1
    }
    // descending comparator = reverse of (dot asc nulls-first, cell asc)
    val idx = Array.range(0, k)
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val ia = a.intValue(); val ib = b.intValue()
        val cmp =
          if (isNull(ia) && isNull(ib)) 0
          else if (isNull(ia)) -1
          else if (isNull(ib)) 1
          else cmpDouble(dots(ia), dots(ib))
        val asc = if (cmp != 0) cmp else Integer.compare(ia, ib)
        -asc
      }
    })
    val take = math.min(nProbe, k)
    val out = new Array[Any](take)
    var i = 0
    while (i < take) { out(i) = boxed(i).intValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** vec[i] + sign·cents[cell][i] — the IVF-PQ residual (sign = −1)
    * and reconstruction (sign = +1) kernel. Caller guarantees cell is
    * a valid index and lengths match (the expression wrapper nulls
    * out every other case). Null elements stay null. */
  def combineWithCentroid(vec: ArrayData, cent: Array[Double],
                          sign: Double): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (vec.isNullAt(i)) null
               else java.lang.Double.valueOf(
                 vec.getDouble(i) + sign * cent(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The NULL-vector case: every fastDot(NULL, cent) is null, so the
    * ascending struct sort falls through to cell asc; reversed →
    * cells k−1, k−2, … (the HOF array is NON-null for a null vector —
    * only the dots inside the structs go null). */
  def topCellsNullVec(k: Int, nProbe: Int): ArrayData = {
    val take = math.min(nProbe, k)
    val out = new Array[Any](take)
    var i = 0
    while (i < take) { out(i) = k - 1 - i; i += 1 }
    new GenericArrayData(out)
  }
}

/** vec / nrm with the zero-norm passthrough — l2NormalizeStaged's
  * native form. Matches the HOF chain on EVERY input: null vec →
  * null, null nrm → array of nulls (`x / NULL` per element), ±0.0 nrm
  * → the unchanged input array. */
case class NormalizeByNorm(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "normalize_by_norm"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) null
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = right.eval(input)
      if (n == null) VecKernelUtil.allNulls(arr)
      else VecKernelUtil.normalizeByNorm(arr,
        n.asInstanceOf[java.lang.Double].doubleValue())
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${l.code}
      boolean ${ev.isNull} = ${l.isNull};
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${r.code}
        if (${r.isNull}) {
          ${ev.value} = graft.functions.VecKernelUtil.allNulls(${l.value});
        } else {
          ${ev.value} = graft.functions.VecKernelUtil.normalizeByNorm(
            ${l.value}, ${r.value});
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): NormalizeByNorm =
    copy(left = l, right = r)
}

/** Top-`nProbe` IVF cells by centroid dot product — cellsFor's
  * native form (the HOF chain builds k structs and runs an
  * interpreted array_sort per row). `cents` rows must share one
  * dimensionality. */
case class TopCellsByDot(child: Expression, cents: Seq[Seq[Double]],
                         nProbe: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(cents.nonEmpty, "need at least one centroid")
  require(cents.map(_.size).distinct.size == 1,
    "centroids must share one dimensionality")
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
  private val centArr = cents.map(_.toArray).toArray
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  // a NULL vector still ranks cells (all dots null → cell order) —
  // the HOF form's array() is non-null regardless of the input
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells_by_dot"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) VecKernelUtil.topCellsNullVec(centArr.length, nProbe)
    else VecKernelUtil.topCellsByDot(v.asInstanceOf[ArrayData], centArr,
      nProbe)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("cents", centArr, "double[][]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value};
      if (${c.isNull}) {
        ${ev.value} = graft.functions.VecKernelUtil.topCellsNullVec(
          ${centArr.length}, $nProbe);
      } else {
        ${ev.value} = graft.functions.VecKernelUtil.topCellsByDot(
          ${c.value}, $ref, $nProbe);
      }""", isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(
      newChild: Expression): TopCellsByDot = copy(child = newChild)
}

/** vec ± cents(cell) elementwise — the IVF-PQ residual (sign = −1,
  * corpus vector minus its coarse centroid) and reconstruction
  * (sign = +1, PQ-decoded residual plus the centroid). NULL when the
  * vector is null, the cell is null/out of range, or the vector's
  * length differs from the centroid dimensionality (the DotProduct
  * ragged contract — an invalid row can never produce a plausible
  * residual). Per-element IEEE add/sub is order-free, so the DuckDB
  * `list_transform(range(…), i -> v[i] ± cv[i])` replica is bit-exact
  * by construction. */
case class CellCentroidCombine(left: Expression, right: Expression,
                               cents: Seq[Seq[Double]], sign: Double)
    extends BinaryExpression with ExpectsInputTypes {
  require(cents.nonEmpty, "need at least one centroid")
  require(cents.map(_.size).distinct.size == 1,
    "centroids must share one dimensionality")
  require(sign == 1.0 || sign == -1.0, s"sign must be ±1, got $sign")
  private val centArr = cents.map(_.toArray).toArray
  private val dims = cents.head.size
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), IntegerType)
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "cell_centroid_combine"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) null
    else {
      val arr = v.asInstanceOf[ArrayData]
      val c = right.eval(input)
      if (c == null) null
      else {
        val cell = c.asInstanceOf[java.lang.Integer].intValue()
        if (cell < 0 || cell >= centArr.length ||
            arr.numElements() != dims) null
        else VecKernelUtil.combineWithCentroid(arr, centArr(cell), sign)
      }
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("cents", centArr, "double[][]")
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = code"""
      ${l.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${l.isNull}) {
        ${r.code}
        if (!${r.isNull} && ${r.value} >= 0 &&
            ${r.value} < ${centArr.length} &&
            ${l.value}.numElements() == $dims) {
          ${ev.value} = graft.functions.VecKernelUtil.combineWithCentroid(
            ${l.value}, $ref[${r.value}], $sign);
          ${ev.isNull} = false;
        }
      }""")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CellCentroidCombine =
    copy(left = l, right = r)
}
