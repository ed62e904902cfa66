package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static kernel shared by interpreted eval and generated code. */
object MinHashSigUtil {
  /** One pass over the shingle hashes computes all `numHashes` slot
    * minima. Slot i re-hashes the base hash with seed chain
    * XXH64(h, XXH64(i, 42)) — bit-identical to Spark's
    * `xxhash64(lit(i), h)`, so signatures match the composed-expression
    * form this kernel replaces, INCLUDING null elements: Spark's hash
    * expressions skip a null child, leaving the accumulated seed
    * (XXH64.hashInt(i, 42)) as that element's hash, so a null
    * contributes the seed itself as a candidate minimum — it is not a
    * skipped element. (Shingle pipelines never produce null hashes;
    * the case is reachable through the registered `graft_minhash_sig`
    * SQL function on arbitrary arrays.) Empty input → all-null
    * signature (array_min-of-empty parity). */
  def compute(hashes: ArrayData, numHashes: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0)
      return new GenericArrayData(new Array[Any](numHashes))
    val seeds = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) { seeds(i) = XXH64.hashInt(i, 42L); i += 1 }
    val out = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (hashes.isNullAt(j)) {
        i = 0
        while (i < numHashes) {
          if (seeds(i) < out(i)) out(i) = seeds(i)
          i += 1
        }
      } else {
        val h = hashes.getLong(j)
        i = 0
        while (i < numHashes) {
          val v = XXH64.hashLong(h, seeds(i))
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for the MinHash signature over an
  * array<long> of shingle hashes: the composed form
  * `array((0 until k).map(i => array_min(transform(hs, h =>
  * xxhash64(lit(i), h)))))` materializes k intermediate arrays per row;
  * this computes the same k minima in ONE traversal inside whole-stage
  * codegen — the fingerprinting hot path at corpus scale. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any =
    MinHashSigUtil.compute(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigUtil.compute($c, $numHashes)")

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}
