package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static kernel shared by interpreted eval and generated code. */
object SimHash64Util {
  /** 64-bit SimHash: per-token 64-bit hash, signed bit-vote, sign →
    * bit. Deterministic; token hash = two murmur3 string hashes packed.
    */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    if (n == 0) return 0L
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        val t = tokens.getUTF8String(j).toString
        // two INDEPENDENT seeds, not hash(t)/hash(t.reverse): a
        // palindromic token (every single-char token — 'a', digits,
        // CJK chars) reverses to itself, which made the packed halves
        // identical and correlated fingerprint bit i with bit i+32,
        // weakening the pigeonhole-LSH chunk independence the
        // Hamming<=3 calibration assumes
        val h = scala.util.hashing.MurmurHash3.stringHash(t).toLong << 32 |
          (scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c)
            .toLong & 0xffffffffL)
        var i = 0
        while (i < 64) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }
}

/** Native Catalyst expression for SimHash over a token array — stays
  * inside whole-stage codegen (no ScalaUDF encode/decode per row),
  * which matters when fingerprinting billions of documents.
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    SimHash64Util.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64Util.compute($c)")

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}
