package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object NormalizeNFCUtil {
  /** Unicode NFC normalization (UAX #15 canonical composition).
    * Two fast paths: pure-ASCII bytes (NFC by construction — the
    * dominant corpus case) are detected by a raw byte scan and return
    * the INPUT UTF8String with genuinely zero allocation, no UTF-8→
    * UTF-16 decode at all; non-ASCII text that `Normalizer.isNormalized`
    * confirms (virtually all real CJK/Latin-1 prose) pays one decode
    * but no re-encode. Only genuinely decomposed text normalizes. */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) {
        val str = s.toString
        return if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
        else UTF8String.fromString(
          Normalizer.normalize(str, Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }
}

/** Native Catalyst expression for Unicode NFC normalization — the
  * canonicalization step a text pipeline runs before fingerprinting or
  * exact dedup (decomposed "é" and composed "é" must collide). Stays
  * inside whole-stage codegen; Spark ships no built-in normalizer, and
  * a ScalaUDF would pay encoder serde per row on the hottest column in
  * the corpus.
  */
case class NormalizeNFC(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"

  override def nullSafeEval(v: Any): Any =
    NormalizeNFCUtil.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeNFCUtil.nfc($c)")

  override protected def withNewChildInternal(c: Expression): NormalizeNFC =
    copy(child = c)
}
