package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass every
  * text-curation pipeline runs before hashing or deduplicating: the
  * same visible text arrives from the web in composed (é = U+00E9) and
  * decomposed (e + U+0301) encodings, and every byte-keyed operator in
  * this library (exact dedup, minhash, simhash, winnowing) would treat
  * them as different documents. Normalizing first makes the hash
  * families see ONE key per canonical text. NFC (not NFKC) on purpose:
  * canonical composition is lossless, while compatibility folding
  * (ﬁ → fi, ² → 2) destroys distinctions a corpus may care about —
  * callers wanting NFKC-style folding should do it as an explicit
  * separate policy step.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan that short
  * circuits the (dominant) already-NFC case without allocating — ASCII
  * and most web text return immediately. */
object NfcNormalize {

  /** NFC-normalize `s`. Static so generated code calls it directly
    * inside the codegen span. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** `graft_nfc_normalize(text)` — see [[NfcNormalize]]. Registered by
  * [[GraftExtensions]]. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc_normalize expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}
