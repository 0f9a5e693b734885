package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling hashes of every k-byte shingle of a string, in ONE
  * pass over the bytes.
  *
  * The `functions`-only shingle path builds a substring per window and
  * hashes each from scratch — O(text·k) byte traffic plus one UTF8String
  * allocation per window. This expression walks the bytes once
  * (`h' = (h − first·B^(k−1))·B + next`, wrapping mod 2⁶⁴), allocating
  * only the output array: O(text) work, zero per-window allocation —
  * the difference is measured in `SCALE.md`. Fingerprint semantics are
  * unchanged downstream (winnowing just needs a deterministic hash
  * family; oracle-gated queries keep the portable md5 regime).
  *
  * Bytes, not codepoints: the normalized corpus text this feeds is
  * lowercased/whitespace-collapsed; multi-byte codepoints simply
  * contribute their bytes to each window deterministically.
  */
object RollingShingleHash {

  /** Polynomial base — a prime comfortably mixing byte values; collisions
    * at 64 bits are vanishingly rare at corpus scale and harmless to
    * winnowing (a false shared fingerprint just becomes a verified-away
    * candidate). */
  val B = 1000003L

  /** All k-shingle hashes of `s` (≥1 entry: shorter strings hash whole).
    * Static so generated code calls it directly inside the codegen span. */
  def hashes(s: UTF8String, k: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(hashesRaw(s, k))

  /** [[hashes]] as a raw primitive array — shared with the fused
    * winnowing expression ([[WinnowFps]]), which consumes the hashes
    * in-place instead of materializing a Spark array between stages. */
  def hashesRaw(s: UTF8String, k: Int): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    val kk = math.max(k, 1)
    val m = if (n <= kk) 1 else n - kk + 1
    val lim = math.min(kk, n)
    val out = new Array[Long](m)
    var pw = 1L
    var j = 0
    while (j < lim - 1) { pw *= B; j += 1 }
    var h = 0L
    j = 0
    while (j < lim) { h = h * B + ((bytes(j) & 0xff) + 1); j += 1 }
    out(0) = h
    var i = 1
    while (i < m) {
      h = (h - ((bytes(i - 1) & 0xff) + 1) * pw) * B + ((bytes(i + kk - 1) & 0xff) + 1)
      out(i) = h
      i += 1
    }
    out
  }
}

/** `graft_rolling_shingle_hash(text, k)` — see [[RollingShingleHash]].
  * Registered by [[GraftExtensions]]; `k` is captured at plan time. */
case class RollingShingleHashExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_shingle_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_shingle_hash expects (STRING, k >= 1), got (${child.dataType.sql}, $k)")

  override protected def nullSafeEval(input: Any): Any =
    RollingShingleHash.hashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingShingleHash.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): RollingShingleHashExpr =
    copy(child = newChild)
}
