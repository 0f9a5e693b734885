package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word n-gram repetition statistics — the doc-local core
  * of the Gopher/C4 repetition-ratio signal, computed entirely per row.
  *
  * The frame-scale shape this replaces exploded every n-gram occurrence
  * and hash-aggregated (doc, gram) then (doc) — two corpus-gram-sized
  * shuffles whose row count is ∝ total grams. The signal never needs to
  * leave the row: on the normalized text (lowercased, whitespace
  * collapsed to single spaces — [[graft.operators.Dedup.tokens]]'
  * projection), every word n-gram joined by spaces is literally a byte
  * span, so one walk finds the word starts and an open-addressed map
  * counts EXACT gram occurrences with byte-equality verification on
  * probe (no collision regime at all — the oracle groups by gram text,
  * so unlike [[NgramCoverage]]'s ≥2 threshold a hash merge here could
  * shift the max). O(gram bytes) time, O(grams) memory per doc, zero
  * shuffle at any corpus scale.
  *
  * Returns struct(max_c, n_grams): the count of the most frequent
  * n-gram and the total occurrence count (`size - n + 1`, 0 when the
  * doc has fewer than n words — empty boundary words count as words,
  * exactly as the token-array form does).
  */
object RepetitionStats {

  def compute(s: UTF8String, n: Int): InternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    // word starts: 0, and every byte following a space (the normalized
    // text's only separator)
    var words = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') words += 1; i += 1 }
    val m = words - n + 1 // gram count (may be <= 0)
    if (m <= 0) return InternalRow(0, 0)
    val starts = new Array[Int](words + 1)
    starts(0) = 0
    var w = 1
    i = 0
    while (i < len) { if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }; i += 1 }
    starts(words) = len + 1 // sentinel: "start of the word past the end"

    // open-addressed exact-gram count map: key = byte span, hash =
    // polynomial over the span, equality = byte compare
    var cap = 16
    while (cap < m * 2) cap <<= 1
    val gStart = new Array[Int](cap)
    val gEnd = new Array[Int](cap)
    val counts = new Array[Int](cap)
    var maxC = 0
    var g = 0
    while (g < m) {
      val s0 = starts(g)
      val e0 = starts(g + n) - 1 // byte before the separator after word g+n-1
      var h = 1L
      i = s0
      while (i < e0) { h = h * 31L + (bytes(i) & 0xff); i += 1 }
      var idx = (java.lang.Long.hashCode(h) * 0x9E3779B9 >>> 16) & (cap - 1)
      var placed = false
      while (!placed) {
        if (counts(idx) == 0) {
          gStart(idx) = s0; gEnd(idx) = e0; counts(idx) = 1
          placed = true
        } else if (gEnd(idx) - gStart(idx) == e0 - s0 && {
          var a = gStart(idx); var b = s0; var eq = true
          while (eq && b < e0) { eq = bytes(a) == bytes(b); a += 1; b += 1 }
          eq
        }) {
          counts(idx) += 1
          placed = true
        } else idx = (idx + 1) & (cap - 1)
      }
      if (counts(idx) > maxC) maxC = counts(idx)
      g += 1
    }
    InternalRow(maxC, m)
  }

  val schema: StructType = StructType(Seq(
    StructField("max_c", IntegerType, nullable = false),
    StructField("n_grams", IntegerType, nullable = false)))
}

/** `graft_repetition_stats(norm_text, n)` — see [[RepetitionStats]].
  * `n` is captured at plan time (a foldable literal). */
case class RepetitionStatsExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "graft_repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_repetition_stats expects (STRING, n >= 1), got (${child.dataType.sql}, $n)")

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RepetitionStats.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}
