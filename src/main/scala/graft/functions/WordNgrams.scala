package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of RAW text, one byte walk — the native twin of
  * `array_distinct(transform(slice(split(...))))`
  * ([[graft.operators.Dedup.ngramsOfTokens]] over
  * [[graft.operators.Dedup.tokens]]), for call sites that need the gram
  * STRINGS themselves (exact-match joins: decontamination against a
  * benchmark gram set), not just their hashes or minima.
  *
  * Same normalization parity story as the text-direct minhash
  * expressions ([[MinHashSig]]): `UTF8String.trim`/`toLowerCase` are the
  * kernels Spark's `trim`/`lower` call; word spans over the bytes keep
  * the split-boundary empty-word semantics; a gram's text is its word
  * spans joined by single 0x20 bytes (whitespace runs collapse to one
  * space in the normalized form, so this is byte-identical to the
  * declarative `array_join`). Deduplication is EXACT (polynomial hash
  * probes verified by word-sequence byte compare) and keeps first-
  * occurrence order, matching `array_distinct`. Gram strings are
  * allocated only once per DISTINCT gram — the declarative chain
  * allocated every token, every gram occurrence, and the distinct
  * hash set on top.
  *
  * Fewer than n words → NULL (explode emits nothing — same rows as the
  * declarative empty array; the minhash expressions' convention).
  */
object WordNgrams {

  @inline private def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def distinctGrams(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.trim().toLowerCase().getBytes
    val len = bytes.length
    // word spans with boundary empties (see MinHashSig.wordSpans — local
    // copy keeps both walks self-contained and JIT-friendly)
    val starts = new Array[Int](len / 2 + 3)
    val ends = new Array[Int](len / 2 + 3)
    var words = 0
    if (len == 0) { starts(0) = 0; ends(0) = 0; words = 1 }
    else {
      var i = 0
      if (isWsByte(bytes(0))) { starts(0) = 0; ends(0) = 0; words = 1 }
      while (i < len) {
        if (!isWsByte(bytes(i))) {
          val s0 = i
          while (i < len && !isWsByte(bytes(i))) i += 1
          starts(words) = s0; ends(words) = i; words += 1
        } else i += 1
      }
      if (isWsByte(bytes(len - 1))) { starts(words) = len; ends(words) = len; words += 1 }
    }
    val m = words - n + 1
    if (m <= 0) return null

    // exact dedupe: open-addressed map keyed by first-word index, hash =
    // polynomial over the gram's virtual bytes (words + single spaces),
    // equality = word-sequence byte compare
    var cap = 16
    while (cap < m * 2) cap <<= 1
    val slot = new Array[Int](cap) // first-word index + 1; 0 = empty
    val out = new java.util.ArrayList[AnyRef](math.min(m, 64))
    var g = 0
    while (g < m) {
      var h = 1L
      var w = g
      while (w < g + n) {
        var i = starts(w)
        while (i < ends(w)) { h = h * 31L + (bytes(i) & 0xff); i += 1 }
        if (w < g + n - 1) h = h * 31L + ' '.toInt
        w += 1
      }
      var idx = (java.lang.Long.hashCode(h) * 0x9E3779B9 >>> 16) & (cap - 1)
      var seen = false
      var done = false
      while (!done) {
        val other = slot(idx) - 1
        if (other < 0) { slot(idx) = g + 1; done = true }
        else {
          // compare gram g vs gram `other` word by word
          var eq = true
          var w2 = 0
          while (eq && w2 < n) {
            val la = ends(g + w2) - starts(g + w2)
            if (la != ends(other + w2) - starts(other + w2)) eq = false
            else {
              var a = starts(g + w2); var b = starts(other + w2)
              val ea = ends(g + w2)
              while (eq && a < ea) { eq = bytes(a) == bytes(b); a += 1; b += 1 }
            }
            w2 += 1
          }
          if (eq) { seen = true; done = true }
          else idx = (idx + 1) & (cap - 1)
        }
      }
      if (!seen) {
        // assemble the gram string once, on first occurrence
        var glen = n - 1
        var w3 = g
        while (w3 < g + n) { glen += ends(w3) - starts(w3); w3 += 1 }
        val gb = new Array[Byte](glen)
        var off = 0
        w3 = g
        while (w3 < g + n) {
          val l = ends(w3) - starts(w3)
          System.arraycopy(bytes, starts(w3), gb, off, l)
          off += l
          if (w3 < g + n - 1) { gb(off) = ' '; off += 1 }
          w3 += 1
        }
        out.add(UTF8String.fromBytes(gb))
      }
      g += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_word_ngrams(text, n)` — see [[WordNgrams]]. */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // fewer than n words → null
  override def prettyName: String = "graft_word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_word_ngrams expects (STRING, n >= 1), got (${child.dataType.sql}, $n)")

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.distinctGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WordNgrams.distinctGrams($c, $n);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}
