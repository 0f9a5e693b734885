package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass document quality statistics.
  *
  * The composed quality projection ([[graft.operators.TextAnalysis
  * .qualityComponents]]) walks every document ELEVEN times: a regex
  * split for the whitespace token count, a regex replace to count
  * punctuation, a lowercase copy, and one regex split per stopword
  * (eight). At the 100x rung that projection alone is a 40 s-class
  * scan. This expression computes the same four integers in two byte
  * walks (original text + its lowercase image) with zero regex and
  * zero intermediate arrays, and adds the nonempty-token count the
  * surprise operators need for their corpus-total metadata job
  * (replacing an explode+count over every token with a per-doc sum).
  *
  * Field-by-field parity contracts with the composed columns (pinned
  * by QualityStatsSpec on adversarial corpora):
  *
  *  - `n_chars`  == `length(text)` — code points, stepped with
  *    [[UTF8String.numBytesForFirstByte]] exactly as `numChars` does.
  *  - `n_tokens` == `size(split(trim(text), "\\s+"))`. Spark `trim`
  *    strips 0x20 only; Java `split` with limit -1 keeps boundary
  *    empties, so the field count is (whitespace runs) + 1 over the
  *    space-trimmed slice, and an empty slice still counts 1 (the
  *    single empty field Java returns). Java regex `\s` is the six
  *    ASCII whitespace chars — all single bytes in UTF-8.
  *  - `n_punct`  == `length(text) - length(regexp_replace(text,
  *    "[^A-Za-z0-9\\s]", ""))`: code points that are neither ASCII
  *    alphanumeric nor ASCII whitespace (every non-ASCII code point
  *    counts — the regex classes are ASCII-only).
  *  - `n_stop`   == the sum of `size(split(lower(text), "\\b<w>\\b",
  *    -1)) - 1` over the eight C4 stopwords. `\b` in Java's default
  *    word model fires only at `[A-Za-z0-9_]` run edges, so a
  *    bounded match is exactly a maximal word-char run equal to the
  *    stopword; runs are detected on the bytes of
  *    `UTF8String.toLowerCase` (the same kernel Spark's `lower`
  *    uses), where word chars are all ASCII.
  *  - `n_words`  == the number of nonempty whitespace-delimited
  *    tokens of `trim(text)` — equal to
  *    `size(filter(split(..., "\\s+"), t -> length(t) > 0))` and,
  *    because Unicode lowercasing never maps into or out of ASCII
  *    whitespace, also to the nonempty token count of
  *    `lower(trim(text))` that the unigram/bigram surprise operators
  *    aggregate corpus-wide.
  */
object QualityStats {

  /** The C4-style stopword list [[graft.operators.TextAnalysis
    * .qualityComponents]] scores against, as byte arrays for direct
    * run comparison. */
  private val StopWords: Array[Array[Byte]] =
    Array("the", "and", "of", "to", "a", "in", "is", "it")
      .map(_.getBytes("UTF-8"))

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  @inline private def isAlnum(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  @inline private def isWordChar(b: Byte): Boolean =
    isAlnum(b) || b == '_'

  /** The struct row: (n_chars, n_tokens, n_punct, n_stop, n_words). */
  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val len = bytes.length

    // -- walk 1: original text — chars, punct, token fields, words ----
    var nChars = 0
    var nPunct = 0
    var i = 0
    while (i < len) {
      val b = bytes(i)
      nChars += 1
      if (b >= 0) { // ASCII
        if (!isAlnum(b) && !isWs(b)) nPunct += 1
        i += 1
      } else { // non-ASCII code point: always "punct" under the ASCII classes
        nPunct += 1
        i += UTF8String.numBytesForFirstByte(b)
      }
    }

    // space-trimmed slice [t0, t1) — Spark trim strips 0x20 only
    var t0 = 0
    var t1 = len
    while (t0 < t1 && bytes(t0) == ' ') t0 += 1
    while (t1 > t0 && bytes(t1 - 1) == ' ') t1 -= 1

    var nTokens = 1 // Java split(limit=-1) yields one field even when empty
    var nWords = 0
    var inWs = false
    var inWord = false
    i = t0
    while (i < t1) {
      val b = bytes(i)
      val ws = b >= 0 && isWs(b)
      if (ws && !inWs) nTokens += 1
      if (!ws && !inWord) nWords += 1
      inWs = ws
      inWord = !ws
      i += 1
    }

    // -- walk 2: lowercase image — stopword run counts -----------------
    val lowered = s.toLowerCase
    val lb = lowered.getBytes
    val llen = lb.length
    var nStop = 0
    i = 0
    while (i < llen) {
      val b = lb(i)
      if (b >= 0 && isWordChar(b)) {
        val start = i
        while (i < llen && { val c = lb(i); c >= 0 && isWordChar(c) }) i += 1
        val runLen = i - start
        if (runLen <= 3) {
          var w = 0
          while (w < StopWords.length) {
            val sw = StopWords(w)
            if (sw.length == runLen) {
              var j = 0
              while (j < runLen && lb(start + j) == sw(j)) j += 1
              if (j == runLen) { nStop += 1; w = StopWords.length - 1 }
            }
            w += 1
          }
        }
      } else {
        i += (if (b >= 0) 1 else UTF8String.numBytesForFirstByte(b))
      }
    }

    InternalRow(nChars, nTokens, nPunct, nStop, nWords)
  }

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false)))
}

/** `graft_quality_stats(text)` — see [[QualityStats]]. One static call
  * per row inside whole-stage codegen; the five consumer columns each
  * read a field of the same subtree, which projection-level common
  * subexpression elimination collapses to a single compute per row. */
case class QualityStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = QualityStats.schema
  override def prettyName: String = "graft_quality_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_quality_stats expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    QualityStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): QualityStatsExpr =
    copy(child = newChild)
}
