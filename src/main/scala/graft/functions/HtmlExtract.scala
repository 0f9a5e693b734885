package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native twin of [[graft.operators.Html.extractText]]'s
  * regex/HOF composition — semantics replicated operation-for-operation
  * (the spec pins doc-for-doc equality on corpus-built markup):
  *
  *   1. `<script…>…</script>`, `<style…>…</style>` subtrees and
  *      `<!--…-->` comments → one space each, sequentially (a style
  *      block inside a script subtree vanishes with the script, exactly
  *      as the staged regex passes behave);
  *   2. the inner text of every `<p…>…</p>` block, in order;
  *   3. per block: tags → spaces, whitespace squeezed, entities decoded
  *      one level (`&lt; &gt; &quot; &#39; &nbsp;` then `&amp;` last);
  *      anchor inner texts (`<a…>…</a>`) identically;
  *   4. keep iff text is non-empty and anchor-chars/text-chars ≤ maxLd.
  *
  * Why native: the HOF path runs ~15 interpreted regex passes per doc
  * plus two `regexp_extract_all` INSIDE a `transform` lambda (expression
  * interpreter, per block) — measured 45 s rerun floor at the 100×
  * rung for q_html_extract, pure CPU. This expression walks the bytes
  * with explicit scans and allocates only the per-block builders.
  *
  * Unmatched-open semantics match the regex engine's: an opening
  * `<script`/`<p`/`<a` with no closing tag anywhere after it can never
  * match (nor can any later same-tag open, whose close would have to
  * lie even further right), so the scan emits the rest verbatim and
  * stops — byte-identical to a failed non-greedy match.
  */
object HtmlExtract {

  /** Case-insensitive indexOf. */
  private def findCi(s: String, from: Int, pat: String): Int = {
    val n = s.length - pat.length
    var i = math.max(from, 0)
    while (i <= n) {
      if (s.regionMatches(true, i, pat, 0, pat.length)) return i
      i += 1
    }
    -1
  }

  /** Remove `<tag[^>]*>[\s\S]*?</tag>` spans (case-insensitive),
    * replacing each with one space — `exactClose` (comments) skips the
    * `[^>]*>` open-tag tail. */
  private def removeSpans(s: String, open: String, close: String,
                          openNeedsGt: Boolean): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val m = findCi(s, i, open)
      if (m < 0) { sb.append(s, i, s.length); i = s.length }
      else {
        val afterOpen =
          if (!openNeedsGt) m + open.length
          else {
            val gt = s.indexOf('>', m + open.length)
            if (gt < 0) -1 else gt + 1
          }
        val end = if (afterOpen < 0) -1 else findCi(s, afterOpen, close)
        if (end < 0) { sb.append(s, i, s.length); i = s.length }
        else {
          sb.append(s, i, m).append(' ')
          i = end + close.length
        }
      }
    }
    sb.toString
  }

  /** `\s` of the squeeze regex. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private val entities = Array(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  private def startsWithAt(sb: java.lang.StringBuilder, i: Int, pat: String): Boolean = {
    if (sb.length - i < pat.length) return false
    var j = 0
    while (j < pat.length) {
      if (sb.charAt(i + j) != pat.charAt(j)) return false
      j += 1
    }
    true
  }

  /** Tags → spaces (`<[^>]+>` — `<>` and unclosed `<` stay literal),
    * whitespace runs → one space, TRIMMED, then entities decoded one
    * level — the exact stage order of the HOF twin, so a decoded
    * `&nbsp;` at the text edge survives trimming just as it does there.
    * The ordered single decode scan over `&` is equivalent to the
    * staged replace chain: no entity replacement emits a `&` except
    * `&amp;`'s, which is tried last and never rescanned in either
    * regime. */
  private[functions] def blockText(b: String): String = {
    val st = new java.lang.StringBuilder(b.length)
    var i = 0
    while (i < b.length) {                       // tag strip
      val c = b.charAt(i)
      if (c == '<') {
        val gt = b.indexOf('>', i + 1)
        if (gt > i + 1) { st.append(' '); i = gt + 1 }
        else { st.append(c); i += 1 }
      } else { st.append(c); i += 1 }
    }
    val sq = new java.lang.StringBuilder(st.length)
    i = 0
    while (i < st.length) {                      // squeeze
      if (isWs(st.charAt(i))) {
        while (i < st.length && isWs(st.charAt(i))) i += 1
        sq.append(' ')
      } else { sq.append(st.charAt(i)); i += 1 }
    }
    var a = 0                                    // trim (spaces only)
    var z = sq.length
    while (a < z && sq.charAt(a) == ' ') a += 1
    while (z > a && sq.charAt(z - 1) == ' ') z -= 1
    val out = new java.lang.StringBuilder(z - a)
    i = a
    while (i < z) {                              // decode one level
      val c = sq.charAt(i)
      if (c == '&') {
        var hit = false
        var e = 0
        while (!hit && e < entities.length) {
          val (from, to) = entities(e)
          if (i + from.length <= z && startsWithAt(sq, i, from)) {
            out.append(to); i += from.length; hit = true
          }
          e += 1
        }
        if (!hit) { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Inner spans of `<tag[^>]*>…</tag>` (case-insensitive), in order. */
  private def innerSpans(s: String, tag: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    val open = "<" + tag
    val close = "</" + tag + ">"
    var i = 0
    while (i < s.length) {
      val m = findCi(s, i, open)
      if (m < 0) i = s.length
      else {
        val gt = s.indexOf('>', m + open.length)
        if (gt < 0) i = s.length
        else {
          val end = findCi(s, gt + 1, close)
          if (end < 0) i = s.length
          else { out.add(s.substring(gt + 1, end)); i = end + close.length }
        }
      }
    }
    out
  }

  private def cp(s: String): Int = s.codePointCount(0, s.length)

  /** (n_blocks, n_kept, clean_text) of one HTML document. Static so
    * generated code calls it directly inside the codegen span. */
  def extract(html: UTF8String, maxLd: Double): InternalRow = {
    val cleaned = removeSpans(removeSpans(removeSpans(html.toString,
      "<script", "</script>", openNeedsGt = true),
      "<style", "</style>", openNeedsGt = true),
      "<!--", "-->", openNeedsGt = false)
    val blocks = innerSpans(cleaned, "p")
    val clean = new java.lang.StringBuilder
    var kept = 0L
    var bi = 0
    while (bi < blocks.size) {
      val b = blocks.get(bi)
      val txt = blockText(b)
      val n = cp(txt)
      if (n > 0) {
        val anchors = innerSpans(b, "a")
        var aLen = 0
        if (!anchors.isEmpty) {
          val ab = new java.lang.StringBuilder
          var ai = 0
          while (ai < anchors.size) {
            if (ai > 0) ab.append(' ')
            ab.append(anchors.get(ai))
            ai += 1
          }
          aLen = cp(blockText(ab.toString))
        }
        if (aLen.toDouble / math.max(n, 1) <= maxLd) {
          if (kept > 0) clean.append(' ')
          clean.append(txt)
          kept += 1
        }
      }
      bi += 1
    }
    new GenericInternalRow(Array[Any](blocks.size.toLong, kept,
      UTF8String.fromString(clean.toString)))
  }
}

/** `graft_html_extract(html, maxLinkDensity)` — see [[HtmlExtract]].
  * Registered by [[GraftExtensions]]; maxLd is captured at plan time. */
case class HtmlExtractExpr(child: Expression, maxLd: Double)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_blocks", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))
  override def prettyName: String = "graft_html_extract"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_html_extract expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    HtmlExtract.extract(input.asInstanceOf[UTF8String], maxLd)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HtmlExtract.extract($c, ${maxLd}D)")

  override protected def withNewChildInternal(newChild: Expression): HtmlExtractExpr =
    copy(child = newChild)
}
