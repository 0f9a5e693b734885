package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE greedy encoder (Sennrich '16 §3.2 apply-merges-in-order)
  * — the codegen replacement for the nested higher-order `aggregate()`
  * fold `TextAnalysis.bpeEncode` originally ran: one Catalyst
  * expression-tree level PER MERGE meant the whole encode executed in
  * the expression interpreter, measured at 146 s for 500 k docs at the
  * 100× rung (and degrading ~3.5× more when re-run late in a
  * long-lived driver JVM — the interpreter is the suite's deepest
  * nest). Here the merge loop is a tight Scala scan: per word, split
  * to characters + `</w>`, then each merge is one left-to-right
  * non-overlapping pass ([[graft.operators.TextAnalysis.mergeSyms]] —
  * the SAME function the trainer uses, so encode ≡ train replay by
  * construction, pinned exhaustively in OperatorsSpec).
  *
  * The merge table rides as a reference object into the generated
  * code (a flat l,r,l,r array — plan-literal, like the quantizer
  * codebooks), so the call stays inside the whole-stage-codegen span.
  * The DuckDB oracle (marker-wrapped replace chain) is unchanged:
  * output is bit-identical to the fold it replaces. */
object BpeEncode {

  /** Encode whitespace-split words of `text` with `merges` (flat
    * l,r,l,r pairs), greedy-left per merge in table order. Static so
    * generated code calls it directly. */
  def encode(text: UTF8String, merges: Array[String]): ArrayData = {
    val words = text.toString.trim.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        // Seed symbols by CODE POINT, not UTF-16 code unit: the Spark
        // split(w, "") fold this replaces and the DuckDB oracle's w[i]
        // both index code points, and charAt-stepping would tear
        // surrogate pairs (emoji, CJK ext-B) into unpaired halves that
        // UTF8String.fromString mangles to '?'.
        val nCp = w.codePointCount(0, w.length)
        var syms = new Array[String](nCp + 1)
        var ci = 0
        var si0 = 0
        while (ci < w.length) {
          val step = Character.charCount(w.codePointAt(ci))
          syms(si0) = w.substring(ci, ci + step)
          ci += step
          si0 += 1
        }
        syms(nCp) = "</w>"
        var m = 0
        while (m < merges.length) {
          syms = graft.operators.TextAnalysis.mergeSyms(
            syms, merges(m), merges(m + 1))
          m += 2
        }
        var si = 0
        while (si < syms.length) {
          out += UTF8String.fromString(syms(si)); si += 1
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Pack a merge table for the SQL-facing literal: "l r|l r|…".
    * Symbols are whitespace-free by construction (they concatenate
    * characters of whitespace-split words plus `</w>`), so one space
    * and one pipe are unambiguous separators; validated on parse. */
  def pack(merges: Seq[(String, String)]): String = {
    require(merges.forall { case (l, r) =>
      l.nonEmpty && r.nonEmpty &&
        !s"$l$r".exists(c => c.isWhitespace || c == '|')
    }, "BPE merge symbols must be non-empty and free of whitespace/'|'")
    merges.map { case (l, r) => s"$l $r" }.mkString("|")
  }

  def unpack(packed: String): Array[String] =
    if (packed.isEmpty) Array.empty
    else packed.split("\\|").flatMap { pair =>
      val i = pair.indexOf(' ')
      require(i > 0 && i < pair.length - 1, s"malformed BPE merge pair: '$pair'")
      Array(pair.substring(0, i), pair.substring(i + 1))
    }
}

/** `graft_bpe_encode(text, 'l r|l r|…')` — see [[BpeEncode]].
  * Registered by [[GraftExtensions]]; the merge table must be a
  * string literal (it becomes part of the plan, like the anchor
  * codebooks of the quantizer family). */
case class BpeEncodeExpr(child: Expression, packedMerges: String)
    extends UnaryExpression {

  @transient private lazy val merges: Array[String] =
    BpeEncode.unpack(packedMerges)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeEncode.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}
