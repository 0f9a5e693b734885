package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit hashes of every word n-gram of a whitespace-NORMALIZED string,
  * in one pass over the bytes, with zero per-gram allocation.
  *
  * After `regexp_replace(lower(trim(text)), "\\s+", " ")`, a word n-gram
  * joined by single spaces is literally a byte span of the normalized
  * string — so instead of `split` → `transform`/`slice`/`array_join`
  * (one UTF8String per token PLUS one per gram) → `xxhash64`, this walks
  * the bytes once to find word starts and hashes each gram's span
  * directly with the same polynomial family as [[RollingShingleHash]].
  * Count-only consumers (overlap reports, KMV sketches, production-regime
  * minhash) never need the gram text back.
  *
  * Word semantics mirror `split(norm, " ")`: the empty string is one
  * empty word, words are the maximal spans between single spaces. Texts
  * with fewer than n words yield an empty array. Duplicate grams are
  * KEPT (this is the multiset; distinct-ness, when needed, is one
  * `array_distinct` or the downstream group-by).
  */
object WordNgramHash {

  /** All word n-gram span hashes of normalized `s`. Static so generated
    * code calls it directly inside the codegen span. */
  def hashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // word starts: 0, and every byte following a space
    var words = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') words += 1; i += 1 }
    val m = if (words >= n) words - n + 1 else 0
    val out = new Array[Long](m)
    if (m > 0) {
      val starts = new Array[Int](words)
      starts(0) = 0
      var w = 1
      i = 0
      while (i < len) { if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }; i += 1 }
      var g = 0
      while (g < m) {
        // span of words g .. g+n-1: [starts(g), end) where end is the
        // byte before the space starting word g+n (or len for the tail)
        val from = starts(g)
        val until = if (g + n < words) starts(g + n) - 1 else len
        var h = 0L
        i = from
        while (i < until) { h = h * RollingShingleHash.B + ((bytes(i) & 0xff) + 1); i += 1 }
        out(g) = h
        g += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `graft_word_ngram_hash(norm_text, n)` — see [[WordNgramHash]].
  * Registered by [[GraftExtensions]]; `n` is captured at plan time. */
case class WordNgramHashExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_ngram_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_word_ngram_hash expects (STRING, n >= 1), got (${child.dataType.sql}, $n)")

  override protected def nullSafeEval(input: Any): Any =
    WordNgramHash.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgramHash.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashExpr =
    copy(child = newChild)
}
