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
  def hashes(s: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(hashesRaw(s, n))

  /** The gram-hash SET of normalized `s`: distinct hashes, sorted
    * ascending (signed) — the shape [[SortedOverlap]] merge-counts.
    * One call fuses hash walk + sort + dedupe with zero intermediates;
    * static so generated code calls it inside the codegen span. */
  def hashSet(s: UTF8String, n: Int): ArrayData = {
    val h = hashesRaw(s, n)
    java.util.Arrays.sort(h)
    var o = 0
    var i = 0
    while (i < h.length) {
      if (o == 0 || h(i) != h(o - 1)) { h(o) = h(i); o += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (o == h.length) h else java.util.Arrays.copyOf(h, o))
  }

  /** [[hashes]] as a raw primitive array. */
  def hashesRaw(s: UTF8String, n: Int): Array[Long] = {
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
    out
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

/** `graft_word_ngram_hash_set(norm_text, n)` — [[WordNgramHash.hashSet]]:
  * the distinct gram hashes sorted ascending, the join payload of the
  * hashed exact-Jaccard path (hashes-not-text through the shuffle).
  * Registered by [[GraftExtensions]]; `n` is captured at plan time. */
case class WordNgramHashSetExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_ngram_hash_set"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_word_ngram_hash_set expects (STRING, n >= 1), got (${child.dataType.sql}, $n)")

  override protected def nullSafeEval(input: Any): Any =
    WordNgramHash.hashSet(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgramHash.hashSet($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashSetExpr =
    copy(child = newChild)
}

/** Intersection size of two SORTED-ascending long arrays by linear
  * merge — O(|a|+|b|), no per-pair hash-set build, no output array.
  * `array_intersect`/`array_union` each build a hash set AND an output
  * array per pair; set-overlap consumers (Jaccard, containment) only
  * ever need the count, and union size is |a|+|b|−|∩|. */
object SortedOverlap {
  def count(a: org.apache.spark.sql.catalyst.util.ArrayData,
            b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** `graft_sorted_overlap(a, b)` — see [[SortedOverlap]]. Both inputs
  * must be sorted ascending (as [[WordNgramHashSetExpr]] emits). */
case class SortedOverlapExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_sorted_overlap"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(c => c.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_overlap expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedOverlap.count(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedOverlap.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlapExpr =
    copy(left = newLeft, right = newRight)
}
