package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Duplicate n-gram COVERAGE of one document (Gopher, Rae et al. '21):
  * the number of token positions covered by word n-grams that occur ≥2
  * times within the document — computed entirely PER ROW.
  *
  * The frame-scale shape this replaces exploded every gram occurrence,
  * hash-aggregated (doc, gram), re-exploded covered positions, and
  * `distinct()`-ed them — three shuffles per n, each carrying rows ∝
  * corpus gram count. The signal is doc-local, so none of that needs to
  * leave the row: one [[WordNgramHash]] byte walk for the gram-hash
  * multiset, an open-addressed primitive count map, and a boolean
  * position mask — O(grams) time and memory per doc, ZERO shuffle at
  * any corpus scale. Equivalence with the shuffled reference is pinned
  * per-doc in `OperatorsSpec`; same collision regime as the reference
  * (64-bit gram hashes — a within-doc collision merging two distinct
  * grams only matters if it flips a count past the ≥2 threshold).
  */
object NgramCoverage {

  /** Covered-position count of normalized `s` for word n-grams of `n`.
    * Static so generated code calls it directly inside the codegen
    * span. */
  def covered(s: UTF8String, n: Int): Int = {
    val h = WordNgramHash.hashesRaw(s, n)
    val m = h.length
    if (m == 0) return 0
    // occurrence counts of each distinct gram hash, open-addressed
    var cap = 16
    while (cap < m * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val counts = new Array[Int](cap)
    var g = 0
    while (g < m) {
      val v = h(g)
      var idx = (java.lang.Long.hashCode(v) * 0x9E3779B9 >>> 16) & (cap - 1)
      while (counts(idx) != 0 && keys(idx) != v) idx = (idx + 1) & (cap - 1)
      keys(idx) = v
      counts(idx) += 1
      g += 1
    }
    // token positions covered by any gram occurring >= 2 times
    val nToks = m + n - 1
    val mask = new Array[Boolean](nToks)
    g = 0
    while (g < m) {
      val v = h(g)
      var idx = (java.lang.Long.hashCode(v) * 0x9E3779B9 >>> 16) & (cap - 1)
      while (keys(idx) != v || counts(idx) == 0) idx = (idx + 1) & (cap - 1)
      if (counts(idx) >= 2) {
        var p = g
        while (p < g + n) { mask(p) = true; p += 1 }
      }
      g += 1
    }
    var c = 0
    var p = 0
    while (p < nToks) { if (mask(p)) c += 1; p += 1 }
    c
  }
}

/** `graft_ngram_coverage(norm_text, n)` — see [[NgramCoverage]].
  * Registered by [[GraftExtensions]]; `n` is captured at plan time. */
case class NgramCoverageExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ngram_coverage"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 2) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ngram_coverage expects (STRING, n >= 2), got (${child.dataType.sql}, $n)")

  override protected def nullSafeEval(input: Any): Any =
    NgramCoverage.covered(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramCoverage.covered($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramCoverageExpr =
    copy(child = newChild)
}
