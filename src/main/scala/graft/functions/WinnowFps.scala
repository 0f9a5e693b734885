package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing fingerprints (Schleimer–Wilkerson–Aiken): rolling
  * k-shingle hashes → sliding window-of-w minima → distinct minima in
  * first-occurrence order, all in ONE pass over the bytes.
  *
  * Bit-identical by construction to the composed pipeline it replaces
  * (`graft_rolling_shingle_hash` → `transform(sequence(...), i ->
  * array_min(slice(h, i+1, w)))` → `array_distinct`) — the equivalence
  * is pinned exactly, array order included, in `OperatorsSpec`. The
  * composed form is the semantics reference but evaluates its window
  * step INTERPRETED: `transform`/`slice`/`array_min` are higher-order
  * functions outside whole-stage codegen, paying one slice allocation +
  * O(w) scan per window plus the materialized intermediate hash array.
  * Here the window minima come from a monotonic deque (amortized O(1)
  * per position, zero per-window allocation) and distinct-ness from an
  * open-addressed primitive long set (no boxing), inside the codegen
  * span — O(text) total.
  */
object WinnowFps {

  /** Distinct window-of-`w` minima of the k-shingle rolling hashes of
    * `s`, first-occurrence order. Static so generated code calls it
    * directly inside the codegen span. */
  def fps(s: UTF8String, k: Int, w: Int): ArrayData = {
    val h = RollingShingleHash.hashesRaw(s, k)
    val m = h.length
    val ww = math.max(w, 1)
    val nw = math.max(m - ww, 0) + 1
    val minima = new Array[Long](nw)
    if (m <= ww) {
      // single window over everything (slice past the end truncates)
      var mn = h(0)
      var j = 1
      while (j < m) { if (h(j) < mn) mn = h(j); j += 1 }
      minima(0) = mn
    } else {
      // monotonic deque of indices; front = current window minimum
      val dq = new Array[Int](m)
      var qh = 0
      var qt = 0
      var i = 0
      while (i < m) {
        while (qt > qh && h(dq(qt - 1)) >= h(i)) qt -= 1
        dq(qt) = i
        qt += 1
        if (dq(qh) <= i - ww) qh += 1
        if (i >= ww - 1) minima(i - ww + 1) = h(dq(qh))
        i += 1
      }
    }
    // distinct, first-occurrence order (array_distinct semantics), via
    // linear-probed open addressing on primitives — adjacent windows
    // usually share a minimum, so the run-skip check short-circuits most
    // probes before they happen
    var cap = 16
    while (cap < nw * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](nw)
    var o = 0
    var p = 0
    while (p < nw) {
      val v = minima(p)
      if (o == 0 || v != out(o - 1)) {
        var idx = (java.lang.Long.hashCode(v) * 0x9E3779B9 >>> 16) & (cap - 1)
        var dup = false
        while (used(idx) && !dup) {
          if (keys(idx) == v) dup = true
          else idx = (idx + 1) & (cap - 1)
        }
        if (!dup) {
          used(idx) = true
          keys(idx) = v
          out(o) = v
          o += 1
        }
      }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, o))
  }
}

/** `graft_winnow_fps(text, k, w)` — see [[WinnowFps]]. Registered by
  * [[GraftExtensions]]; `k` and `w` are captured at plan time. */
case class WinnowFpsExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && w >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_fps expects (STRING, k >= 1, w >= 1), got (${child.dataType.sql}, $k, $w)")

  override protected def nullSafeEval(input: Any): Any =
    WinnowFps.fps(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFps.fps($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}
