package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native k-minima MinHash signatures over a gram array, one traversal.
  *
  * The declarative form — `array((0 until k).map(seed =>
  * min(hash(concat(lit(s"$seed:"), g)))))` over exploded grams — costs a
  * shuffle (explode → groupBy(id)) plus k separate concat allocations and
  * hash expression evaluations per gram row; at sf0.1 the signature stage
  * was the dominant cost of every LSH query (measured 8.6 s for 4 k docs,
  * md5 regime). These expressions compute the identical k minima in ONE
  * pass over the doc's gram array inside whole-stage codegen — no explode,
  * no shuffle, no per-(gram,seed) string allocation — so `bandedSignatures`
  * becomes a pure narrow map.
  *
  * BYTE PARITY is the contract (the DuckDB oracle replays the same
  * construction):
  *
  *   - `graft_md5_minhash(grams, k)` == `array_agg(min(md5('<seed>:' ||
  *     gram)))`: digests run over the UTF-8 bytes of `"<seed>:" + gram`;
  *     16-byte digests compare unsigned-lexicographically, which is
  *     exactly the lexicographic order of their lowercase-hex strings;
  *     output is the lowercase-hex minima.
  *   - `graft_xxhash_minhash(grams, k)` == `min(xxhash64(concat(...)))`:
  *     Spark's `xxhash64` hashes a string's UTF-8 bytes with XXH64 seed
  *     42 — replicated here over a reused prefix+gram buffer.
  *
  * Empty gram arrays yield NULL signatures — the caller's
  * `posexplode(when(isnotnull(sig), …))` then emits nothing for the doc,
  * matching the aggregate form where a doc with no gram rows simply never
  * reaches the groupBy. (Null, not a filter: a `size(grams) >= 1` filter
  * gets predicate-pushed below the token/gram projections and re-derives
  * the whole tokenize tree per element — the recompute trap this file
  * exists to avoid.)
  */
object MinHashSig {

  private def prefixes(k: Int): Array[Array[Byte]] =
    Array.tabulate(k)(s => s"$s:".getBytes("UTF-8"))

  /** Unsigned lexicographic compare of two 16-byte digests. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** k md5 minhash minima of `grams`, as lowercase-hex strings. Static so
    * generated code calls it directly inside the codegen span. */
  def md5Minima(grams: ArrayData, k: Int): ArrayData = {
    val n = grams.numElements()
    if (n == 0) return null
    val pre = prefixes(k)
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](k)
    val cur = new Array[Byte](16)
    var i = 0
    while (i < n) {
      val g = grams.getUTF8String(i).getBytes
      var s = 0
      while (s < k) {
        md.reset()
        md.update(pre(s))
        md.update(g)
        md.digest(cur, 0, 16)
        if (mins(s) == null) mins(s) = cur.clone()
        else if (less(cur, mins(s))) System.arraycopy(cur, 0, mins(s), 0, 16)
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(d => hex(d): Any))
  }

  /** k xxhash64 minhash minima of `grams` (Spark seed 42), as longs. */
  def xxMinima(grams: ArrayData, k: Int): ArrayData = {
    val n = grams.numElements()
    if (n == 0) return null
    val pre = prefixes(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var buf = new Array[Byte](64)
    var i = 0
    while (i < n) {
      val g = grams.getUTF8String(i)
      val glen = g.numBytes()
      var s = 0
      while (s < k) {
        val plen = pre(s).length
        if (buf.length < plen + glen) buf = new Array[Byte](math.max(plen + glen, buf.length * 2))
        System.arraycopy(pre(s), 0, buf, 0, plen)
        g.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + plen)
        val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, plen + glen, 42L)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
  // ---- text-direct variants ------------------------------------------
  //
  // The gram-ARRAY forms above still pay the declarative gram
  // construction upstream: split + per-gram slice/array_join/
  // array_distinct allocate every token and gram string before the
  // digest ever runs — measured at the 100× rung as ~¾ of the warm
  // banded-signature stage (and the dominant janino/JIT compile unit).
  // These variants take the RAW text and walk it once: Spark-parity
  // normalization (UTF8String.trim == `trim`, space-only;
  // UTF8String.toLowerCase == `lower` — both pinned by spec), word
  // spans over the bytes with the same boundary-empty semantics as
  // `split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")`, and
  // per-gram digests fed word-span + single-space pieces directly (a
  // gram joined by single spaces is byte-identical to the normalized
  // slice, because every whitespace run collapses to one 0x20).
  // `array_distinct` upstream is dropped deliberately: duplicate grams
  // cannot change a MINIMUM, so the minima are bit-identical
  // (spec-pinned against the gram-array forms).

  @inline private def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Word spans of the normalized text: (starts, ends, count) with the
    * split-boundary empty words included. */
  private def wordSpans(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val len = bytes.length
    // upper bound on words: runs + 2 boundary empties
    val starts = new Array[Int](len / 2 + 3)
    val ends = new Array[Int](len / 2 + 3)
    var w = 0
    if (len == 0) {
      starts(0) = 0; ends(0) = 0
      return (starts, ends, 1)
    }
    var i = 0
    if (isWsByte(bytes(0))) { starts(w) = 0; ends(w) = 0; w += 1 } // leading empty
    while (i < len) {
      if (!isWsByte(bytes(i))) {
        val s0 = i
        while (i < len && !isWsByte(bytes(i))) i += 1
        starts(w) = s0; ends(w) = i; w += 1
      } else i += 1
    }
    if (isWsByte(bytes(len - 1))) { starts(w) = len; ends(w) = len; w += 1 } // trailing empty
    (starts, ends, w)
  }

  /** k md5 minhash minima over the word n-grams of RAW `text` — equal to
    * `md5Minima(ngramsOfTokens(tokens(text), n), k)` (spec-pinned). */
  def md5MinimaText(text: UTF8String, n: Int, k: Int): ArrayData = {
    val bytes = text.trim().toLowerCase().getBytes
    val (starts, ends, words) = wordSpans(bytes)
    val m = words - n + 1
    if (m <= 0) return null
    val pre = prefixes(k)
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](k)
    val cur = new Array[Byte](16)
    val space = Array(' '.toByte)
    var g = 0
    while (g < m) {
      var s = 0
      while (s < k) {
        md.reset()
        md.update(pre(s))
        var w = g
        while (w < g + n) {
          md.update(bytes, starts(w), ends(w) - starts(w))
          if (w < g + n - 1) md.update(space)
          w += 1
        }
        md.digest(cur, 0, 16)
        if (mins(s) == null) mins(s) = cur.clone()
        else if (less(cur, mins(s))) System.arraycopy(cur, 0, mins(s), 0, 16)
        s += 1
      }
      g += 1
    }
    new GenericArrayData(mins.map(d => hex(d): Any))
  }

  /** k xxhash64 minhash minima over the word n-grams of RAW `text` —
    * equal to `xxMinima(ngramsOfTokens(tokens(text), n), k)`. */
  def xxMinimaText(text: UTF8String, n: Int, k: Int): ArrayData = {
    val bytes = text.trim().toLowerCase().getBytes
    val (starts, ends, words) = wordSpans(bytes)
    val m = words - n + 1
    if (m <= 0) return null
    val pre = prefixes(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var buf = new Array[Byte](64)
    var g = 0
    while (g < m) {
      // assemble the gram once per (gram, seed) after the seed prefix —
      // gram bytes themselves are shared across seeds, so stage them at
      // a fixed offset once per gram and only rewrite the prefix
      var gramLen = n - 1 // single-space separators
      var w0 = g
      while (w0 < g + n) { gramLen += ends(w0) - starts(w0); w0 += 1 }
      val maxPre = pre(k - 1).length
      if (buf.length < maxPre + gramLen)
        buf = new Array[Byte](math.max(maxPre + gramLen, buf.length * 2))
      // stage gram at offset maxPre
      var off = maxPre
      var w = g
      while (w < g + n) {
        System.arraycopy(bytes, starts(w), buf, off, ends(w) - starts(w))
        off += ends(w) - starts(w)
        if (w < g + n - 1) { buf(off) = ' '; off += 1 }
        w += 1
      }
      var s = 0
      while (s < k) {
        val plen = pre(s).length
        val start = maxPre - plen
        System.arraycopy(pre(s), 0, buf, start, plen)
        val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET + start,
          plen + gramLen, 42L)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** `graft_md5_minhash(grams, k)` — see [[MinHashSig.md5Minima]]. */
case class Md5MinHashExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // empty gram array → null signature
  override def prettyName: String = "graft_md5_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_minhash expects (ARRAY<STRING>, k >= 1), got (${other.sql}, $k)")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.md5Minima(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSig.md5Minima($c, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashExpr =
    copy(child = newChild)
}

/** `graft_xxhash_minhash(grams, k)` — see [[MinHashSig.xxMinima]]. */
case class XxMinHashExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty gram array → null signature
  override def prettyName: String = "graft_xxhash_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_xxhash_minhash expects (ARRAY<STRING>, k >= 1), got (${other.sql}, $k)")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.xxMinima(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSig.xxMinima($c, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): XxMinHashExpr =
    copy(child = newChild)
}

/** `graft_md5_minhash_text(text, n, k)` — see [[MinHashSig.md5MinimaText]]:
  * the gram-array form fused with its own gram construction (one byte
  * walk from RAW text, no token/gram allocation). */
case class Md5MinHashTextExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // fewer than n words → null signature
  override def prettyName: String = "graft_md5_minhash_text"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1 && k >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5_minhash_text expects (STRING, n >= 1, k >= 1), " +
        s"got (${child.dataType.sql}, $n, $k)")

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.md5MinimaText(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSig.md5MinimaText($c, $n, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashTextExpr =
    copy(child = newChild)
}

/** `graft_xxhash_minhash_text(text, n, k)` — see [[MinHashSig.xxMinimaText]]. */
case class XxMinHashTextExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // fewer than n words → null signature
  override def prettyName: String = "graft_xxhash_minhash_text"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1 && k >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_xxhash_minhash_text expects (STRING, n >= 1, k >= 1), " +
        s"got (${child.dataType.sql}, $n, $k)")

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.xxMinimaText(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSig.xxMinimaText($c, $n, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): XxMinHashTextExpr =
    copy(child = newChild)
}
