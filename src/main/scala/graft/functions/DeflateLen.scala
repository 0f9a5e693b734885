package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib-compressed byte length of a string — the primitive under the
  * COMPRESSION-RATIO quality signal (raw/compressed) used by web-corpus
  * curation pipelines (CCNet/RedPajama lineage: highly compressible
  * documents are boilerplate, templates, or keyword stuffing; nearly
  * incompressible ones are often encoded binary or gibberish). The
  * ratio complements the n-gram repetition signals: deflate's LZ77
  * window catches long-range verbatim repeats that fixed-n gram
  * statistics miss.
  *
  * The DEFLATE output for a given (input, level) is deterministic for a
  * zlib-lineage compressor, so the unit pins carry constants computed by
  * an INDEPENDENT implementation (CPython's zlib at level 6) — a
  * cross-engine check in the spirit of the DuckDB oracles; SQL engines
  * expose no deflate, so this family is unit-pinned rather than
  * oracle-gated.
  *
  * Per-thread Deflater reuse: Deflater allocates native window state
  * (~256 KB); one per row would dominate the work. `reset()` between
  * rows keeps the native buffer warm — safe because Spark evaluates a
  * row's expressions on one task thread. */
object DeflateLen {

  val DefaultLevel = 6

  private final class State {
    val deflater = new Deflater(DefaultLevel)
    val buf = new Array[Byte](8192) // reused drain buffer — contents discarded
  }

  private val states = new ThreadLocal[State] {
    override def initialValue(): State = new State
  }

  /** Compressed length of `s` at [[DefaultLevel]]. Static so generated
    * code calls it directly inside the codegen span. Both the Deflater
    * and the drain buffer are per-thread-reused — this runs once per
    * row of a corpus-bytes-proportional scan, and a fresh 8 KB buffer
    * per row would be pure allocation pressure. */
  def deflateLen(s: UTF8String): Long = {
    val st = states.get()
    val d = st.deflater
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(st.buf)
    total
  }
}

/** `graft_deflate_len(text)` — see [[DeflateLen]]. Registered by
  * [[GraftExtensions]]. */
case class DeflateLenExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_len"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.deflateLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLen.deflateLen($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLenExpr =
    copy(child = newChild)
}
