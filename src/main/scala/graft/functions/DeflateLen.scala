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

  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(DefaultLevel)
  }

  /** Compressed length of `s` at [[DefaultLevel]]. Static so generated
    * code calls it directly inside the codegen span. */
  def deflateLen(s: UTF8String): Long = {
    val d = deflaters.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
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
