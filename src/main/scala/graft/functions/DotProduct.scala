package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native dot product — the codegen replacement for the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation in
  * [[graft.operators.Similarity.dot]]: Catalyst HOFs evaluate in the
  * expression interpreter with a boxed lambda dispatch PER ELEMENT, and
  * the dot sits inside every pair predicate of the vector family
  * (cosine pair sweeps, semantic dedup, ANN rank/recall) — measured as
  * the 100× rung's dominant cost (q_cosine_pairs 41 s floor;
  * q_semantic_dedup_incremental 661 s fresh-JVM first pass, almost all
  * of it C2-compiling the interpreter paths under tens of millions of
  * per-pair HOF folds). Here the whole fold is one flat counted loop
  * the JIT vectorizes, called from inside the whole-stage-codegen span.
  *
  * Fold order is EXACTLY the HOF twin's: acc = 0.0; acc += widen(aᵢ) ·
  * widen(bᵢ) in element order (float→double widening is exact; both
  * sides widen before multiplying, like the twin's double casts) — so
  * results are bit-identical and every DuckDB oracle replay
  * (`list_reduce(list_transform(list_zip(...)))`, the same sequential
  * fold) is untouched. Pinned in `OperatorsSpec` over corpus embeddings
  * for all four float/double input combinations.
  *
  * Null ELEMENTS are not supported (embedding arrays never carry them);
  * a null ARRAY argument yields null like any binary expression. */
object DotProduct {

  /** Element-accessor codes baked in at codegen time per side. Int and
    * long widen exactly like the HOF twin's double cast (SQ8 codes are
    * ARRAY<INT>; every long the family stores fits a double exactly —
    * bucket ids stay under 2^20). */
  val ElemDouble = 0
  val ElemFloat = 1
  val ElemInt = 2
  val ElemLong = 3

  /** Σ widen(aᵢ)·widen(bᵢ), left fold from 0.0 in element order. Static
    * so generated code calls it directly. */
  def dot(a: ArrayData, b: ArrayData, aKind: Int, bKind: Int): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"graft_dot: length mismatch ($n vs ${b.numElements()})")
    def get(v: ArrayData, kind: Int, i: Int): Double = kind match {
      case ElemDouble => v.getDouble(i)
      case ElemFloat => v.getFloat(i).toDouble
      case ElemInt => v.getInt(i).toDouble
      case _ => v.getLong(i).toDouble
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(a, aKind, i) * get(b, bKind, i)
      i += 1
    }
    acc
  }
}

/** `graft_dot(a, b)` — see [[DotProduct]]. Registered by
  * [[GraftExtensions]]. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def kind(e: Expression): Int = e.dataType match {
    case ArrayType(DoubleType, _) => DotProduct.ElemDouble
    case ArrayType(FloatType, _) => DotProduct.ElemFloat
    case ArrayType(IntegerType, _) => DotProduct.ElemInt
    case _ => DotProduct.ElemLong
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(c => c.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) |
           ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects numeric arrays (FLOAT/DOUBLE/INT/BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      kind(left), kind(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProduct.dot($a, $b, ${kind(left)}, ${kind(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
