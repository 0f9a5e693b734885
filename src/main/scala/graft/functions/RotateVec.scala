package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native orthonormal-rotation map — the codegen replacement for the
  * higher-order `transform`/`aggregate` formulation in
  * `Similarity.withRotated`: Catalyst HOFs evaluate in the expression
  * interpreter with per-element lambda dispatch and boxing, and the
  * rotated frame is consumed by several scans in the IVFPQ chain, so
  * the dim² work re-ran interpreted per consumer (measured 58.8 s for
  * `q_ann_recall_opq` vs 12.3 s unrotated at the 100× rung). Here the
  * whole mat-vec is one tight flat-array loop inside the
  * whole-stage-codegen span.
  *
  * The matrix is DERIVED, not passed: `(dim, seed)` fully determine it
  * (seeded Box-Muller + modified Gram-Schmidt — the same construction
  * `Similarity.randomRotation` exposes, which delegates here), so the
  * plan carries two scalar literals instead of dim² doubles, and any
  * JVM rebuilds the identical matrix. Fold order matches the HOF twin
  * exactly: out(o) = ((0.0 + R(o,0)·v0) + R(o,1)·v1) + … — pinned
  * bit-identical in the spec, which is what keeps the DuckDB oracle's
  * replay valid unchanged. */
object RotateVec {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[Double]]()

  /** Row-major orthonormal rotation for (dim, seed) — deterministic on
    * any JVM. Memoized per process: the spec'd construction costs
    * O(dim³) and every task thread wants the same matrix. */
  def matrix(dim: Int, seed: Long): Array[Double] =
    cache.computeIfAbsent((dim, seed), { key =>
      build(key._1, key._2).flatten
    })

  /** The construction itself (public for `Similarity.randomRotation`).
    * Box-Muller from two uniforms rather than `nextGaussian` so the
    * stream is identical on every JDK; modified Gram-Schmidt keeps the
    * rows orthonormal to ~1e-12. */
  def build(dim: Int, seed: Long): Array[Array[Double]] = {
    require(dim > 0, s"dim must be positive, got $dim")
    val rnd = new java.util.SplittableRandom(seed)
    def gauss(): Double = {
      val u1 = math.max(rnd.nextDouble(), 1e-300)
      val u2 = rnd.nextDouble()
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
    val a = Array.fill(dim, dim)(gauss())
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < i) { // subtract projections onto earlier rows
        var d = 0.0; var t = 0
        while (t < dim) { d += a(i)(t) * a(j)(t); t += 1 }
        t = 0
        while (t < dim) { a(i)(t) -= d * a(j)(t); t += 1 }
        j += 1
      }
      var nrm = 0.0; var t = 0
      while (t < dim) { nrm += a(i)(t) * a(i)(t); t += 1 }
      nrm = math.sqrt(nrm)
      require(nrm > 1e-9, "degenerate Gram-Schmidt row (astronomically unlikely)")
      t = 0
      while (t < dim) { a(i)(t) /= nrm; t += 1 }
      i += 1
    }
    a
  }

  /** R·v with the in-order left fold (static so generated code calls it
    * directly). `floatIn` selects the element accessor at codegen time —
    * the float→double widening is exact either way. */
  def rotate(v: ArrayData, m: Array[Double], dim: Int,
             floatIn: Boolean): ArrayData = {
    require(v.numElements() == dim,
      s"graft_rotate_vec: vector has ${v.numElements()} elements, matrix dim $dim")
    val out = new Array[Any](dim)
    var o = 0
    while (o < dim) {
      val base = o * dim
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val x = if (floatIn) v.getFloat(i).toDouble else v.getDouble(i)
        acc += m(base + i) * x
        i += 1
      }
      out(o) = acc
      o += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_rotate_vec(vec, dim, seed)` — see [[RotateVec]]. Registered
  * by [[GraftExtensions]]; dim and seed must be literals (the matrix is
  * part of the plan identity, like the quantizer codebooks). */
case class RotateVecExpr(child: Expression, dim: Int, seed: Long)
    extends UnaryExpression {

  @transient private lazy val mat: Array[Double] = RotateVec.matrix(dim, seed)

  private def floatIn: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_rotate_vec"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rotate_vec expects ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RotateVec.rotate(input.asInstanceOf[ArrayData], mat, dim, floatIn)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rotMat", mat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RotateVec.rotate($c, $ref, $dim, $floatIn)")
  }

  override protected def withNewChildInternal(newChild: Expression): RotateVecExpr =
    copy(child = newChild)
}
