package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native sign-random-projection bucket — the codegen replacement for
  * the literal-plane HOF formulation in
  * [[graft.operators.Similarity.srpBucket]] (portable planes, known
  * dim): the HOF path runs h interpreted `aggregate(zip_with(...))`
  * folds PER ROW — h·dim boxed lambda dispatches per vector, measured
  * as the q_cosine_pairs steady-state floor at the 100× rung once the
  * pair-side dot went native (40 s, almost all bucket derivation over
  * 400 k × 11 planes). Here all h projections run in one flat
  * row-major loop over a plane matrix carried as a plan reference.
  *
  * The matrix IS [[planesHex]] — the md5-hex construction
  * `Similarity.planeComponentsHex` delegates to — so buckets are
  * bit-identical to the HOF twin (pinned in `OperatorsSpec`) and every
  * DuckDB `sqlSrpBucket` replay is untouched: per plane, the fold is
  * acc = 0.0; acc += widen(vᵢ)·plane(i) in element order, and the sign
  * test is `proj >= 0` setting bit p, exactly the `when(proj >= 0,
  * 1 << p)` ladder. */
object SrpBucket {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  /** Portable plane component (plane p, coordinate i): the first 5 hex
    * digits of md5("p:i") read little-endian base 16, scaled to
    * [-0.5, 0.5). Every step is exact in double and replayable verbatim
    * in SQL on either engine. */
  def planeComponentHex(plane: Int, i: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val v = (1 to 5).map { j =>
      val c = h.charAt(j - 1)
      val dv = if (c <= '9') c - '0' else c - 'a' + 10
      dv * math.pow(16, j - 1)
    }.sum
    v / 1048576.0 - 0.5
  }

  /** Row-major h×dim portable plane matrix, memoized per process (every
    * task thread wants the same planes; md5 per cell is cheap but not
    * free). */
  def planesHex(h: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((h, dim), { key =>
      val (hh, d) = key
      val m = new Array[Double](hh * d)
      var p = 0
      while (p < hh) {
        var i = 0
        while (i < d) { m(p * d + i) = planeComponentHex(p, i); i += 1 }
        p += 1
      }
      m
    })

  /** All h sign bits in one pass. Static so generated code calls it
    * directly. */
  def bucket(v: ArrayData, planes: Array[Double], h: Int, dim: Int,
             floatIn: Boolean): Long = {
    require(v.numElements() == dim,
      s"graft_srp_bucket: vector has ${v.numElements()} elements, planes built for dim $dim")
    var b = 0L
    var p = 0
    while (p < h) {
      val base = p * dim
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val x = if (floatIn) v.getFloat(i).toDouble else v.getDouble(i)
        acc += x * planes(base + i)
        i += 1
      }
      if (acc >= 0) b |= 1L << p
      p += 1
    }
    b
  }
}

/** `graft_srp_bucket(vec, h, dim)` — see [[SrpBucket]]. h and dim must
  * be literals (the plane matrix is part of the plan identity).
  * Registered by [[GraftExtensions]]. */
case class SrpBucketExpr(child: Expression, h: Int, dim: Int)
    extends UnaryExpression {

  @transient private lazy val planes: Array[Double] = SrpBucket.planesHex(h, dim)

  private def floatIn: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_bucket expects ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SrpBucket.bucket(input.asInstanceOf[ArrayData], planes, h, dim, floatIn)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpPlanes", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SrpBucket.bucket($c, $ref, $h, $dim, $floatIn)")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBucketExpr =
    copy(child = newChild)
}
