package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-15 (round-14 verdict #5): [[Similarity]]'s hot entry points
  * must degrade gracefully on a session WITHOUT
  * [[graft.functions.GraftExtensions]] — probe the active session's
  * function registry and fall back to the bit-identical HOF twins
  * instead of failing analysis with "Undefined function graft_dot".
  *
  * The extension-free session is simulated by `newSession()` +
  * dropping the graft functions from its registry (a truly plain
  * SparkContext would need a second JVM-wide context; the probe reads
  * exactly what this simulation controls — registry membership).
  */
class SimilarityFallbackSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private def vecDf(s: SparkSession) = {
    import s.implicits._
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(-1.0f, 0.5f, 2.0f), Array(2.0f, -3.0f, 1.0f))
    ).toDF("id", "a", "b")
  }

  private def withBareSession(f: SparkSession => Unit): Unit = {
    val bare = spark.newSession()
    Seq("graft_dot", "graft_srp_bucket").foreach { fn =>
      bare.sessionState.functionRegistry.dropFunction(FunctionIdentifier(fn))
    }
    val prior = SparkSession.getActiveSession
    SparkSession.setActiveSession(bare)
    try f(bare)
    finally prior.foreach(SparkSession.setActiveSession)
  }

  test("dot falls back to the HOF twin when graft_dot is unregistered") {
    val expected = vecDf(spark)
      .select(col("id"), Similarity.dotHof(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    withBareSession { bare =>
      val got = vecDf(bare)
        .select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expected, "fallback dot must equal the HOF reference")
    }
  }

  test("srpBucket(portable, dim) falls back when graft_srp_bucket is unregistered") {
    val expected = vecDf(spark)
      .select(col("id"),
        Similarity.srpBucketHof(col("a"), 8, portable = true, dim = Some(3)).as("bkt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    withBareSession { bare =>
      val got = vecDf(bare)
        .select(col("id"),
          Similarity.srpBucket(col("a"), 8, portable = true, dim = Some(3)).as("bkt"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, "fallback srpBucket must equal the HOF reference")
    }
  }

  test("the native path is still taken on an extensions session") {
    // on the shared (extensions) session the built Column must resolve
    // the native function — the fallback is strictly for sessions that
    // lack it
    val prior = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
    try {
      val c = Similarity.dot(col("a"), col("b"))
      assert(c.toString.toLowerCase.contains("graft_dot"),
        s"expected the native graft_dot call, got: $c")
    } finally prior.foreach(SparkSession.setActiveSession)
  }
}
