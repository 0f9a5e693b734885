package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The loud-failure contract of the correctness dump (round-6 verdict
  * #2): a crashing query must leave an error artifact in its output slot
  * — the round-6 events regression silently dropped 17 queries from the
  * driver's correctness report because a crash produced an ABSENCE. This
  * pins "deliberately breaking one query yields an err entry, not an
  * absence" permanently.
  */
class VerifySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a successful query dumps its rows and reports true") {
    val out = Files.createTempDirectory("verify-ok-").toString
    val ok = Verify.dumpQuery(spark, "unused", out, "q_fine",
      (s, _) => s.range(3).select(col("id")))
    assert(ok)
    assert(spark.read.parquet(s"$out/q_fine").count() === 3L)
  }

  test("a crashing query leaves a loud error artifact, not an absence") {
    val out = Files.createTempDirectory("verify-crash-").toString
    val ok = Verify.dumpQuery(spark, "unused", out, "q_boom",
      (_, _) => sys.error("synthetic analysis failure"))
    assert(!ok)
    val artifact = spark.read.parquet(s"$out/q_boom")
    assert(artifact.columns.toSeq === Seq("_query_crashed"))
    val msg = artifact.head().getString(0)
    assert(msg.startsWith("q_boom CRASHED:") &&
      msg.contains("synthetic analysis failure"))
  }

  test("a crash during ACTION (not plan build) also leaves the artifact") {
    val out = Files.createTempDirectory("verify-crash2-").toString
    // plan builds fine; the write action hits the failing udf-free
    // expression at runtime (division by a null-cast path raises on
    // ANSI-strict cast of a bad literal)
    val ok = Verify.dumpQuery(spark, "unused", out, "q_runtime_boom",
      (s, _) => s.range(1).select(raise_error(lit("runtime failure")).as("x")))
    assert(!ok)
    assert(spark.read.parquet(s"$out/q_runtime_boom").head()
      .getString(0).contains("runtime failure"))
  }
}
