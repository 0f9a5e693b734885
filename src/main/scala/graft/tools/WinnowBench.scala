package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Micro-benchmark: substring-per-window shingle hashing vs the native
  * one-pass rolling-hash expression, full materialization, 2 timed
  * rounds each after a warmup. Usage: runMain graft.tools.WinnowBench <sfDir> */
object WinnowBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    def time(label: String)(f: => Long): Unit = {
      f // warmup
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"winnowbench $label: ${times.map(_._1).min}%.3f s (rows ${times.head._2})")
    }
    time("substring+xxhash64") {
      TextAnalysis.winnowingFingerprints(docs, "doc_id", col("text"), 9, 8)
        .selectExpr("sum(size(fps))").head().getLong(0)
    }
    time("rolling-native     ") {
      TextAnalysis.winnowingFingerprintsRolling(docs, "doc_id", col("text"), 9, 8)
        .selectExpr("sum(size(fps))").head().getLong(0)
    }
    s.stop()
  }
}
