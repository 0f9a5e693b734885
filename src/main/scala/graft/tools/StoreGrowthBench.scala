package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IncrementalDedup}

/** Evidence for the incremental-dedup contract: per-batch ingest cost
  * (probe + append) must stay FLAT as the accumulated store grows — the
  * property that makes per-arrival dedup affordable at 100 TB, where a
  * whole-corpus re-run per batch is O(corpus). Splits the corpus into 10
  * equal batches and ingests them sequentially into one store, timing
  * each step. Usage: runMain graft.tools.StoreGrowthBench <sfDir> */
object StoreGrowthBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .filter(size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")) >= 3)
    val store = java.nio.file.Files.createTempDirectory("graft-growth")
      .resolve("sigs").toString
    val p = IncrementalDedup.LshParams(ngramN = 3, bands = 4, rowsPerBand = 3,
      hashFn = Dedup.xxhash, maxBucket = 200)
    (0 until 10).foreach { b =>
      val batch = docs.filter(col("doc_id") % 10 === b)
      val t0 = System.nanoTime()
      val (cands, stats) =
        IncrementalDedup.ingestBatch(batch, "doc_id", col("text"), store, b.toLong, p)
      val nc = cands.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"storegrowth batch=$b%d secs=$secs%.2f candidates=$nc%d " +
        f"storeRowsAfter=${graft.sinks.BucketedMergeTarget.rowCount(s, store).getOrElse(-1L)}%d " +
        f"bucketsRewritten=${stats.bucketsRewritten}%d")
    }
    s.stop()
  }
}
