package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IncrementalCluster, IncrementalDedup}

/** Evidence for the incremental-store contract: per-batch ingest cost
  * (probe + append / probe + local-CC + commit) must stay FLAT as the
  * accumulated store grows — the property that makes per-arrival dedup
  * and clustering affordable at 100 TB, where a whole-corpus re-run per
  * batch is O(corpus). Splits the corpus into `n` equal batches and
  * ingests them sequentially into one store, timing each step; with a
  * ScaleGen'd 3× corpus and n=30, the store ends at 30× its first-batch
  * size while each batch stays sf0.1/10-sized — the deepest growth rung.
  *
  * The `span` mode runs the duplicate-span gram store
  * ([[graft.sinks.SpanGramStore]]) through the same ladder: per-batch
  * probe+excise+append cost vs accumulated store size, with a
  * mid-ladder compaction showing the segment/file count reset — the
  * small-files debt payment — and that probe cost is unchanged across
  * it.
  *
  * Usage: runMain graft.tools.StoreGrowthBench <sfDir> [nBatches] [dedup|cluster|span|both] [compactAbove]
  */
object StoreGrowthBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(10)
    val mode = args.lift(2).getOrElse("dedup")
    val s = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .filter(size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")) >= 3)

    if (mode == "dedup" || mode == "both") {
      val store = java.nio.file.Files.createTempDirectory("graft-growth")
        .resolve("sigs").toString
      val p = IncrementalDedup.LshParams(ngramN = 3, bands = 4, rowsPerBand = 3,
        hashFn = Dedup.xxhash, maxBucket = 200)
      (0 until n).foreach { b =>
        val batch = docs.filter(col("doc_id") % n === b)
        val t0 = System.nanoTime()
        val (cands, stats) =
          IncrementalDedup.ingestBatch(batch, "doc_id", col("text"), store, b.toLong, p)
        val nc = cands.count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"storegrowth batch=$b%d secs=$secs%.2f candidates=$nc%d " +
          f"storeRowsAfter=${graft.sinks.BucketedMergeTarget.rowCount(s, store).getOrElse(-1L)}%d " +
          f"bucketsRewritten=${stats.bucketsRewritten}%d")
      }
    }

    if (mode == "span" || mode == "both") {
      import graft.sinks.SpanGramStore
      val store = java.nio.file.Files.createTempDirectory("graft-growth-span")
        .resolve("grams").toString
      val nBuckets = 64
      // the INGEST PATH's own auto-compaction pays the small-files debt
      // (no manual intervention anywhere in the ladder): the per-batch
      // segments/files columns show the ramp-and-reset sawtooth, and
      // the batches after each fold prove probe cost is unchanged
      // across it (compaction cost is inside that batch's secs)
      val compactAbove = args.lift(3).map(_.toInt).getOrElse(10)
      (0 until n).foreach { b =>
        val batch = docs.filter(col("doc_id") % n === b)
        val t0 = System.nanoTime()
        val out = Dedup.duplicateSpanExciseIncremental(batch, "doc_id", "text",
          k = 8, store, nBuckets, compactAbove)
        val affected = out.filter(col("n_dup_tokens") > 0).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"spangrowth batch=$b%d secs=$secs%.2f affected=$affected%d " +
          f"storeRowsAfter=${SpanGramStore.rowCount(s, store)}%d " +
          f"segments=${SpanGramStore.segmentCount(s, store)}%d " +
          f"files=${SpanGramStore.fileCount(s, store)}%d")
      }
    }

    if (mode == "cluster" || mode == "both") {
      // one LSH+Jaccard sweep yields the full edge set (production xxhash
      // regime); the growth loop then replays it as n arrival batches —
      // what is being measured is update() cost vs accumulated store size,
      // not edge derivation (covered by the dedup loop / ScaleBench)
      val (cands, release) = Dedup.minhashCandidatesManaged(docs, "doc_id", col("text"),
        ngramN = 3, bands = 4, rowsPerBand = 3, hashFn = Dedup.xxhash, maxBucket = 200)
      val edges = Dedup.ngramJaccard(docs, "doc_id", col("text"), 3, cands)
        .filter(col("jaccard") >= 0.6)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint(true)
      release()
      val d = java.nio.file.Files.createTempDirectory("graft-growth-cc")
      val byId = d.resolve("byId").toString
      val byRep = d.resolve("byRep").toString
      (0 until n).foreach { b =>
        val batch = edges.filter(col("id_a") % n === b)
        val t0 = System.nanoTime()
        val wrote = IncrementalCluster.update(batch, byId, byRep, b.toLong).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"clustergrowth batch=$b%d secs=$secs%.2f wrote=$wrote%d " +
          f"storeRowsAfter=${graft.sinks.BucketedMergeTarget.rowCount(s, byId).getOrElse(-1L)}%d")
      }
    }

    if (mode == "web") {
      // the END-TO-END continuous regime: each arrival runs the WHOLE
      // web flagship chain (curation → extraction → C4 → PII → store-
      // backed span excision → token floor → packing), not just the
      // store ops — per-arrival wall cost must stay flat as the gram
      // store accumulates all earlier arrivals (auto-folds billed
      // inside their triggering arrival, the q_web_pipeline_continuous
      // operating rule at ladder depth)
      import graft.sinks.SpanGramStore
      val store = java.nio.file.Files.createTempDirectory("graft-growth-web")
        .resolve("grams").toString
      val compactAbove = args.lift(3).map(_.toInt).getOrElse(4)
      (0 until n).foreach { b =>
        val t0 = System.nanoTime()
        val out = graft.QueriesPipeline.webIncrementalStage(
          s, dir, b, store, m = n, compactAbove = compactAbove)
        val rows = out.count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"webgrowth batch=$b%d secs=$secs%.2f packedRows=$rows%d " +
          f"storeRowsAfter=${SpanGramStore.rowCount(s, store)}%d " +
          f"segments=${SpanGramStore.segmentCount(s, store)}%d " +
          f"files=${SpanGramStore.fileCount(s, store)}%d")
      }
    }
    s.stop()
  }
}
