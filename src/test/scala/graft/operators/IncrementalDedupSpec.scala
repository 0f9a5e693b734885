package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sinks.BucketedMergeTarget

/** Incremental corpus dedup: a batch probed against the persisted
  * signature store must behave exactly like the whole-corpus cross sweep
  * replayed from scratch, while touching only the buckets the batch's
  * bands hash into. */
class IncrementalDedupSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private val params = IncrementalDedup.LshParams(
    ngramN = 2, bands = 4, rowsPerBand = 2, hashFn = Dedup.md5Hex, maxBucket = 100)

  private def doc(i: Int): String =
    s"alpha bravo charlie token$i delta echo foxtrot mark${i * 7} golf hotel india"

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Whole-corpus reference: cross-corpus LSH sweep of batch vs corpus. */
  private def crossPairs(batch: DataFrame, corpus: DataFrame): Set[(Long, Long)] =
    Dedup.crossMinhashCandidates(batch, corpus, "doc_id", col("text"),
        ngramN = params.ngramN, bands = params.bands, rowsPerBand = params.rowsPerBand,
        hashFn = params.hashFn, maxBucket = params.maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def probePairs(cands: DataFrame): Set[(Long, Long)] =
    cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("probe against the store equals the whole-corpus cross sweep") {
    val corpus = docsDf((1L to 40L).map(i => (i, doc(i.toInt))))
    // 1001..1004 near-duplicate corpus docs 1..4; 1005..1008 are novel
    val batch = docsDf(
      (1L to 4L).map(i => (1000L + i, doc(i.toInt) + " zz zz")) ++
      (5L to 8L).map(i => (1000L + i, s"omega sigma rho unique$i phi chi psi nu xi omicron pi")))
    val store = Files.createTempDirectory("incdedup-eq").resolve("sigs").toString
    IncrementalDedup.appendBatch(corpus, "doc_id", col("text"), store,
      batchId = 1L, params, nBuckets = 16)
    val (cands, stats) = IncrementalDedup.ingestBatch(batch, "doc_id", col("text"),
      store, batchId = 2L, params, nBuckets = 16)
    val got = probePairs(cands)
    assert(got == crossPairs(batch, corpus))
    assert(got.map(_._1).intersect((1001L to 1004L).toSet) == (1001L to 1004L).toSet,
      "every planted near-dup must surface")
    assert(stats.bucketsRewritten > 0)
  }

  test("accumulation: batch N probes against everything appended before it") {
    val corpus = docsDf((1L to 30L).map(i => (i, doc(i.toInt))))
    val batch1 = docsDf(Seq((201L, doc(5) + " yy"), (202L, "totally novel first words here abc def ghi jkl")))
    val batch2 = docsDf(Seq(
      (301L, doc(5) + " yy zz"),   // dups corpus 5 AND batch1's 201
      (302L, "totally novel first words here abc def ghi jkl qq"))) // dups 202
    val store = Files.createTempDirectory("incdedup-acc").resolve("sigs").toString
    IncrementalDedup.appendBatch(corpus, "doc_id", col("text"), store, 1L, params, 16)
    IncrementalDedup.ingestBatch(batch1, "doc_id", col("text"), store, 2L, params, 16)
    val (cands2, _) = IncrementalDedup.ingestBatch(batch2, "doc_id", col("text"),
      store, 3L, params, 16)
    assert(probePairs(cands2) == crossPairs(batch2, corpus.unionByName(batch1)))
  }

  test("replaying a batch leaves the store unchanged and never matches itself") {
    val corpus = docsDf((1L to 10L).map(i => (i, doc(i.toInt))))
    val store = Files.createTempDirectory("incdedup-replay").resolve("sigs").toString
    IncrementalDedup.appendBatch(corpus, "doc_id", col("text"), store, 1L, params, 16)
    val rowsAfterFirst = BucketedMergeTarget.rowCount(spark, store)
    // re-ingesting the identical corpus: every probe hit is the doc's own
    // stored signature row — the id_new =!= id_old guard must drop those
    val (cands, _) = IncrementalDedup.ingestBatch(corpus, "doc_id", col("text"),
      store, 1L, params, 16)
    assert(probePairs(cands) == crossPairs(corpus, corpus).filter(p => p._1 != p._2))
    assert(BucketedMergeTarget.rowCount(spark, store) == rowsAfterFirst)
  }

  test("probe reads only the buckets the batch's bands hash into") {
    val corpus = docsDf((1L to 200L).map(i => (i, doc(i.toInt))))
    val store = Files.createTempDirectory("incdedup-prune").resolve("sigs").toString
    IncrementalDedup.appendBatch(corpus, "doc_id", col("text"), store, 1L, params,
      nBuckets = 16)
    val m = BucketedMergeTarget.currentManifest(spark, store).get
    assert(m.bucketCols == IncrementalDedup.SigBucketCols)
    // 200 docs × 4 bands over 16 buckets → the store owns (nearly) all 16
    assert(m.buckets.size >= 12, s"store too concentrated: ${m.buckets.size} buckets")
    val batchSigs = IncrementalDedup.batchSignatures(
      docsDf(Seq((900L, doc(3) + " zz zz"))), "doc_id", col("text"), params)
    val stored = BucketedMergeTarget.readMatching(batchSigs, store,
      IncrementalDedup.SigBucketCols)
    // one doc contributes 4 band rows → at most 4 distinct buckets read
    val bucketsRead = stored.inputFiles
      .flatMap("""_graft_bucket=(\d+)""".r.findFirstMatchIn(_).map(_.group(1).toInt))
      .toSet
    assert(bucketsRead.nonEmpty && bucketsRead.size <= 4,
      s"probe read ${bucketsRead.size} buckets of ${m.buckets.size} — not pruned")
  }

  test("the manifest rejects a mismatched probe or merge bucketing") {
    val corpus = docsDf((1L to 5L).map(i => (i, doc(i.toInt))))
    val store = Files.createTempDirectory("incdedup-guard").resolve("sigs").toString
    IncrementalDedup.appendBatch(corpus, "doc_id", col("text"), store, 1L, params, 8)
    val sigs = IncrementalDedup.batchSignatures(corpus, "doc_id", col("text"), params)
    intercept[IllegalArgumentException] {
      BucketedMergeTarget.readMatching(sigs, store, Seq("band")) // wrong probe key
    }
    intercept[IllegalArgumentException] {
      BucketedMergeTarget.merge(sigs.withColumn("batch_id", lit(9L)), store,
        IncrementalDedup.SigPk, "batch_id", 8, Seq("band")) // conflicting bucketing
    }
    intercept[IllegalArgumentException] {
      // bucketCols must be a subset of the PK (merge-visibility invariant)
      BucketedMergeTarget.merge(sigs.withColumn("batch_id", lit(9L)),
        Files.createTempDirectory("incdedup-guard2").resolve("s").toString,
        Seq("band", "bh", "id"), "batch_id", 8, Seq("batch_id"))
    }
  }

  test("streaming ingestion over a real stream equals the sequential batch path") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = Files.createTempDirectory("incdedup-stream")
    val corpus = (1L to 30L).map(i => (i, doc(i.toInt)))
    val batch1 = Seq((201L, doc(5) + " yy"),
      (202L, "totally novel first words here abc def ghi jkl"))
    val batch2 = Seq(
      (301L, doc(5) + " yy zz"), // dups corpus 5 AND batch1's 201
      (302L, "totally novel first words here abc def ghi jkl qq")) // dups 202

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val docsStream = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.StreamingSync.streamingNearDupIngest(
      docsStream, "doc_id", "text",
      root.resolve("sigs").toString, root.resolve("pairs").toString,
      root.resolve("ckpt").toString, params, nBuckets = 16)
    try {
      // one addData + drain per arrival = three distinct micro-batches
      Seq(corpus, batch1, batch2).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = BucketedMergeTarget.read(s, root.resolve("pairs").toString)
      .select("id_new", "id_old")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch-path reference: the same three arrivals ingested sequentially
    val refStore = root.resolve("ref-sigs").toString
    val refPairs = Seq(corpus, batch1, batch2).zipWithIndex.flatMap { case (b, i) =>
      probePairs(IncrementalDedup.ingestBatch(docsDf(b), "doc_id", col("text"),
        refStore, i.toLong, params, 16)._1)
    }.toSet
    assert(streamed == refPairs)
    // non-vacuous: the planted cross-batch dups surfaced
    assert(streamed.exists { case (n, o) => n == 301L && (o == 5L || o == 201L) })
    assert(streamed.contains((302L, 202L)))
    // both stores hold identical signature rows (same LSH scheme, same data)
    assert(BucketedMergeTarget.rowCount(s, root.resolve("sigs").toString) ==
      BucketedMergeTarget.rowCount(s, refStore))
  }
}
