package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IncrementalDedup}

/** Scaling-curve bench for the fuzzy-dedup / decontamination chain — the
  * operators whose 100 TB viability rests on banding/bucketing cutting
  * the pair space BEFORE any join. Runs the chain at one sf dir with one
  * hash regime and emits one JSON line of per-stage seconds, so curves
  * across sf0.1 / sf0.3 / sf1 (ScaleGen dirs) can falsify or confirm
  * ≤~linear growth per stage.
  *
  * Regimes: `md5` is the engine-portable oracle hash the registered
  * queries use; `xxhash` is the production path (codegen'd 64-bit
  * xxhash64). Same pipeline, same shapes — only the hash column exprs
  * differ.
  *
  * Usage: runMain graft.tools.ScaleBench <sfDir> <md5|xxhash> [outPath]
  */
object ScaleBench {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** The q_minhash_pairs corpus: documents ∪ lightly-edited copies
    * (planted near-dups), ≥3-token docs only. */
  private def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val planted = docs.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" zz zz")).as("text"))
    docs.unionByName(planted)
      .filter(size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")) >= 3)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val regime = args(1)
    val outPath = if (args.length > 2) Some(args(2)) else None
    val hashFn: Column => Column = regime match {
      case "md5"    => Dedup.md5Hex
      case "xxhash" => Dedup.xxhash
      case other    => sys.error(s"unknown regime '$other' (md5|xxhash)")
    }
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    val corpus = nearDupCorpus(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusRows = corpus.count()

    val stages = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]

    // 1. LSH banding + capped bucket self-join → candidate pairs
    val ((cands, release), tCand) = timed {
      val (c, r) = Dedup.minhashCandidatesManaged(corpus, "doc_id", col("text"),
        ngramN = 3, bands = 4, rowsPerBand = 3, hashFn = hashFn, maxBucket = 200)
      val cc = c.localCheckpoint(true)
      (cc, r)
    }
    stages("minhash_pairs") = tCand
    counts("candidate_pairs") = cands.count()

    // 2. exact n-gram Jaccard verify on the candidate set
    val (edges, tJac) = timed {
      Dedup.ngramJaccard(corpus, "doc_id", col("text"), 3, cands)
        .filter(col("jaccard") >= 0.6)
        .select("id_a", "id_b")
        .localCheckpoint(true)
    }
    stages("jaccard_verify") = tJac
    counts("verified_edges") = edges.count()
    release()

    // 3. duplicate clusters (connected components over verified edges)
    val (reps, tCc) = timed {
      Dedup.clusterRepresentatives(corpus, "doc_id", edges).localCheckpoint(true)
    }
    stages("dedup_cluster") = tCc
    counts("clustered_docs") = reps.count()

    // 4. cross-corpus decontamination sweep (corpus vs edited every-10th)
    val (decon, tDecon) = timed {
      val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
        .filter(size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")) >= 3)
      val bench = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 500000).as("doc_id"),
          concat(col("text"), lit(" zz zz")).as("text"))
      Dedup.crossMinhashCandidates(docs, bench, "doc_id", col("text"),
        ngramN = 3, bands = 4, rowsPerBand = 3, hashFn = hashFn, maxBucket = 200)
    }
    stages("decontaminate") = tDecon
    counts("contaminated_pairs") = decon.count()

    // 5. incremental dedup: store the 4/5 "accumulated" slice, ingest the
    // rest as a batch — probe + append both ∝ batch
    val (_, tInc) = timed {
      val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
        .filter(size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")) >= 3)
      val accumulated = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 1)
        .select((col("doc_id") + 700000).as("doc_id"),
          concat(col("text"), lit(" zz zz")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 5 === 0))
      val store = java.nio.file.Files.createTempDirectory("scalebench-sigs")
        .resolve("sigs").toString
      val p = IncrementalDedup.LshParams(ngramN = 3, bands = 4, rowsPerBand = 3,
        hashFn = hashFn, maxBucket = 200)
      IncrementalDedup.appendBatch(accumulated, "doc_id", col("text"), store, 1L, p)
      val (c, _) = IncrementalDedup.ingestBatch(batch, "doc_id", col("text"), store, 2L, p)
      counts("incremental_pairs") = c.count()
    }
    stages("incremental_dedup") = tInc

    // 6. exact heavy hitters (regime-independent: exact counting, no LSH
    // hash) — the claim under test is that pass-1 state stays k counters
    // per partition and pass-2 work stays ∝ candidate matches while the
    // token stream grows with sf
    val (_, tHh) = timed {
      val hh = graft.operators.HeavyHitters.heavyTerms(
        spark.read.parquet(s"$dir/documents.parquet"), col("text"),
        denom = 200L, k = 256)
      counts("heavy_terms") = hh.count()
    }
    stages("heavy_hitters") = tHh

    corpus.unpersist()
    val total = stages.values.sum
    val sj = stages.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val cj = counts.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val line = s"""{"metric":"dedup_chain","value":$total,"unit":"sec","sf":"$dir",""" +
      s""""regime":"$regime","corpus_rows":$corpusRows,"stages":$sj,"counts":$cj}"""
    println(line)
    outPath.foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    spark.stop()
  }
}
