package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IncrementalCluster, IncrementalDedup}

/** Scratch profiler for the incremental-store queries: coarse wall-clock
  * per stage, to locate fixed overhead (not part of the driver contract). */
object IncProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32)
    def stage[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[incprofile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      .filter(size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")) >= 3)

    // ---- q_incremental_dedup shape ----
    {
      val accumulated = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 1)
        .select((col("doc_id") + 700000).as("doc_id"),
          concat(col("text"), lit(" zz zz")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 5 === 0))
      val root = java.nio.file.Files.createTempDirectory("graft-profile-sig")
      val store = root.resolve("sigs").toString
      val p = IncrementalDedup.LshParams(ngramN = 3, bands = 4, rowsPerBand = 3,
        hashFn = Dedup.md5Hex, maxBucket = 200)
      val sigs = stage("dedup.sigs compute+count") {
        val s0 = IncrementalDedup.batchSignatures(accumulated, "doc_id", col("text"), p)
          .persist()
        println(s"[incprofile]   sig rows: ${s0.count()}")
        s0
      }
      stage("dedup.merge(pre-computed)") {
        graft.sinks.BucketedMergeTarget.merge(sigs.withColumn("batch_id", lit(1L)),
          store, IncrementalDedup.SigPk, "batch_id",
          graft.sinks.BucketedMergeTarget.DefaultBuckets, IncrementalDedup.SigBucketCols)
      }
      sigs.unpersist()
      stage("dedup.ingestBatch") {
        IncrementalDedup.ingestBatch(batch, "doc_id", col("text"), store, 2L, p)._1
      }
    }

    // ---- q_incremental_cluster shape ----
    // Round-10: profile over the DOUBLED corpus the query actually runs
    // on (nearDupCorpus plants a near-dup for every doc, so candidate
    // volume is far above the un-doubled corpus this section used to
    // read — the 39 s stage sum vs 92 s recorded operator gap).
    {
      val corpus = docs.unionAll(docs.select(
        (col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz zz")).as("text")))
      val cands = stage("cluster.lshCandidates") {
        val (c, _) = Dedup.minhashCandidatesManaged(corpus, "doc_id", col("text"),
          ngramN = 3, bands = 4, rowsPerBand = 3,
          hashFn = Dedup.md5Hex, maxBucket = 200)
        c.count()
        c
      }
      val edges = stage("cluster.jaccardEdges") {
        val e = Dedup.ngramJaccard(corpus, "doc_id", col("text"), 3, cands)
          .filter(col("jaccard") >= 0.6)
          .select(col("id_a"), col("id_b"))
          .localCheckpoint(true)
        e
      }
      val d = java.nio.file.Files.createTempDirectory("graft-profile-cc")
      val byId = d.resolve("byId").toString
      val byRep = d.resolve("byRep").toString
      stage("cluster.update batch1") {
        IncrementalCluster.update(edges.filter(col("id_a") % 2 === 0), byId, byRep, 1L, nBuckets = 8)
      }
      stage("cluster.update batch2") {
        IncrementalCluster.update(edges.filter(col("id_a") % 2 =!= 0), byId, byRep, 2L, nBuckets = 8)
      }
      stage("cluster.assignments") {
        IncrementalCluster.assignments(spark, byId).localCheckpoint(true).count()
      }
    }
    spark.stop()
  }
}
