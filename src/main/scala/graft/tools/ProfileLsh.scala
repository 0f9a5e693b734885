package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level profiler for the shared MinHash-LSH chain — the lineage
  * under ~10 of the heaviest registry queries (candidates, jaccard,
  * estimator, recall, cluster family). Times each stage in isolation at
  * `SPARK_GRAFT_SF_DIR` so optimization work aims at the measured
  * bottleneck instead of the assumed one.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileLsh"
  */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.operators.Dedup

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    // the near-dup planted corpus most LSH gates use (mirror of
    // QueriesPipeline.nearDupCorpus: every doc re-planted with two
    // extra tokens at doc_id + 100000, >= 3-token filter)
    val corpus = docs.unionAll(
      docs.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz zz")).as("text")))
      .filter(size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "),
        " ")) >= 3)

    timed("corpus count")(corpus.count())

    // stage 1: tokens + gram arrays only
    timed("grams (tokenize + ngrams, no hash)") {
      corpus.select(col("doc_id"),
          Dedup.ngramsOfTokens(Dedup.tokens(col("text")), 3).as("__g"))
        .select(sum(size(col("__g")))).head()
    }

    // stage 2: + native md5 minhash signatures (k = 12)
    timed("signatures (grams + graft_md5_minhash k=12)") {
      corpus.select(col("doc_id"),
          Dedup.ngramsOfTokens(Dedup.tokens(col("text")), 3).as("__g"))
        .select(col("doc_id"),
          call_function("graft_md5_minhash", col("__g"), lit(12)).as("sig"))
        .select(count(col("sig"))).head()
    }

    // stage 3: full banded signature frame (4 bands x 3 rows)
    timed("banded (sig + band hashes + posexplode)") {
      Dedup.bandedSignatures(corpus, "doc_id", col("text"), 3, 4, 3,
        Dedup.md5Hex).select(count(lit(1))).head()
    }

    // stage 4: candidates (banded persist + cap + self-join)
    val (cands, release) = timed("candidates (banded + cap join, materialized)") {
      val (c, r) = Dedup.minhashCandidatesManaged(corpus, "doc_id", col("text"),
        ngramN = 3, bands = 4, rowsPerBand = 3,
        hashFn = Dedup.md5Hex, maxBucket = 200)
      c.count()
      (c, r)
    }

    // stage 5: exact jaccard verify on the candidate set
    timed("jaccard verify on candidates") {
      Dedup.ngramJaccard(corpus, "doc_id", col("text"), 3, cands)
        .filter(col("jaccard") >= 0.6).count()
    }
    release()
    spark.stop()
  }
}
