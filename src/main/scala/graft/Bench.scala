package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Benchmark main — runs every registered query on
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON line with per-query seconds.
  *
  * Harness rules (round-1 verdict "What's wrong #5"):
  *   - full materialization: each result is written to the `noop` sink,
  *     so every operator in the plan actually executes (a bare `count()`
  *     lets Catalyst prune unused projections — e.g. JSON construction);
  *   - failures are loud: a crashing query records `"failed"` and the
  *     process exits nonzero, instead of masquerading as a fast run;
  *   - the JSON line goes to stdout AND `SPARK_GRAFT_BENCH_OUT` (default
  *     `bench_out.json`), so an sbt-`[info]`-prefixed stdout can't lose it.
  *
  * Round-5 hardening (round-4 verdict "What's wrong #1" — `BENCH_r04.json`
  * was poisoned by state accumulated across the shared session plus
  * external load, and the recorded numbers couldn't prove it):
  *   - ISOLATION: before every query, the catalog cache, the LSH candidate
  *     memo, and every persistent/localCheckpoint RDD block are released —
  *     a query's number includes exactly its own work, never a block
  *     eviction storm inherited from an alphabetic predecessor;
  *   - the LSH family's designed-in warm-memo sharing is measured
  *     SEPARATELY: a labeled `warm` phase re-runs those queries against a
  *     pre-filled memo (this is the number a multi-query session sees);
  *   - SELF-DIAGNOSIS: per-query JVM GC milliseconds and post-query
  *     storage-memory bytes are recorded in the JSON (`gc_ms`,
  *     `storage_mb`), so an environment-inflated run shows anomalous GC
  *     against flat storage instead of being indistinguishable from a
  *     regression.
  */
object Bench {

  /** Queries that share the session-scoped LSH candidate memo by design
    * (one banded signature cache per corpus — see
    * [[QueriesPipeline]] lshCandidates). */
  private val LshFamily =
    Seq("q_minhash_pairs", "q_jaccard", "q_dedup_cluster", "q_cluster_keep")

  private def gcMillis: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum

  private def storageBytes(spark: org.apache.spark.sql.SparkSession): Long =
    spark.sparkContext.statusTracker.getExecutorInfos
      .map(i => i.usedOnHeapStorageMemory + i.usedOffHeapStorageMemory).sum

  /** Release every block a previous query could have left behind:
    * catalog-cached relations, the LSH memo's persisted banded frame,
    * and persistent RDDs (which is where `localCheckpoint` blocks
    * live). */
  private def clearSessionState(spark: org.apache.spark.sql.SparkSession): Unit = {
    QueriesPipeline.invalidateLshCache()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = graft.core.GraftSession.local(cpus.toInt)

    // Untimed warmup: JIT + whole-stage-codegen compilation + parquet
    // reader init otherwise land entirely on the alphabetically-first
    // query and distort its number.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    // optional comma-separated subset for focused profiling
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // per-phase failure lists: "failed" in the JSON (and the nonzero
    // exit) reflects the MAIN phase only — a warm re-run failure must
    // not flag a run whose 75 primary numbers are all valid
    var failed = List.empty[String]
    var warmFailed = List.empty[String]

    def timed(name: String, fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame,
        onFail: String => Unit): (String, Long, Long) = {
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            onFail(name)
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (if (ok) sec.toString else "\"failed\"", gcMillis - gc0, storageBytes(spark))
    }

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // ---- main phase: every query from a clean slate -------------------
    val results = selected.map { case (name, fn) =>
      clearSessionState(spark)
      val (v, gcMs, storage) = timed(name, fn, failed ::= _)
      (name, v, gcMs, storage)
    }

    // ---- warm phase: the LSH family against a pre-filled memo ---------
    val warmSet = selected.filter { case (n, _) => LshFamily.contains(n) }
    val warm =
      if (warmSet.isEmpty) Nil
      else {
        clearSessionState(spark)
        // untimed fill: the cheapest family member materializes the memo.
        // A fill failure means the "warm" numbers below are really cold —
        // say so instead of silently publishing them as warm.
        try SparkEntry.queries("q_minhash_pairs")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warm-memo fill FAILED (warm numbers " +
            s"below are effectively cold): ${e.getMessage}")
          warmFailed ::= "memo_fill"
        }
        warmSet.map { case (name, fn) =>
          val (v, _, _) = timed(name, fn, warmFailed ::= _)
          name -> v
        }
      }

    def jmap(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    val qs = jmap(results.map { case (n, v, _, _) => n -> v })
    val gcs = jmap(results.map { case (n, _, g, _) => n -> g.toString })
    val stor = jmap(results.map { case (n, _, _, s) => n -> (s / 1024 / 1024).toString })
    val warmJs = jmap(warm)
    val total = results.collect { case (_, v, _, _) if !v.startsWith("\"") => v.toDouble }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""warm":$warmJs,"gc_ms":$gcs,"storage_mb":$stor,""" +
        s""""sf":"$sfDir","failed":${failed.size},"warm_failed":${warmFailed.size}}"""
    println(line)
    Files.writeString(Paths.get(outPath), line + "\n")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
