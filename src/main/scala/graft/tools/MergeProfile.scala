package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.sinks.BucketedMergeTarget
import graft.streaming.IncrementalSync

/** Scratch: time the internal stages of one BucketedMergeTarget-style
  * commit to locate fixed overhead. Not part of the driver contract. */
object MergeProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    import spark.implicits._
    def stage[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mergeprofile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val root = java.nio.file.Files.createTempDirectory("graft-mp")
    val store = root.resolve("t").toString

    // seed
    val seed = (1L to 100000L).map(i => (i, 1L, s"v$i")).toDF("id", "cursor", "v")
    stage("replaceAll 100k") {
      BucketedMergeTarget.replaceAll(seed, store, Seq("id"), "cursor", 32)
    }
    // warm a second time
    val batch = (1L to 1000L).map(i => (i * 7, 2L, s"w$i")).toDF("id", "cursor", "v")
    stage("merge 1k (warm)") {
      BucketedMergeTarget.merge(batch, store, Seq("id"), "cursor")
    }
    // now the internals of a comparable merge, step by step
    val batch2 = (1L to 1000L).map(i => (i * 11, 3L, s"x$i")).toDF("id", "cursor", "v")
    val bucketed = stage("  latestByKey+bucket+persist") {
      val b = IncrementalSync.latestByKey(batch2, Seq("id"), "cursor")
        .withColumn("_graft_bucket", pmod(hash(col("id")), lit(32)).cast("int"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      b.count()
      b
    }
    stage("  touched distinct collect") {
      bucketed.select(col("_graft_bucket")).distinct().collect()
    }
    stage("  merge 1k (end-to-end again)") {
      BucketedMergeTarget.merge(batch2, store, Seq("id"), "cursor")
    }
    spark.stop()
    println("[mergeprofile] done")
  }
}
