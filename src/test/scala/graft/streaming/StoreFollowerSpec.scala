package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sinks.BucketedMergeTarget

/** StoreFollower: the changed-bucket feed advances with the manifest,
  * reads only what changed, and the bucket-replace mirror replicates
  * upserts, deletes and emptied buckets exactly. */
class StoreFollowerSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def root(prefix: String): java.nio.file.Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  private def kv(rows: Seq[(Long, Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "cursor", "v")
  }

  private def contents(path: String): Set[(Long, Long, String)] =
    BucketedMergeTarget.read(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("poll: first poll emits everything, steady state is None, deltas are incremental") {
    val r = root("follow-poll")
    val src = r.resolve("src").toString
    val base = (0L until 160L).map(i => (i, 1L, s"v$i"))
    BucketedMergeTarget.merge(kv(base), src, Seq("id"), "cursor", nBuckets = 8)

    val d1 = StoreFollower.poll(spark, src, StoreFollower.Start).get
    assert(d1.version == 1L)
    assert(d1.rows.collect().map(_.getLong(0)).toSet == base.map(_._1).toSet)

    // nothing new → None (no data I/O, no job)
    assert(StoreFollower.poll(spark, src, d1.state).isEmpty)

    // a one-key update touches one bucket; the delta reads ONLY that
    // bucket's current dir (at-least-once per key, 1/8 of the store)
    BucketedMergeTarget.merge(kv(Seq((42L, 2L, "v42b"))), src, Seq("id"), "cursor")
    val d2 = StoreFollower.poll(spark, src, d1.state).get
    assert(d2.version == 2L)
    assert(d2.changedBuckets.size == 1)
    val emitted = d2.rows.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(emitted(42L) == "v42b")
    assert(emitted.size * 4 <= base.size, s"delta re-emitted ${emitted.size} rows — not bucket-pruned")
    // the delta's scan lists only the changed bucket's files
    assert(d2.rows.inputFiles.length * 4 <= d1.rows.inputFiles.length)

    // a LAGGING follower (never advanced past d1) catches up both
    // versions in one poll — diff is against ITS state, not history
    BucketedMergeTarget.merge(kv(Seq((7L, 2L, "v7b"))), src, Seq("id"), "cursor")
    val dLag = StoreFollower.poll(spark, src, d1.state).get
    assert(dLag.version == 3L)
    val lagged = dLag.rows.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(lagged(42L) == "v42b" && lagged(7L) == "v7b")
  }

  test("replicate mirrors upserts, deletes and emptied buckets exactly") {
    val r = root("follow-repl")
    val src = r.resolve("src").toString
    val dst = r.resolve("dst").toString
    val base = (0L until 200L).map(i => (i, 1L, s"v$i"))
    BucketedMergeTarget.merge(kv(base), src, Seq("id"), "cursor", nBuckets = 8)

    var st = StoreFollower.replicate(spark, src, dst)
    assert(contents(dst) == contents(src))

    // upserts AND deletes in one source commit → one mirrored commit
    BucketedMergeTarget.applyBatch(
      kv(Seq((3L, 2L, "v3b"), (777L, 2L, "new"))),
      kv(Seq((5L, 0L, ""), (13L, 0L, ""))).select("id"),
      src, Seq("id"), "cursor")
    st = StoreFollower.replicate(spark, src, dst, st)
    val mirrored = contents(dst)
    assert(mirrored == contents(src))
    assert(!mirrored.exists(t => t._1 == 5L || t._1 == 13L), "deletes must propagate")
    assert(mirrored.contains((3L, 2L, "v3b")) && mirrored.contains((777L, 2L, "new")))

    // empty a whole bucket at the source (delete every key in bucket 0's
    // id set) — the mirror's bucket must empty too
    val b0 = BucketedMergeTarget.read(spark, src)
      .withColumn("b", pmod(hash(col("id")), lit(8)).cast("int"))
      .filter(col("b") === 0).select("id")
    BucketedMergeTarget.deleteKeys(b0, src, Seq("id"))
    st = StoreFollower.replicate(spark, src, dst, st)
    assert(contents(dst) == contents(src))

    // replays are idempotent: re-applying from Start converges to the same state
    StoreFollower.replicate(spark, src, dst, StoreFollower.Start)
    assert(contents(dst) == contents(src))

    // steady state: nothing pending
    assert(StoreFollower.poll(spark, src, st).isEmpty)
  }

  test("a compaction commit over the watermark advances with ZERO changed buckets") {
    val r = root("follow-compact")
    val src = r.resolve("src").toString
    val dst = r.resolve("dst").toString
    BucketedMergeTarget.merge(kv((0L until 160L).map(i => (i, 1L, s"v$i"))),
      src, Seq("id"), "cursor", nBuckets = 8)
    BucketedMergeTarget.merge(kv(Seq((3L, 2L, "u3"))), src, Seq("id"), "cursor", 8)
    var st = StoreFollower.replicate(spark, src, dst)
    // compaction moves every bucket's owner dir but changes no contents:
    // the follower must advance past it without reading a single bucket
    BucketedMergeTarget.compact(spark, src)
    val d = StoreFollower.poll(spark, src, st).get
    assert(d.changedBuckets.isEmpty,
      s"compaction re-emitted ${d.changedBuckets.size} buckets of unchanged content")
    assert(d.rows.isEmpty)
    st = d.state
    assert(StoreFollower.poll(spark, src, st).isEmpty) // steady again
    // a STALE follower (watermark older than the compaction base) gets
    // the conservative full diff — correctness over cleverness
    val dStale = StoreFollower.poll(spark, src, StoreFollower.Start).get
    assert(dStale.changedBuckets.nonEmpty)
    // and real changes after the compaction flow incrementally
    BucketedMergeTarget.merge(kv(Seq((7L, 3L, "u7"))), src, Seq("id"), "cursor", 8)
    val d2 = StoreFollower.poll(spark, src, st).get
    assert(d2.changedBuckets.size == 1)
    st = StoreFollower.replicate(spark, src, dst, st)
    assert(contents(dst) == contents(src))
  }

  test("replicate refuses a bucket-count mismatch instead of scattering rows") {
    val r = root("follow-nb")
    val src = r.resolve("src").toString
    val dst = r.resolve("dst").toString
    BucketedMergeTarget.merge(kv(Seq((1L, 1L, "a"))), src, Seq("id"), "cursor", nBuckets = 8)
    // a pre-existing replica with a DIFFERENT layout must be rejected
    BucketedMergeTarget.merge(kv(Seq((9L, 1L, "z"))), dst, Seq("id"), "cursor", nBuckets = 4)
    val e = intercept[IllegalArgumentException] {
      StoreFollower.replicate(spark, src, dst)
    }
    assert(e.getMessage.contains("bucket identity"))
  }
}
