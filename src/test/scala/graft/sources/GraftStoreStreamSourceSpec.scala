package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sinks.BucketedMergeTarget

/** The graft-store STREAMING SOURCE: initial snapshot, changed-bucket
  * deltas (I/O ∝ change, not store size), and store→store replication
  * with `format("graft-store")` on BOTH ends of a streaming query. */
class GraftStoreStreamSourceSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def tmp(prefix: String): java.nio.file.Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  private def kv(rows: Seq[(Long, Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "cursor", "v")
  }

  test("snapshot then changed-bucket delta: unchanged buckets are not re-emitted") {
    val root = tmp("gsrc-delta")
    val src = root.resolve("store").toString
    val seed = (0L until 160L).map(i => (i, 1L, s"v$i"))
    BucketedMergeTarget.merge(kv(seed), src, Seq("id"), "cursor", nBuckets = 8)

    val q = spark.readStream.format("graft-store").load(src)
      .writeStream.format("memory").queryName("gsrc_delta")
      .outputMode("append")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val afterSnap = spark.table("gsrc_delta").count()
      assert(afterSnap == 160L, s"first batch must be the full snapshot, got $afterSnap")

      // one commit touching a single key → exactly one bucket changes
      BucketedMergeTarget.merge(kv(Seq((42L, 2L, "v42!"))),
        src, Seq("id"), "cursor", nBuckets = 8)
      q.processAllAvailable()
      val all = spark.table("gsrc_delta")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val second = all.length - 160
      // the delta re-emits only id=42's bucket: ~1/8 of the keys, never all
      assert(second > 0, "the changed bucket must be re-emitted")
      assert(second <= 160 / 4,
        s"delta re-emitted $second rows — unchanged buckets leaked into the batch")
      assert(all.contains((42L, 2L, "v42!")), "the updated row must be in the delta")
      // latest-wins over the append log reconstructs the store state
      val latest = all.groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSet
      val want = seed.filterNot(_._1 == 42L).toSet + ((42L, 2L, "v42!"))
      assert(latest == want)
    } finally q.stop()
  }

  test("no new commit → no new batch (steady state is offset polls only)") {
    val root = tmp("gsrc-idle")
    val src = root.resolve("store").toString
    BucketedMergeTarget.merge(kv((0L until 20L).map(i => (i, 1L, s"v$i"))),
      src, Seq("id"), "cursor", nBuckets = 4)
    val q = spark.readStream.format("graft-store").load(src)
      .writeStream.format("memory").queryName("gsrc_idle")
      .outputMode("append")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("gsrc_idle").count() == 20L)
      q.processAllAvailable() // nothing new committed
      assert(spark.table("gsrc_idle").count() == 20L,
        "an idle store must not produce another batch")
    } finally q.stop()
  }

  test("maxBucketsPerTrigger walks a large delta as bounded micro-batches") {
    val root = tmp("gsrc-bounded")
    val src = root.resolve("store").toString
    val seed = (0L until 160L).map(i => (i, 1L, s"v$i"))
    BucketedMergeTarget.merge(kv(seed), src, Seq("id"), "cursor", nBuckets = 8)

    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-store")
      .option("maxBucketsPerTrigger", "3").load(src)
      .writeStream
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val n = df.count()
        batchSizes.synchronized { batchSizes += n }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      // the 8-bucket snapshot must arrive as ceil(8/3) = 3 bounded
      // batches, not one big one — and nothing may be lost or doubled
      val sizes = batchSizes.synchronized(batchSizes.toList)
      assert(sizes.count(_ > 0) == 3,
        s"snapshot should walk through as 3 bounded batches, got $sizes")
      assert(sizes.sum == 160L, s"walk must cover every row exactly once: $sizes")
      assert(sizes.max < 160L, s"no single batch may carry the whole store: $sizes")

      // a single-key update after the walk is one small batch again
      BucketedMergeTarget.merge(kv(Seq((42L, 2L, "v42!"))),
        src, Seq("id"), "cursor", nBuckets = 8)
      q.processAllAvailable()
      val after = batchSizes.synchronized(batchSizes.toList).drop(sizes.length)
      assert(after.count(_ > 0) == 1 && after.sum <= 160 / 4,
        s"post-walk delta should be one bucket-sized batch, got $after")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the snapshot in bounded batches, then stops") {
    val root = tmp("gsrc-avnow")
    val src = root.resolve("store").toString
    BucketedMergeTarget.merge(kv((0L until 80L).map(i => (i, 1L, s"v$i"))),
      src, Seq("id"), "cursor", nBuckets = 8)
    val q = spark.readStream.format("graft-store")
      .option("maxBucketsPerTrigger", "3").load(src)
      .writeStream.format("memory").queryName("gsrc_avnow")
      .outputMode("append")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      assert(!q.isActive, "AvailableNow query must self-terminate after draining")
      assert(spark.table("gsrc_avnow").count() == 80L,
        "the run-once drain must cover the whole snapshot")
    } finally if (q.isActive) q.stop()
  }

  test("store→store streaming replication: graft-store on both ends") {
    val root = tmp("gsrc-repl")
    val src = root.resolve("src").toString
    val dst = root.resolve("dst").toString
    val seed = (0L until 120L).map(i => (i, 1L, s"v$i"))
    BucketedMergeTarget.merge(kv(seed), src, Seq("id"), "cursor", nBuckets = 8)

    val q = spark.readStream.format("graft-store").load(src)
      .writeStream.format("graft-store")
      .option("pk", "id").option("cursor", "cursor").option("buckets", "8")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start(dst)
    try {
      q.processAllAvailable()
      // two more source commits: an update wave and a fresh insert
      BucketedMergeTarget.merge(
        kv((0L until 120L by 10L).map(i => (i, 2L, s"u$i"))),
        src, Seq("id"), "cursor", nBuckets = 8)
      BucketedMergeTarget.merge(kv(Seq((500L, 2L, "new"))),
        src, Seq("id"), "cursor", nBuckets = 8)
      q.processAllAvailable()
      val got = spark.read.format("graft-store").load(dst)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val want = seed.map { case (i, c, v) =>
        if (i % 10 == 0) (i, 2L, s"u$i") else (i, c, v)
      }.toSet + ((500L, 2L, "new"))
      assert(got == want, "mirror must converge to the source's latest-wins state")
    } finally q.stop()
  }

  test("a compaction commit emits NO micro-batch; later changes still flow") {
    val root = tmp("gsrc-compact")
    val src = root.resolve("store").toString
    BucketedMergeTarget.merge(kv((0L until 160L).map(i => (i, 1L, s"v$i"))),
      src, Seq("id"), "cursor", nBuckets = 8)
    val q = spark.readStream.format("graft-store").load(src)
      .writeStream.format("memory").queryName("gsrc_compact")
      .outputMode("append")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("gsrc_compact").count() == 160L)
      // content-identical by construction: nothing to emit
      BucketedMergeTarget.compact(spark, src)
      q.processAllAvailable()
      assert(spark.table("gsrc_compact").count() == 160L,
        "a compaction commit re-emitted unchanged content into the stream")
      // an update after the compaction arrives as a normal bounded delta
      BucketedMergeTarget.merge(kv(Seq((42L, 2L, "v42!"))),
        src, Seq("id"), "cursor", nBuckets = 8)
      q.processAllAvailable()
      val after = spark.table("gsrc_compact").count()
      assert(after > 160L && after <= 160L + 160L / 4,
        s"post-compaction delta should be one bucket, got ${after - 160L} rows")
    } finally q.stop()
  }

  test("tombstone mode propagates deletes through store→store replication") {
    val root = tmp("gsrc-tomb")
    val src = root.resolve("src").toString
    val dst = root.resolve("dst").toString
    val seed = (0L until 120L).map(i => (i, 1L, s"v$i"))
    BucketedMergeTarget.merge(kv(seed), src, Seq("id"), "cursor", nBuckets = 8)

    val q = spark.readStream.format("graft-store")
      .option("tombstones", "true").load(src)
      .writeStream.format("graft-store")
      .option("pk", "id").option("cursor", "cursor").option("buckets", "8")
      .option("tombstoneCol", "_deleted")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start(dst)
    try {
      q.processAllAvailable()
      assert(spark.read.format("graft-store").load(dst).count() == 120L)
      // one commit carrying updates AND deletes
      BucketedMergeTarget.applyBatch(
        kv((0L until 120L by 10L).map(i => (i, 2L, s"u$i"))),
        kv(Seq((7L, 0L, ""), (77L, 0L, ""), (111L, 0L, ""))).select("id"),
        src, Seq("id"), "cursor")
      q.processAllAvailable()
      val got = spark.read.format("graft-store").load(dst)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val want = seed.filterNot(t => Set(7L, 77L, 111L).contains(t._1)).map {
        case (i, c, v) => if (i % 10 == 0) (i, 2L, s"u$i") else (i, c, v)
      }.toSet
      assert(got == want,
        "mirror must drop deleted keys and keep updates — no StoreFollower involved")
      // the mirror's schema carries no tombstone column — it is a marker,
      // not data
      assert(!spark.read.format("graft-store").load(dst)
        .columns.contains("_deleted"))
    } finally q.stop()
  }

  test("upsert-only default is unchanged: deleted keys simply stop appearing") {
    val root = tmp("gsrc-notomb")
    val src = root.resolve("store").toString
    BucketedMergeTarget.merge(kv((0L until 40L).map(i => (i, 1L, s"v$i"))),
      src, Seq("id"), "cursor", nBuckets = 8)
    val q = spark.readStream.format("graft-store").load(src)
      .writeStream.format("memory").queryName("gsrc_notomb")
      .outputMode("append")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      BucketedMergeTarget.applyBatch(
        kv(Seq((1L, 2L, "u1"))), kv(Seq((2L, 0L, ""))).select("id"),
        src, Seq("id"), "cursor")
      q.processAllAvailable()
      val cols = spark.table("gsrc_notomb").columns.toSeq
      assert(cols == Seq("id", "cursor", "v"), s"default feed grew a column: $cols")
      // the deleted key's row count never grows after the delete batch
      val afterDelete = spark.table("gsrc_notomb").filter(col("id") === 2L).count()
      assert(afterDelete == 1L, "upsert-only feed must not re-emit a deleted key")
    } finally q.stop()
  }

  test("restart recovery costs ONE full-store batch, not two (ADVICE r5)") {
    // Drive the Source API the way the engine does on restart: a fresh
    // source instance (pinned walk state lost) replays the checkpointed
    // uncommitted offset via getBatch — the recovery branch re-emits the
    // whole store — then commits it. That commit must adopt the recovery
    // manifest as the diff base: the next getOffset has nothing new to
    // hand out. Pre-fix, committedBase stayed None and the source began a
    // SECOND full-store walk.
    val root = tmp("gsrc-recover")
    val src = root.resolve("store").toString
    BucketedMergeTarget.merge(kv((0L until 160L).map(i => (i, 1L, s"v$i"))),
      src, Seq("id"), "cursor", nBuckets = 8)
    val m1 = BucketedMergeTarget.currentManifest(spark, src).get
    assert(m1.version == 1L)

    val source = new GraftStoreStreamSource(spark, src, m1.schema, Some(3))
    // engine restart: replay the uncommitted slice (v1, 3 of 8 buckets)
    source.getBatch(None, StoreSourceOffset(1L, 3))
    source.commit(StoreSourceOffset(1L, 3))
    // the recovery batch covered the ENTIRE store — nothing left to emit
    assert(source.getOffset.isEmpty,
      "post-recovery poll restarted a full-store walk (second re-emit)")

    // and a NEW commit diffs against the adopted base: one changed bucket
    BucketedMergeTarget.merge(kv(Seq((42L, 2L, "v42!"))),
      src, Seq("id"), "cursor", nBuckets = 8)
    val off = source.getOffset.map(StoreSourceOffset.of)
    assert(off.exists(o => o.version == 2L && o.emitted == 1),
      s"expected a one-bucket delta against the recovered base, got $off")
  }
}
