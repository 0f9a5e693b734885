package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sinks.BucketedMergeTarget

/** The graft-store SQL façade: format round-trip, view SQL, merge-write
  * semantics, and the property it exists for — bucket-key predicates
  * prune the scan to the manifest's matching bucket directories (the
  * readMatching pruning, observable in a plain SQL plan). */
class GraftStoreSourceSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.resolve("store").toString
  }

  private def kv(rows: Seq[(Long, Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "cursor", "v")
  }

  private def load(path: String): DataFrame =
    spark.read.format("graft-store").load(path)

  test("format read round-trips the store contents (and the short name resolves)") {
    val p = tmp("gstore-rt")
    val rows = (0L until 200L).map(i => (i, 1L, s"v$i"))
    BucketedMergeTarget.merge(kv(rows), p, Seq("id"), "cursor", nBuckets = 8)
    val got = load(p).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == rows.toSet)
    assert(load(p).schema.fieldNames.toSeq == Seq("id", "cursor", "v"))
  }

  test("bucket-key equality prunes the scan to the key's bucket directory") {
    val p = tmp("gstore-prune")
    BucketedMergeTarget.merge(kv((0L until 400L).map(i => (i, 1L, s"v$i"))),
      p, Seq("id"), "cursor", nBuckets = 8)
    val all = load(p)
    val allFiles = all.inputFiles.toSet
    val probe = all.filter(col("id") === 42L)
    val probeFiles = probe.inputFiles.toSet
    // the rewrite rule resolves both to native parquet scans; the probe
    // must list ONLY id=42's bucket dir — ~1/8 of the store's files
    assert(allFiles.nonEmpty, "full read should resolve to parquet files")
    assert(probeFiles.subsetOf(allFiles))
    assert(probeFiles.size * 4 <= allFiles.size,
      s"probe read ${probeFiles.size} of ${allFiles.size} files — no bucket pruning")
    assert(probe.collect().map(_.getLong(0)).toSeq == Seq(42L))
    // IN-list probes prune to the union of the keys' buckets
    val inProbe = all.filter(col("id").isin(7L, 42L))
    assert(inProbe.inputFiles.toSet.subsetOf(allFiles))
    assert(inProbe.inputFiles.size * 2 <= allFiles.size)
    assert(inProbe.collect().map(_.getLong(0)).toSet == Set(7L, 42L))
    // non-bucket-key predicates fall back to all buckets, still correct
    assert(all.filter(col("v") === "v7").collect().map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("multi-column probe-key stores prune on the full key tuple") {
    val s = spark
    import s.implicits._
    val p = tmp("gstore-multicol")
    val rows = for (band <- 0 until 4; h <- 0L until 50L)
      yield (band, h * 31 + band, band * 1000L + h, 1L)
    BucketedMergeTarget.merge(
      rows.toDF("band", "bh", "doc", "cursor"),
      p, Seq("band", "bh", "doc"), "cursor",
      nBuckets = 16, bucketCols = Seq("band", "bh"))
    val all = load(p)
    val allFiles = all.inputFiles.toSet
    val probe = all.filter(col("band") === 2 && col("bh") === (7L * 31 + 2))
    assert(probe.inputFiles.toSet.subsetOf(allFiles))
    assert(probe.inputFiles.size * 4 <= allFiles.size,
      s"tuple probe read ${probe.inputFiles.length} of ${allFiles.size} files")
    assert(probe.collect().map(_.getLong(2)).toSeq == Seq(2007L))
    // constraining only HALF the bucket key cannot prune (hash needs the
    // tuple) — must fall back to every bucket and stay correct
    val half = all.filter(col("band") === 2)
    assert(half.inputFiles.toSet == allFiles)
    assert(half.count() == 50L)
  }

  test("plain SQL over a graft-store view prunes and pushes remaining filters") {
    val p = tmp("gstore-sql")
    BucketedMergeTarget.merge(kv((0L until 400L).map(i => (i, 1L, s"v$i"))),
      p, Seq("id"), "cursor", nBuckets = 8)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gstore_t USING `graft-store` OPTIONS (path '$p')")
    try {
      val q = spark.sql("SELECT v FROM gstore_t WHERE id = 42")
      assert(q.collect().map(_.getString(0)).toSeq == Seq("v42"))
      assert(q.inputFiles.length * 4 <= load(p).inputFiles.length,
        "SQL-path probe did not bucket-prune")
      // the equality survives into the parquet scan's pushed filters
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("IsNotNull(id)"),
        s"no parquet pushdown in:\n$plan")
    } finally spark.catalog.dropTempView("gstore_t")
  }

  test("pruning survives a renaming projection between the filter and the store") {
    val p = tmp("gstore-proj")
    BucketedMergeTarget.merge(kv((0L until 400L).map(i => (i, 1L, s"v$i"))),
      p, Seq("id"), "cursor", nBuckets = 8)
    val all = load(p)
    val probe = all.select(col("id").as("key"), col("v"))
      .filter(col("key") === 42L)
    assert(probe.inputFiles.length * 4 <= all.inputFiles.length,
      "probe through a renamed projection did not bucket-prune")
    assert(probe.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((42L, "v42")))
    // ...and through STACKED re-renames (the alias map composes level by
    // level down the Project chain)
    val stacked = all.select(col("id").as("key"), col("v"))
      .select(col("key").as("k2"), col("v").as("w"))
      .filter(col("k2") === 42L)
    assert(stacked.inputFiles.length * 4 <= all.inputFiles.length,
      "probe through stacked projections did not bucket-prune")
    assert(stacked.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((42L, "v42")))
  }

  test("Ignore-mode save against an existing store is a true no-op (no pk needed)") {
    val p = tmp("gstore-ignore")
    kv(Seq((1L, 1L, "a"))).write.format("graft-store")
      .option("pk", "id").option("cursor", "cursor").mode("append").save(p)
    // no pk, no cursor: a skipped save must not fail on options only the
    // skipped write would have needed
    kv(Seq((9L, 9L, "x"))).write.format("graft-store").mode("ignore").save(p)
    assert(load(p).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("an empty first batch saves as a no-op instead of failing") {
    val s = spark
    import s.implicits._
    val p = tmp("gstore-empty")
    Seq.empty[(Long, Long, String)].toDF("id", "cursor", "v")
      .write.format("graft-store")
      .option("pk", "id").option("cursor", "cursor").mode("append").save(p)
    assert(!BucketedMergeTarget.exists(spark, p),
      "empty batch must not commit a manifest")
    // the store still bootstraps normally afterwards
    kv(Seq((1L, 1L, "a"))).write.format("graft-store")
      .option("pk", "id").option("cursor", "cursor").mode("append").save(p)
    assert(load(p).count() == 1L)
  }

  test("later writes default pk to the store's recorded key; a mismatch fails") {
    val p = tmp("gstore-pkdefault")
    kv(Seq((1L, 1L, "a"))).write.format("graft-store")
      .option("pk", "id").option("cursor", "cursor").mode("append").save(p)
    // no pk option: the manifest's recorded key is used
    kv(Seq((2L, 1L, "b"))).write.format("graft-store")
      .option("cursor", "cursor").mode("append").save(p)
    assert(load(p).count() == 2L)
    // a write keyed differently is refused (the store invariant, not a default)
    val e = intercept[IllegalArgumentException] {
      kv(Seq((3L, 1L, "c"))).write.format("graft-store")
        .option("pk", "v").option("cursor", "cursor").mode("append").save(p)
    }
    assert(e.getMessage.contains("keyed by"))
  }

  test("pruning is semantics-preserving for randomized probes (property)") {
    val p = tmp("gstore-prop")
    BucketedMergeTarget.merge(kv((0L until 300L).map(i => (i, 1L, s"v$i"))),
      p, Seq("id"), "cursor", nBuckets = 8)
    val all = load(p)
    val expected = (0L until 300L).map(i => (i, s"v$i")).toMap
    val rnd = new scala.util.Random(20260813L)
    (1 to 25).foreach { trial =>
      // half equality probes, half IN-lists; keys may miss the store
      // entirely (negative probes must return empty, not error)
      val keys = Seq.fill(1 + rnd.nextInt(4))(rnd.nextLong(350L))
      val probe =
        if (keys.size == 1) all.filter(col("id") === keys.head)
        else all.filter(col("id").isin(keys.map(Long.box): _*))
      val got = probe.select("id", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val want = keys.distinct.flatMap(k => expected.get(k).map(k -> _)).toSet
      assert(got == want, s"trial $trial keys=$keys")
    }
  }

  test("streaming sink: each micro-batch is one epoch-cursored merge commit") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("gstore-sink")
    val p = root.resolve("store").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v")
      .writeStream.format("graft-store")
      .option("pk", "id").option("buckets", "4")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start(p)
    try {
      input.addData(Seq((1L, "a"), (2L, "b"))); q.processAllAvailable()
      // epoch 2 updates id=2 and inserts id=3 — later epoch wins per key
      input.addData(Seq((2L, "b2"), (3L, "c"))); q.processAllAvailable()
    } finally q.stop()
    val got = load(p).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b2"), (3L, "c")))
    // two epochs = exactly two commits
    assert(BucketedMergeTarget.currentManifest(spark, p).get.version == 2L)
    // the stream-built store is a first-class facade citizen: SQL probes
    // prune and read it like any batch-built target
    assert(load(p).filter(col("id") === 3L).collect().map(_.getString(1)).toSeq == Seq("c"))
  }

  test("format write is a latest-wins merge, and Overwrite is refused") {
    val p = tmp("gstore-write")
    kv(Seq((1L, 1L, "a"), (2L, 1L, "b"))).write.format("graft-store")
      .option("pk", "id").option("cursor", "cursor").option("buckets", "4")
      .mode("append").save(p)
    // second batch: update id=2 (higher cursor), stale id=1 (lower loses), new id=3
    kv(Seq((1L, 0L, "stale"), (2L, 2L, "b2"), (3L, 1L, "c"))).write.format("graft-store")
      .option("pk", "id").option("cursor", "cursor").mode("append").save(p)
    val got = load(p).collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(got == Set((1L, "a"), (2L, "b2"), (3L, "c")))
    val e = intercept[IllegalArgumentException] {
      kv(Seq((9L, 1L, "x"))).write.format("graft-store")
        .option("pk", "id").option("cursor", "cursor").mode("overwrite").save(p)
    }
    assert(e.getMessage.contains("Overwrite"))
  }
}
