package graft.sinks

import java.nio.file.{Files, Path => JPath}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.Dedup

/** SpanGramStore: segment-append lifecycle, manifest atomicity, pruned
  * probes, compaction, gc retention, and the idempotent-replay contract
  * of the incremental span-excise operator built on it. */
class SpanGramStoreSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def tmp(prefix: String): JPath = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  /** (bucket, __h, doc_id, __pos) batch rows; bucket = h mod 4. */
  private def grams(rows: (Long, Long, Int)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("__h", "doc_id", "__pos")
      .select(pmod(col("__h"), lit(4L)).cast("int").as("bucket"),
        col("__h"), col("doc_id"), col("__pos"))
  }

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("manifest JSON round-trips, including empty segment/bucket lists") {
    val m = SpanGramStore.Manifest(3L, 8, "c3RydWN0",
      Seq(SpanGramStore.Segment("_seg_v000000001_ab12cd34", Seq(0, 3, 7), 42L),
        SpanGramStore.Segment("_seg_v000000003_99aabbcc", Nil, 0L)))
    assert(SpanGramStore.manifestFromJson(SpanGramStore.manifestToJson(m)) == m)
    val empty = SpanGramStore.Manifest(1L, 4, "c3RydWN0", Nil)
    assert(SpanGramStore.manifestFromJson(SpanGramStore.manifestToJson(empty)) == empty)
  }

  test("append creates segments; probe prunes to requested buckets; rowCount is metadata") {
    val store = tmp("span-append").resolve("s").toString
    assert(!SpanGramStore.exists(spark, store))
    SpanGramStore.append(grams((0L, 1L, 0), (1L, 1L, 1), (5L, 2L, 0)), store, 4)
    SpanGramStore.append(grams((2L, 3L, 0), (5L, 3L, 1)), store, 4)
    assert(SpanGramStore.exists(spark, store))
    assert(SpanGramStore.segmentCount(spark, store) == 2)
    assert(SpanGramStore.rowCount(spark, store) == 5L)
    // bucket 1 holds h=1 (doc 1) and h=5 (docs 2, 3) — across both segments
    val b1 = SpanGramStore.probe(spark, store, Set(1))
      .select("__h", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b1 == Set((1L, 1L), (5L, 2L), (5L, 3L)))
    // bucket 3 was never written: empty, with the store schema
    val b3 = SpanGramStore.probe(spark, store, Set(3))
    assert(b3.count() == 0L)
    assert(b3.columns.contains("__h"))
  }

  test("bucket-layout mismatch on append fails loudly") {
    val store = tmp("span-layout").resolve("s").toString
    SpanGramStore.append(grams((0L, 1L, 0)), store, 4)
    val e = intercept[IllegalArgumentException] {
      SpanGramStore.append(grams((1L, 2L, 0)), store, 8)
    }
    assert(e.getMessage.contains("bucket layout"))
  }

  test("compact folds segments to one, preserves contents, then gc reclaims inputs one commit later") {
    val store = tmp("span-compact").resolve("s").toString
    (0 until 4).foreach { i =>
      // two buckets per segment (i and i+1 mod 4) → compaction has
      // multiple files per bucket to fold
      SpanGramStore.append(grams((i.toLong, 10L + i, 0), (i.toLong + 1, 20L + i, 1)), store, 4)
    }
    val before = SpanGramStore.read(spark, store)
      .select("__h", "doc_id", "__pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(SpanGramStore.segmentCount(spark, store) == 4)
    val filesBefore = SpanGramStore.fileCount(spark, store)

    val stats = SpanGramStore.compact(spark, store)
    assert(stats.nSegments == 1)
    assert(SpanGramStore.segmentCount(spark, store) == 1)
    val after = SpanGramStore.read(spark, store)
      .select("__h", "doc_id", "__pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(after == before)
    assert(SpanGramStore.fileCount(spark, store) < filesBefore)

    // retention: the compaction inputs survive until the NEXT commit
    // (previous-manifest fallback), then gc reclaims them
    val (f, p) = {
      val hp = new Path(store)
      (hp.getFileSystem(spark.sessionState.newHadoopConf()), hp)
    }
    def segDirs = f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_seg_")).toSet
    assert(segDirs.size == 5) // 4 inputs + 1 compacted
    SpanGramStore.append(grams((9L, 99L, 0)), store, 4)
    assert(segDirs.size == 2) // compacted + the new segment
    assert(SpanGramStore.rowCount(spark, store) == 9L)
  }

  test("compact on a single-segment or missing store is a no-op") {
    val store = tmp("span-noop").resolve("s").toString
    assert(SpanGramStore.compact(spark, store).nSegments == 0)
    SpanGramStore.append(grams((0L, 1L, 0)), store, 4)
    val v = SpanGramStore.currentManifest(spark, store).get.version
    assert(SpanGramStore.compact(spark, store).version == v) // no commit
  }

  test("empty batch commits a manifest bump with no segment") {
    val store = tmp("span-empty").resolve("s").toString
    SpanGramStore.append(grams((0L, 1L, 0)), store, 4)
    SpanGramStore.append(grams().limit(0), store, 4)
    assert(SpanGramStore.currentManifest(spark, store).get.version == 2L)
    assert(SpanGramStore.segmentCount(spark, store) == 1)
    assert(SpanGramStore.rowCount(spark, store) == 1L)
  }

  test("torn newest manifest falls back to previous committed state") {
    val store = tmp("span-torn").resolve("s").toString
    SpanGramStore.append(grams((0L, 1L, 0)), store, 4)
    val (f, p) = {
      val hp = new Path(store)
      (hp.getFileSystem(spark.sessionState.newHadoopConf()), hp)
    }
    val torn = new Path(p, "_span_manifest_v000000002.json")
    val out = f.create(torn, true)
    try out.write("{\"version\":2,".getBytes("UTF-8")) finally out.close()
    assert(SpanGramStore.currentManifest(spark, store).get.version == 1L)
  }

  test("incremental span excise is IDEMPOTENT under replay (committed append, retried batch)") {
    val root = tmp("span-retry")
    val store = root.resolve("grams").toString
    Dedup.spanStoreAppend(docs(1L -> "a b c d e f"), "doc_id", "text",
      k = 3, store, nBuckets = 4)
    val batch = docs(
      11L -> "x a b c d y",            // store grams inside → excised
      12L -> "p q r s t",              // batch-first → kept
      13L -> "p q r s t",              // batch-duplicate → excised
      14L -> "fresh words only here")
    def run() = Dedup.duplicateSpanExciseIncremental(batch, "doc_id", "text",
        k = 3, store, nBuckets = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val first = run()
    assert(first(11L) == ((6L, 4L, "x y")))
    assert(first(13L) == ((5L, 5L, "")))
    // the batch's grams are now COMMITTED (the crashed-after-append
    // scenario); the retry must excise identically — its own committed
    // history is not seniority against itself
    val retry = run()
    assert(retry == first)
    // and a genuinely NEW doc still sees the batch's grams as senior
    val later = Dedup.duplicateSpanExciseIncremental(docs(21L -> "p q r s t"),
        "doc_id", "text", k = 3, store, nBuckets = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(later(21L) == ((5L, 5L, "")))
  }

  test("excise output survives later appends AND a compaction (checkpointed seeds)") {
    val root = tmp("span-lifetime")
    val store = root.resolve("grams").toString
    Dedup.spanStoreAppend(docs(1L -> "a b c d e f"), "doc_id", "text",
      k = 3, store, nBuckets = 4)
    val out = Dedup.duplicateSpanExciseIncremental(docs(11L -> "x a b c d y"),
      "doc_id", "text", k = 3, store, nBuckets = 4)
    // two more commits retire every manifest the probe planned against,
    // and compaction gc's its input segments
    Dedup.spanStoreAppend(docs(2L -> "m n o p q r"), "doc_id", "text",
      k = 3, store, nBuckets = 4)
    Dedup.spanStoreCompact(spark, store)
    Dedup.spanStoreAppend(docs(3L -> "s t u v w"), "doc_id", "text",
      k = 3, store, nBuckets = 4)
    val rows = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows(11L) == ((6L, 4L, "x y")))
  }

  test("auto-compaction folds the store exactly when the segment count crosses compactAbove") {
    val store = tmp("span-autocompact").resolve("grams").toString
    // below the threshold: every append accretes one more segment
    (1 to 3).foreach { i =>
      val st = Dedup.spanStoreAppend(docs(i.toLong -> s"w$i x$i y$i z$i q$i"),
        "doc_id", "text", k = 3, store, nBuckets = 4, compactAbove = 3)
      assert(st.nSegments == i, s"append $i must accrete, not fold")
    }
    assert(SpanGramStore.segmentCount(spark, store) == 3)
    val before = SpanGramStore.rowCount(spark, store)
    // the 4th append crosses 3 → the ingest call itself folds to one
    val st4 = Dedup.spanStoreAppend(docs(4L -> "a4 b4 c4 d4 e4"),
      "doc_id", "text", k = 3, store, nBuckets = 4, compactAbove = 3)
    assert(st4.nSegments == 1, "trigger crossed — the returned stats are the fold's")
    assert(SpanGramStore.segmentCount(spark, store) == 1)
    assert(SpanGramStore.rowCount(spark, store) > before, "the 4th batch's rows are in")
    // disabled trigger (<= 0): accretion resumes unbounded
    (5 to 7).foreach { i =>
      Dedup.spanStoreAppend(docs(i.toLong -> s"m$i n$i o$i p$i r$i"),
        "doc_id", "text", k = 3, store, nBuckets = 4, compactAbove = 0)
    }
    assert(SpanGramStore.segmentCount(spark, store) == 4)
    // the incremental excise path carries the same trigger: one ingest
    // call crossing the threshold leaves a folded store behind
    val out = Dedup.duplicateSpanExciseIncremental(docs(8L -> "f8 g8 h8 i8 j8"),
      "doc_id", "text", k = 3, store, nBuckets = 4, compactAbove = 4)
    assert(out.count() == 1)
    assert(SpanGramStore.segmentCount(spark, store) == 1)
  }

  test("auto-fold losing its version slot to a concurrent commit does NOT fail the ingest") {
    // Two concurrent ingests can both cross compactAbove: the manifest
    // protocol arbitrates every commit, so one writer's FOLD can lose
    // its version slot to the other's commit. The losing fold must be
    // swallowed — the loser's APPEND already committed durably, and
    // failing the call would tell the caller to replay a batch that is
    // already in. Simulated deterministically: the fold's target
    // version slot is pre-occupied on disk (publishExclusive treats any
    // existing file as the winner — a valid concurrent manifest and a
    // crashed writer's torn one look identical to the loser).
    val root = tmp("span-foldrace")
    val store = root.resolve("grams").toString
    (1 to 3).foreach { i =>
      Dedup.spanStoreAppend(docs(i.toLong -> s"a$i b$i c$i d$i e$i"),
        "doc_id", "text", k = 3, store, nBuckets = 4, compactAbove = 0)
    }
    assert(SpanGramStore.segmentCount(spark, store) == 3) // manifest v3
    // occupy the fold's slot: append will commit v4, its auto-fold v5
    val planted = root.resolve("grams").resolve("_span_manifest_v000000005.json")
    Files.writeString(planted, "torn-or-concurrent garbage")
    val st = Dedup.spanStoreAppend(docs(4L -> "f4 g4 h4 i4 j4"),
      "doc_id", "text", k = 3, store, nBuckets = 4, compactAbove = 3)
    // the call survived; the returned stats are the committed APPEND's
    // (4 accreted segments), not a fold's
    assert(st.nSegments == 4, "append committed, lost fold swallowed")
    assert(SpanGramStore.segmentCount(spark, store) == 4)
    val rows = SpanGramStore.rowCount(spark, store)
    assert(rows > 0)
    // the slot-owner resolves (here: the torn debris is cleared); the
    // NEXT threshold-crossing ingest re-folds — maintenance deferred,
    // never lost
    Files.delete(planted)
    Dedup.spanStoreAppend(docs(5L -> "k5 l5 m5 n5 o5"),
      "doc_id", "text", k = 3, store, nBuckets = 4, compactAbove = 3)
    assert(SpanGramStore.segmentCount(spark, store) == 1, "deferred fold landed")
    assert(SpanGramStore.rowCount(spark, store) > rows, "batch 5's rows are in")
    // an explicit maintenance compact still fails LOUDLY on a lost slot
    // (strict callers schedule it themselves and want the error)
    (6 to 8).foreach { i =>
      Dedup.spanStoreAppend(docs(i.toLong -> s"p$i q$i r$i s$i t$i"),
        "doc_id", "text", k = 3, store, nBuckets = 4, compactAbove = 0)
    }
    val v = SpanGramStore.currentManifest(spark, store).get.version
    val planted2 = root.resolve("grams")
      .resolve(f"_span_manifest_v${v + 1}%09d.json")
    Files.writeString(planted2, "occupied")
    intercept[java.io.IOException] {
      SpanGramStore.compact(spark, store)
    }
  }
}
