package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.streaming.StreamingSync

class MultimodalStreamingSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def media() = {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "hello world payload"), (2L, "x")).toDF("id", "txt")
    Multimodal.toMediaFrame(df, col("id"), encode(col("txt"), "UTF-8"),
      kind = "image", format = "fake")
  }

  test("toMediaFrame carries opaque binary + typed metadata") {
    val m = media()
    // same names and types (nullability flags differ for literal columns;
    // simpleString renders structure without them)
    assert(m.schema.simpleString == Multimodal.mediaSchema.simpleString)
    val r = m.orderBy("media_id").head()
    assert(r.getAs[String]("kind") == "image")
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world payload")
    assert(r.getStruct(3).getAs[Int]("n_bytes") == 19)
    assert(r.getStruct(3).isNullAt(1)) // width unknown before decode
  }

  test("decodeMeta fills dims partition-wise via the codec") {
    val decoded = Multimodal.decodeMeta(media(), Multimodal.StubCodec)
      .orderBy("media_id").collect()
    val m1 = decoded(0).getStruct(3)
    assert((m1.getAs[Int]("width"), m1.getAs[Int]("height")) ==
      Multimodal.StubCodec.decodeDims("hello world payload".getBytes("UTF-8")))
  }

  test("resizeMedia rewrites payload and dims deterministically") {
    val resized = Multimodal.resizeMedia(media(), Multimodal.StubCodec, 2, 3)
      .orderBy("media_id").collect()
    assert(resized(0).getAs[Array[Byte]]("payload").length == 6) // 2*3 target
    val meta = resized(0).getStruct(3)
    assert(meta.getAs[Int]("width") == 2 && meta.getAs[Int]("height") == 3)
    assert(resized(1).getAs[Array[Byte]]("payload").length == 1) // min(6, len)
  }

  test("sampleFrames emits byte-slice frames with stable indexes") {
    val frames = Multimodal.sampleFrames(media().filter(col("media_id") === 1),
      Multimodal.StubCodec, 4).collect()
    assert(frames.length == 4)
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    val joined = frames.sortBy(_.getInt(1))
      .flatMap(_.getAs[Array[Byte]]("frame"))
    assert(new String(joined, "UTF-8").startsWith("hello world payl"))
  }

  test("featurize bridges media payloads into the ANN operators") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      (1L, "aaaa bbbb aaaa bbbb"), (2L, "aaaa bbbb aaaa bbbc"), // near-dup bytes
      (3L, "zzzz!!!! ???? ####"))
    val media = Multimodal.toMediaFrame(texts.toDF("id", "txt"),
      col("id"), encode(col("txt"), "UTF-8"), kind = "image", format = "fake")
    val feats = Multimodal.featurize(media, Multimodal.StubCodec, dim = 16)
    assert(feats.columns.toSeq == Seq("media_id", "features"))
    val byId = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(byId(1L).length == 16)
    assert(math.abs(byId(1L).sum - 1.0f) < 1e-5) // L1-normalized
    // the feature vectors feed straight into similarity search
    val q = byId(1L).toArray
    val top = graft.operators.Similarity.bruteForceTopK(
      feats, "media_id", "features", q, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 2L)) // self first, near-dup bytes second
  }

  test("gray PNG encode→ImageIO decode is lossless: samples == source bytes") {
    // the property the q_multimodal_ann oracle RELIES on: the decoded
    // raster of encodeGrayPng(bytes) is bit-exactly `bytes`, so pixel
    // statistics are replayable from the source
    val bytes = (0 until 256).map(_.toByte).toArray ++ "hello media".getBytes("UTF-8")
    val png = Multimodal.encodeGrayPng(bytes)
    // a real PNG, not a passthrough
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 1 && img.getHeight == bytes.length)
    val decoded = Array.tabulate(bytes.length)(i => img.getRaster.getSample(0, i, 0).toByte)
    assert(decoded.toSeq == bytes.toSeq, "gray PNG round-trip must be lossless")
  }

  test("ImageIoCodec: real dims, real histogram, real resize; non-images fall back") {
    val codec = new Multimodal.ImageIoCodec()
    val bytes = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val png = Multimodal.encodeGrayPng(bytes)
    // header-parsed dims, not the stub's length arithmetic
    assert(codec.decodeDims(png) == (1, bytes.length))
    // decoded-pixel histogram == byte histogram of the source (losslessness)
    assert(codec.extractFeatures(png, 16).toSeq ==
      Multimodal.StubCodec.extractFeatures(bytes, 16).toSeq)
    // a real scaled re-encode: output is a PNG with the requested dims
    val resized = codec.resize(png, 4, 8)
    assert(codec.decodeDims(resized) == (4, 8))
    // an image is its own single frame
    assert(codec.sampleFrames(png, 3).map(_.toSeq) == Seq(png.toSeq))
    // bytes ImageIO cannot parse take the fallback path wholesale
    assert(codec.decodeDims(bytes) == Multimodal.StubCodec.decodeDims(bytes))
    assert(codec.extractFeatures(bytes, 16).toSeq ==
      Multimodal.StubCodec.extractFeatures(bytes, 16).toSeq)
  }

  test("encodeAsPng rewrites payloads partition-wise; decodeMeta reads real dims") {
    val m = Multimodal.encodeAsPng(media())
    val rows = m.orderBy("media_id").collect()
    rows.foreach { r =>
      val p = r.getAs[Array[Byte]]("payload")
      assert(p.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      assert(r.getStruct(3).getAs[Int]("n_bytes") == p.length)
      assert(r.getStruct(3).getAs[String]("format") == "png")
    }
    // the decode pass now reports genuine image geometry
    val decoded = Multimodal.decodeMeta(m, new Multimodal.ImageIoCodec())
      .orderBy("media_id").collect()
    assert(decoded(0).getStruct(3).getAs[Int]("width") == 1)
    assert(decoded(0).getStruct(3).getAs[Int]("height") == 19) // "hello world payload"
    assert(decoded(1).getStruct(3).getAs[Int]("height") == 1)  // "x"
  }

  test("NativeCodec is an explicit stub (no media libs here)") {
    intercept[UnsupportedOperationException] { Multimodal.NativeCodec() }
  }

  test("windowed aggregation over a real stream with watermark + late data") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val t0 = Timestamp.valueOf("2024-05-01 10:05:00")
    val t1 = Timestamp.valueOf("2024-05-01 10:55:00")
    val t2 = Timestamp.valueOf("2024-05-01 11:10:00")
    input.addData((t0, "click", 1.5), (t1, "click", 2.5), (t2, "view", 4.0))
    StreamingSync.runWindowedToMemory(events, "1 hour", "10 minutes", "win_sink")

    val out = s.sql("SELECT * FROM win_sink")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set(
      ("2024-05-01 10:00:00.0", "click", 2L, 4.0),
      ("2024-05-01 11:00:00.0", "view", 1L, 4.0)))
  }

  test("session windows run under a real stream with watermarked state") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "user_id")
    val q = StreamingSync.sessionEventCounts(events, "30 minutes", Some("10 minutes"))
      .writeStream.format("memory").queryName("sess_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      // u1: two events 10 min apart (one session), then one 40 min later
      // (new session); u2: a single event
      input.addData(
        (Timestamp.valueOf("2024-05-01 10:00:00"), "u1"),
        (Timestamp.valueOf("2024-05-01 10:10:00"), "u1"),
        (Timestamp.valueOf("2024-05-01 10:50:00"), "u1"),
        (Timestamp.valueOf("2024-05-01 10:05:00"), "u2"))
      q.processAllAvailable()
      // advance the watermark far enough to close and emit every session
      input.addData((Timestamp.valueOf("2024-05-01 13:00:00"), "u3"))
      q.processAllAvailable()
    } finally q.stop()
    val out = s.sql("SELECT user_id, CAST(session_start AS STRING), n_events FROM sess_sink")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out.contains(("u1", "2024-05-01 10:00:00", 2L)))
    assert(out.contains(("u1", "2024-05-01 10:50:00", 1L)))
    assert(out.contains(("u2", "2024-05-01 10:05:00", 1L)))
  }

  test("stream-stream interval join attributes clicks to impressions, state bounded") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val impressions = MemoryStream[(String, Timestamp, String)]
    val clicks = MemoryStream[(String, Timestamp)]
    val joined = StreamingSync.intervalJoin(
      impressions.toDF().toDF("user_id", "lts", "ad"),
      clicks.toDF().toDF("user_id", "rts"),
      "user_id", within = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("attr_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      impressions.addData(
        ("u1", Timestamp.valueOf("2024-05-01 10:00:00"), "adA"),
        ("u2", Timestamp.valueOf("2024-05-01 10:05:00"), "adB"))
      clicks.addData(
        ("u1", Timestamp.valueOf("2024-05-01 10:20:00")), // within 30 min → match
        ("u2", Timestamp.valueOf("2024-05-01 11:05:00"))) // 60 min later → no match
      q.processAllAvailable()
      // advance both watermarks far enough to expire every buffered row
      impressions.addData(("wmL", Timestamp.valueOf("2024-05-01 14:00:00"), "x"))
      clicks.addData(("wmR", Timestamp.valueOf("2024-05-01 14:00:00")))
      q.processAllAvailable()
      val out = s.sql("SELECT user_id, ad, CAST(rts AS STRING) FROM attr_sink")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(out == Set(("u1", "adA", "2024-05-01 10:20:00")))
      // a click arriving after the impression's state expired finds nothing
      clicks.addData(("u1", Timestamp.valueOf("2024-05-01 10:21:00")))
      q.processAllAvailable()
      assert(s.sql("SELECT count(*) FROM attr_sink").head().getLong(0) == 1L)
    } finally q.stop()
  }

  test("streamingDedup keeps first occurrence per fingerprint, state watermark-bounded") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingSync.streamingDedup(docs, "text", "10 minutes")
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-05-01 10:00:00"), 1L, "Hello  World"),
        (Timestamp.valueOf("2024-05-01 10:01:00"), 2L, "hello world"), // same normalized fp
        (Timestamp.valueOf("2024-05-01 10:02:00"), 3L, "something else"))
      q.processAllAvailable()
      // a later micro-batch replaying the same content is still dropped
      // (fp within the watermark window)
      input.addData((Timestamp.valueOf("2024-05-01 10:03:00"), 4L, "HELLO WORLD"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = s.sql("SELECT doc_id FROM dedup_sink").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L)) // 2 and 4 are dups of 1 under normalization
  }

  test("foreachBatch streaming merge converges the parquet target") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("fb")
    val target = dir.resolve("target.parquet").toString
    val input = MemoryStream[(Long, Long, String)]
    val q = StreamingSync.streamingUpsertToParquet(
      input.toDF().toDF("id", "cursor", "v"), target,
      pkCols = Seq("id"), cursorCol = "cursor",
      checkpointDir = dir.resolve("ckpt").toString)
    try {
      input.addData((1L, 1L, "a"), (2L, 1L, "b"))
      q.processAllAvailable()
      // second batch: update 1, insert 3, stale duplicate for 2 loses
      input.addData((1L, 3L, "a2"), (3L, 2L, "c"), (2L, 0L, "stale"))
      q.processAllAvailable()
    } finally q.stop()
    val out = graft.sinks.BucketedMergeTarget.read(s, target)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(out == Seq(1L -> "a2", 2L -> "b", 3L -> "c"))
  }

  test("streaming latestByKey state keeps only the newest cursor per key") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[StreamingSync.Change]
    val q = StreamingSync.latestByKeyStream(input.toDS())
      .writeStream.format("memory").queryName("latest_sink")
      .outputMode(OutputMode.Update()).start()

    input.addData(
      StreamingSync.Change("u1", 1L, "a"),
      StreamingSync.Change("u1", 3L, "c"),
      StreamingSync.Change("u2", 2L, "b"))
    q.processAllAvailable()
    // an older replayed change must NOT regress the state
    input.addData(StreamingSync.Change("u1", 2L, "stale"))
    q.processAllAvailable()
    q.stop()

    val last = s.sql("SELECT key, cursor, payload FROM latest_sink")
      .groupBy("key").agg(max_by(struct(col("cursor"), col("payload")), col("cursor")).as("m"))
      .select(col("key"), col("m.cursor"), col("m.payload"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(last == Set(("u1", 3L, "c"), ("u2", 2L, "b")))
  }
}
