package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media is carried as an opaque `BINARY` payload column plus
  * a typed metadata struct, and per-row media transforms run
  * partition-wise (the Scala analog of `mapInPandas`: one iterator per
  * partition, library state initialized once per task, rows streamed
  * through without collecting).
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, codec
  * lifecycle — is real and tested. The actual byte decoding is behind
  * [[MediaCodec]]: this container has no image/audio libraries, so
  * [[StubCodec]] supplies a DETERMINISTIC FAKE (documented below) and
  * [[NativeCodec]] marks where a JNI/library-backed implementation plugs
  * in. Swapping codecs changes no plan shape.
  */
object Multimodal {

  /** media frame schema: (media_id, kind, payload, meta) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("format", StringType))))))

  /** Pluggable media codec. One instance is created per PARTITION (not
    * per row) inside mapPartitions — exactly where a real decoder would
    * hold its native contexts/buffers. */
  trait MediaCodec extends Serializable {
    def decodeDims(payload: Array[Byte]): (Int, Int)
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]]
    /** Fixed-width feature vector for similarity indexing. */
    def extractFeatures(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic fake codec: dimensions derived from payload length,
    * resize = proportional truncate/repeat, frame sampling = equal-size
    * byte slices. Stable across runs/engines → testable end-to-end. */
  object StubCodec extends MediaCodec {
    def decodeDims(payload: Array[Byte]): (Int, Int) =
      (payload.length % 640 + 1, (payload.length * 7) % 480 + 1)
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, math.min(w * h, payload.length))
      java.util.Arrays.copyOf(payload, target)
    }
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val k = math.max(1, n)
      val step = math.max(1, payload.length / k)
      (0 until k).map(i => payload.slice(i * step, math.min((i + 1) * step, payload.length)))
        .filter(_.nonEmpty)
    }
    /** Bucketed byte histogram, L1-normalized — a REAL (if crude)
      * content feature (byte distributions drive file-type detection);
      * deterministic, library-free, and a faithful stand-in for a model
      * embedding: fixed dim, density-valued, cosine-comparable. */
    def extractFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      val hist = new Array[Float](dim)
      payload.foreach(b => hist((b & 0xff) % dim) += 1f)
      val total = math.max(1f, payload.length.toFloat)
      hist.map(_ / total)
    }
  }

  /** Library-backed codec placeholder — the real JNI/FFmpeg/turbojpeg
    * binding goes here; absent in this container by design. */
  object NativeCodec {
    def apply(): MediaCodec =
      throw new UnsupportedOperationException(
        "no native media libraries in this environment — use StubCodec")
  }

  /** Wrap any table into the media frame: payload from a binary (or
    * castable) column, metadata populated column-side where possible
    * (n_bytes needs no decode — keep cheap fields out of the codec). */
  def toMediaFrame(df: DataFrame, idCol: Column, payload: Column,
                   kind: String, format: String): DataFrame =
    df.select(
      idCol.cast(LongType).as("media_id"),
      lit(kind).as("kind"),
      payload.cast(BinaryType).as("payload"))
      .withColumn("meta", struct(
        octet_length(col("payload")).as("n_bytes"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        lit(format).as("format")))

  /** Decode pass: fill width/height via the codec, partition-wise.
    * The mapPartitions batch shape (iterator→iterator, codec constructed
    * once per task) is the contract a real decoder needs; no collect, no
    * per-row setup cost. */
  def decodeMeta(df: DataFrame, codec: MediaCodec): DataFrame = {
    val schema = df.schema
    val payloadIdx = schema.fieldIndex("payload")
    val metaIdx = schema.fieldIndex("meta")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      val c = codec // per-partition codec instance
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val meta = r.getStruct(metaIdx)
        val (w, h) = c.decodeDims(payload)
        val newMeta = Row(meta.get(0), w, h, meta.get(3), meta.get(4))
        Row.fromSeq(r.toSeq.updated(metaIdx, newMeta))
      }
    }(enc)
  }

  /** Resize pass: payload rewritten partition-wise, meta dims updated. */
  def resizeMedia(df: DataFrame, codec: MediaCodec, w: Int, h: Int): DataFrame = {
    val schema = df.schema
    val payloadIdx = schema.fieldIndex("payload")
    val metaIdx = schema.fieldIndex("meta")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      val c = codec
      rows.map { r =>
        val resized = c.resize(r.getAs[Array[Byte]](payloadIdx), w, h)
        val meta = r.getStruct(metaIdx)
        val newMeta = Row(resized.length, w, h, meta.get(3), meta.get(4))
        Row.fromSeq(r.toSeq.updated(payloadIdx, resized).updated(metaIdx, newMeta))
      }
    }(enc)
  }

  /** Frame sampling: one row per sampled frame (media_id, frame_idx,
    * frame). Explodes partition-wise through the codec. */
  def sampleFrames(df: DataFrame, codec: MediaCodec, n: Int): DataFrame = {
    val schema = df.schema
    val idIdx = schema.fieldIndex("media_id")
    val payloadIdx = schema.fieldIndex("payload")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val c = codec
      rows.flatMap { r =>
        c.sampleFrames(r.getAs[Array[Byte]](payloadIdx), n).zipWithIndex.map {
          case (f, i) => Row(r.getAs[Long](idIdx), i, f)
        }
      }
    }(enc)
  }

  /** Feature extraction: media payloads → fixed-width Float vectors
    * (`features` column), partition-wise through the codec — the bridge
    * from the media frame to the [[Similarity]] ANN operators (index the
    * output with withSrpBucket / withIvfCell and query it like any
    * embedding table). */
  def featurize(df: DataFrame, codec: MediaCodec, dim: Int): DataFrame = {
    val schema = df.schema
    val idIdx = schema.fieldIndex("media_id")
    val payloadIdx = schema.fieldIndex("payload")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val c = codec
      rows.map { r =>
        Row(r.getAs[Long](idIdx),
          c.extractFeatures(r.getAs[Array[Byte]](payloadIdx), dim).toSeq)
      }
    }(enc)
  }

  /** Column-only metadata (no codec needed): byte length, sha-256 of the
    * payload, and the stub dims — everything here is SQL-expressible, so
    * the external oracle can verify the full pipeline shape. */
  def columnMeta(payload: Column): Seq[(String, Column)] = Seq(
    "n_bytes" -> octet_length(payload),
    "sha" -> sha2(payload, 256),
    "width" -> (octet_length(payload) % 640 + 1),
    "height" -> (octet_length(payload) * 7 % 480 + 1))
}
