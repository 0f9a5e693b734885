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

  /** REAL image codec on the JDK's built-in `javax.imageio` (PNG, BMP,
    * GIF, JPEG readers ship with every JRE — no external dependency):
    * genuine header-parsed dimensions, genuine pixel-raster features, a
    * genuine scaled re-encode. Payloads ImageIO cannot read (exotic or
    * non-image formats) fall through to `fallback` (the stub by
    * default), so one codec instance serves a mixed-format corpus.
    *
    * Feature extraction is the decoded-domain analog of the stub's byte
    * histogram: an L1-normalized histogram of gray levels over the
    * DECODED raster (single-band rasters read raw samples — for
    * grayscale PNG that is bit-exactly the stored byte; multi-band
    * images use integer mean of R,G,B). Deterministic across JVMs:
    * PNG/BMP decoding is exact, no float color math on the sample path. */
  final class ImageIoCodec(fallback: MediaCodec = StubCodec) extends MediaCodec {
    javax.imageio.ImageIO.setUseCache(false) // no disk-backed stream cache in executors

    private def read(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }

    def decodeDims(payload: Array[Byte]): (Int, Int) =
      read(payload).map(i => (i.getWidth, i.getHeight))
        .getOrElse(fallback.decodeDims(payload))

    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      read(payload).map { img =>
        val out = new java.awt.image.BufferedImage(w, h,
          if (img.getRaster.getNumBands == 1)
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY
          else java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }.getOrElse(fallback.resize(payload, w, h))

    /** A still image is its own single frame; non-images fall back. */
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] =
      read(payload).map(_ => Seq(payload))
        .getOrElse(fallback.sampleFrames(payload, n))

    def extractFeatures(payload: Array[Byte], dim: Int): Array[Float] =
      read(payload).map { img =>
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        val hist = new Array[Float](dim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val gray =
              if (bands == 1) raster.getSample(x, y, 0)
              else {
                val rgb = img.getRGB(x, y)
                (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              }
            hist(gray % dim) += 1f
            x += 1
          }
          y += 1
        }
        val total = math.max(1f, (w * h).toFloat)
        hist.map(_ / total)
      }.getOrElse(fallback.extractFeatures(payload, dim))
  }

  /** Encode raw bytes as a REAL grayscale PNG: a 1×N column image whose
    * raster IS the byte sequence (PNG gray is lossless, so decode gives
    * back exactly these samples). This is how a text/bytes fixture
    * becomes a genuine image corpus whose pixel statistics an external
    * oracle can still replay from the source bytes. */
  def encodeGrayPng(bytes: Array[Byte]): Array[Byte] = {
    val h = math.max(1, bytes.length)
    val img = new java.awt.image.BufferedImage(1, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < bytes.length) { raster.setSample(0, i, 0, bytes(i) & 0xff); i += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Rewrite the media frame's payloads as real grayscale PNGs
    * (partition-wise — the encoder runs where the data lives, the same
    * iterator shape as every other media pass). Meta format flips to
    * "png"; n_bytes tracks the encoded payload. */
  def encodeAsPng(df: DataFrame): DataFrame = {
    val schema = df.schema
    val payloadIdx = schema.fieldIndex("payload")
    val metaIdx = schema.fieldIndex("meta")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val png = encodeGrayPng(r.getAs[Array[Byte]](payloadIdx))
        val meta = r.getStruct(metaIdx)
        val newMeta = Row(png.length, meta.get(1), meta.get(2), meta.get(3), "png")
        Row.fromSeq(r.toSeq.updated(payloadIdx, png).updated(metaIdx, newMeta))
      }
    }(enc)
  }

  /** Library-backed codec placeholder — JNI/FFmpeg/turbojpeg for audio
    * and video decode goes here; absent in this container by design.
    * (Still images no longer need it: [[ImageIoCodec]] is real.) */
  object NativeCodec {
    def apply(): MediaCodec =
      throw new UnsupportedOperationException(
        "no native audio/video libraries in this environment — " +
          "use ImageIoCodec (images) or StubCodec")
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
