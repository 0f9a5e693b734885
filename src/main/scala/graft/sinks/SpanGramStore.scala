package graft.sinks

import java.util.Base64

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Append-only, hash-bucketed, atomically-versioned SEGMENT store — the
  * storage half of the incremental duplicate-span regime
  * ([[graft.operators.Dedup.duplicateSpanExciseIncremental]]).
  *
  * Why not [[BucketedMergeTarget]]: that sink is a keyed UPSERT store —
  * its manifest maps each bucket to exactly ONE owning directory, so
  * every commit must read-modify-write the buckets it touches. Gram
  * occurrences are immutable append-only facts whose 64-bit hashes are
  * uniform, so any non-trivial batch touches EVERY bucket and a merge
  * port would re-read and re-write the whole store per batch — O(store)
  * ingest, the exact cost incremental operation exists to avoid. The
  * LSM answer is segments: an append writes a new immutable
  * bucket-partitioned directory (I/O ∝ batch, nothing re-read) and the
  * manifest lists ALL live segments; the small-files debt that
  * accumulates (one file per touched bucket per batch) is paid by
  * [[compact]], off the ingest path — the same maintenance split as
  * [[BucketedMergeTarget.compact]].
  *
  * Layout under `path`:
  * {{{
  *   _span_manifest_v000000003.json          // committed state (highest wins)
  *   _seg_v000000001_9f2ab41c/bucket=0/…     // immutable segment directories
  *   _seg_v000000003_04d7e8aa/bucket=7/…     // (writer-unique names)
  * }}}
  *
  * The commit protocol is [[BucketedMergeTarget]]'s verbatim: data goes
  * to a writer-unique `_staging_*` dir renamed to a writer-unique
  * segment dir (never contended), and the manifest publish is the single
  * linearization point — strictly version base+1 through the
  * fail-if-destination-exists [[CommitLock]] primitive, so exactly one
  * writer per version wins and a loser's thrown IOException means
  * "replay the batch". Readers take the highest manifest that parses;
  * a crash anywhere before the publish leaves the previous state fully
  * intact. GC (best-effort, on the commit path) retains the newest two
  * manifests and every segment either references, so a fallback reader
  * always finds its segments on disk; superseded compaction inputs are
  * reclaimed one commit later — the standard retention window.
  *
  * Each manifest entry records the segment's PRESENT bucket partitions
  * and row count, so a probe plans its pruned read from manifest
  * metadata alone — no directory listing per segment per probe (on an
  * object store each LIST is a billed round trip).
  */
object SpanGramStore {

  /** User-visible partition column (unlike [[BucketedMergeTarget]]'s
    * internal `_graft_bucket`, probes filter on it directly). */
  val BucketCol = "bucket"

  private val ManifestRe = raw"_span_manifest_v(\d{9})\.json".r
  private val SegDirRe = raw"_seg_v(\d{9})_[0-9a-f]+".r

  final case class Segment(dir: String, buckets: Seq[Int], rows: Long)

  final case class Manifest(version: Long, nBuckets: Int, schemaB64: String,
                            segments: Seq[Segment]) {
    def schema: StructType =
      DataType.fromJson(new String(Base64.getDecoder.decode(schemaB64), "UTF-8"))
        .asInstanceOf[StructType]
    def totalRows: Long = segments.map(_.rows).sum
  }

  final case class CommitStats(version: Long, segmentRows: Long, nSegments: Int)

  // ---- manifest codec (strict, hand-rolled like the sibling sinks) ----

  private[sinks] def manifestToJson(m: Manifest): String = {
    // dir names are `_seg_v<9 digits>_<hex>` by construction — quote-free
    val segs = m.segments.map { s =>
      s"""{"dir":"${s.dir}","rows":${s.rows},"buckets":[${s.buckets.sorted.mkString(",")}]}"""
    }.mkString(",")
    s"""{"version":${m.version},"nBuckets":${m.nBuckets},""" +
      s""""schema":"${m.schemaB64}","segments":[$segs]}"""
  }

  private val SegRe =
    raw"""\{"dir":"([^"]+)","rows":(\d+),"buckets":\[([0-9,]*)\]\}""".r

  private[sinks] def manifestFromJson(s: String): Manifest = {
    def num(name: String): Long = {
      val m = raw""""$name":(\d+)""".r.findFirstMatchIn(s).getOrElse(
        throw new IllegalArgumentException(s"manifest missing $name: $s"))
      m.group(1).toLong
    }
    val schema = raw""""schema":"([^"]*)"""".r.findFirstMatchIn(s).getOrElse(
      throw new IllegalArgumentException(s"manifest missing schema: $s")).group(1)
    val segs = SegRe.findAllMatchIn(s).map { m =>
      Segment(m.group(1), m.group(3).split(",").toSeq
        .filter(_.nonEmpty).map(_.toInt), m.group(2).toLong)
    }.toSeq
    Manifest(num("version"), num("nBuckets").toInt, schema, segs)
  }

  private def fileSystem(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def segDirName(v: Long): String =
    f"_seg_v$v%09d_${java.util.UUID.randomUUID().toString.replace("-", "").take(8)}"

  /** Newest manifest that parses (torn-newest fallback, as everywhere). */
  def currentManifest(spark: SparkSession, path: String): Option[Manifest] = {
    val (f, p) = fileSystem(spark, path)
    if (!f.exists(p)) return None
    f.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case ManifestRe(v) => v.toLong }
      .sorted(Ordering[Long].reverse)
      .iterator.flatMap { v =>
        val mp = new Path(p, s"_span_manifest_v${"%09d".format(v)}.json")
        try {
          val in = f.open(mp)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                    finally in.close()
          Some(manifestFromJson(txt))
        } catch { case scala.util.control.NonFatal(_) => None }
      }.nextOption()
  }

  def exists(spark: SparkSession, path: String): Boolean =
    currentManifest(spark, path).isDefined

  /** Total committed rows — manifest metadata, no listing. */
  def rowCount(spark: SparkSession, path: String): Long =
    currentManifest(spark, path).map(_.totalRows).getOrElse(0L)

  /** Live segment count — the small-files pressure gauge [[compact]]
    * resets to 1. */
  def segmentCount(spark: SparkSession, path: String): Int =
    currentManifest(spark, path).map(_.segments.size).getOrElse(0)

  /** Data files across live segments (listed — bench/ops metric, not a
    * hot-path call). */
  def fileCount(spark: SparkSession, path: String): Long = {
    val (f, p) = fileSystem(spark, path)
    currentManifest(spark, path).map(_.segments.map { seg =>
      val it = f.listFiles(new Path(p, seg.dir), true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }.sum).getOrElse(0L)
  }

  private def writeManifest(f: FileSystem, p: Path, m: Manifest): Unit = {
    f.mkdirs(p)
    val tmp = new Path(p, "_span_manifest_tmp_" +
      java.util.UUID.randomUUID().toString.replace("-", ""))
    val out = f.create(tmp, true)
    try out.write(manifestToJson(m).getBytes("UTF-8")) finally out.close()
    val dest = new Path(p, s"_span_manifest_v${"%09d".format(m.version)}.json")
    if (!BucketedMergeTarget.publishExclusive(f, tmp, dest)) {
      f.delete(tmp, false)
      throw new java.io.IOException(
        s"span manifest v${m.version} already committed by a concurrent writer — replay the batch")
    }
  }

  /** Stage `data` (already carrying [[BucketCol]]) as a new segment dir,
    * then publish `mkManifest(staged segment)` as version base+1. The
    * shared commit spine of [[append]] and [[compact]]. */
  private def commitSegment(spark: SparkSession, path: String,
                            existing: Option[Manifest], data: DataFrame)
                           (mkManifest: (Long, Option[Segment], StructType) => Manifest)
                           : CommitStats = {
    val (f, p) = fileSystem(spark, path)
    val newVer = existing.map(_.version).getOrElse(0L) + 1
    val dirName = segDirName(newVer)
    val segDir = new Path(p, dirName)
    val staging = new Path(p,
      s"_staging_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    // one batch-sized shuffle co-locates each bucket's rows → ~one file
    // per bucket per segment instead of (writer tasks × buckets) tiny
    // files — the BucketedMergeTarget prepareVersion rule
    f.mkdirs(p)
    data.repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(staging.toString)
    if (!f.rename(staging, segDir)) {
      f.delete(staging, true)
      throw new java.io.IOException(
        s"could not move staging into place at $segDir — replay the batch")
    }
    val (present, rows) =
      if (!f.exists(segDir)) (Seq.empty[Int], 0L)
      else {
        val buckets = f.listStatus(segDir).toSeq.map(_.getPath.getName)
          .collect { case n if n.startsWith(BucketCol + "=") =>
            n.drop(BucketCol.length + 1).toInt }
        // per-segment row count from the just-written parquet FOOTERS
        // (block metadata — no Spark job), as prepareVersion does
        val conf = spark.sessionState.newHadoopConf()
        val n = buckets.map { b =>
          f.listStatus(new Path(segDir, s"$BucketCol=$b")).toSeq
            .filter(_.getPath.getName.endsWith(".parquet"))
            .map { st =>
              val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
              val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
              try r.getRecordCount finally r.close()
            }.sum
        }.sum
        (buckets, n)
      }
    val userSchema = StructType(data.schema.filterNot(_.name == BucketCol))
    val seg = if (present.nonEmpty) Some(Segment(dirName, present, rows)) else None
    val m = mkManifest(newVer, seg, userSchema)
    try writeManifest(f, p, m)
    catch {
      case e: java.io.IOException => f.delete(segDir, true); throw e
    }
    gc(f, p, Seq(Some(m), existing).flatten)
    CommitStats(newVer, rows, m.segments.size)
  }

  /** Append a batch as one new segment — I/O ∝ batch (write-only; no
    * live segment is read or rewritten). An empty batch still commits
    * (a manifest bump with no new segment), keeping replay accounting
    * uniform. */
  def append(data: DataFrame, path: String, nBuckets: Int): CommitStats = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(data.columns.contains(BucketCol),
      s"batch must carry a '$BucketCol' column")
    val spark = data.sparkSession
    val existing = currentManifest(spark, path)
    existing.foreach(m => require(m.nBuckets == nBuckets,
      s"store has ${m.nBuckets} buckets but the batch was bucketed into " +
        s"$nBuckets — bucket layout is fixed at store creation"))
    commitSegment(spark, path, existing, data) { (v, seg, schema) =>
      val b64 = Base64.getEncoder.encodeToString(schema.json.getBytes("UTF-8"))
      Manifest(v, nBuckets, b64, existing.map(_.segments).getOrElse(Nil) ++ seg)
    }
  }

  /** Bucket-pruned read of the requested buckets across every live
    * segment. Which segments hold which buckets is manifest metadata, so
    * the read opens exactly the `seg/bucket=B` directories that exist —
    * no listing. Missing store or no matching bucket → empty frame with
    * the store schema (or just [[BucketCol]] int when the store never
    * committed data). */
  def probe(spark: SparkSession, path: String, buckets: Set[Int]): DataFrame = {
    currentManifest(spark, path) match {
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(Nil).add(BucketCol, "int"))
      case Some(m) =>
        val hits = m.segments
          .map(s => s -> s.buckets.filter(buckets.contains).sorted)
          .filter(_._2.nonEmpty)
        if (hits.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
            m.schema.add(BucketCol, "int"))
        else hits.map { case (seg, bs) =>
          val base = s"$path/${seg.dir}"
          spark.read.option("basePath", base)
            .parquet(bs.map(b => s"$base/$BucketCol=$b"): _*)
        }.reduce(_.unionByName(_))
    }
  }

  /** Full current contents (all buckets of all segments). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val m = currentManifest(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed span manifest under $path"))
    probe(spark, path, (0 until m.nBuckets).toSet)
  }

  /** MAJOR COMPACTION: fold every live segment into ONE — the
    * maintenance op that resets per-bucket file count to ~1 regardless
    * of how many appends accreted it (the LSM debt payment; schedule off
    * the ingest path). Contents are untouched — rows are immutable
    * facts, so there is no dedup or ordering pass. Commits through the
    * standard manifest protocol (crash-safe, writer-arbitrated); the
    * superseded segments stay on disk until the NEXT commit retires the
    * previous manifest — the fallback reader's retention window. */
  def compact(spark: SparkSession, path: String): CommitStats = {
    val existing = currentManifest(spark, path)
    val m = existing.getOrElse(return CommitStats(0L, 0L, 0))
    if (m.segments.size <= 1)
      return CommitStats(m.version, m.totalRows, m.segments.size)
    val all = read(spark, path)
    commitSegment(spark, path, existing, all) { (v, seg, schema) =>
      val b64 = Base64.getEncoder.encodeToString(schema.json.getBytes("UTF-8"))
      Manifest(v, m.nBuckets, b64, seg.toSeq)
    }
  }

  /** GC by retained set (the [[BucketedMergeTarget]] policy): keep the
    * two newest manifests and every segment either references; delete
    * older manifests and any `_seg_*` dir older than the current version
    * that neither retained manifest references; age-gated reaping of
    * crashed writers' staging/tmp debris. Best-effort — failures leave
    * garbage, never break state. Nothing at a version ≥ ours that isn't
    * ours is ever touched (a successor's commit, or a same-version loser
    * still cleaning itself up). */
  private def gc(f: FileSystem, p: Path, keep: Seq[Manifest]): Unit = {
    try {
      val keepVers = keep.map(_.version).toSet
      val ourVer = keep.map(_.version).max
      val referenced = keep.flatMap(_.segments.map(_.dir)).toSet
      val entries = f.listStatus(p).toSeq
      entries.map(_.getPath.getName).foreach {
        case n @ ManifestRe(v) if v.toLong < ourVer && !keepVers.contains(v.toLong) =>
          f.delete(new Path(p, n), false); ()
        case n @ SegDirRe(v) if v.toLong < ourVer && !referenced.contains(n) =>
          f.delete(new Path(p, n), true); ()
        case _ => ()
      }
      val staleBefore = System.currentTimeMillis() - 3600000L
      entries
        .filter(st => (st.getPath.getName.startsWith("_span_manifest_tmp_") ||
            st.getPath.getName.startsWith("_staging_")) &&
          st.getModificationTime < staleBefore)
        .foreach(st => { f.delete(st.getPath, true); () })
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}
