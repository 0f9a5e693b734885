package graft.sinks

import java.util.Base64

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.storage.StorageLevel

import graft.streaming.IncrementalSync

/** Bucket-pruned, atomically-versioned parquet merge target — the write
  * side of the sync loop (reference per-batch upsert cost is proportional
  * to the change batch, `src/xmin/daemon.rs:336-461`; the PG target makes
  * that free via `ON CONFLICT`, a parquet target has to earn it).
  *
  * Layout under `targetPath`:
  * {{{
  *   _graft_manifest_v000000003.json   // committed state (highest wins)
  *   _v000000001/_graft_bucket=0/…     // immutable version directories
  *   _v000000003/_graft_bucket=7/…
  * }}}
  *
  * Every row lives in bucket `pmod(hash(pk…), nBuckets)` (Murmur3 — stable
  * across runs and executors). A merge:
  *
  *   1. dedups the batch latest-per-key (cursor-aware: a late stale change
  *      can never regress the target);
  *   2. finds the buckets the batch touches (a distinct over ≤ nBuckets
  *      values — metadata, not data);
  *   3. reads ONLY those buckets from their current version dirs, merges,
  *      and writes them to a NEW version directory — untouched buckets are
  *      never read or rewritten, so I/O scales with the batch, not the
  *      accumulated target;
  *   4. commits by renaming a temp manifest to `_graft_manifest_v<n+1>` —
  *      a single atomic rename. A crash anywhere before the rename leaves
  *      the previous manifest (and every bucket it references) fully
  *      intact; the replayed batch then merges against the old state,
  *      which is exactly the idempotent-replay contract.
  *
  * All filesystem access goes through the Hadoop FileSystem API, so the
  * target can live on `file://`, `hdfs://` or an object store. The rename
  * commit is to a NEW name (no delete-then-rename window), which is atomic
  * on HDFS and local FS; on S3-like stores it is still safe because
  * readers take the highest manifest that parses.
  */
object BucketedMergeTarget {

  /** Internal partition column; never surfaced by [[read]]. */
  val BucketCol = "_graft_bucket"
  val DefaultBuckets = 32

  private val ManifestRe = raw"_graft_manifest_v(\d{9})\.json".r

  /** Committed state: which version directory owns each bucket's data.
    * `schemaB64` is the base64 of the user-facing StructType JSON so an
    * emptied target still reads with its schema. `rowCounts` carries the
    * per-bucket row counts so the total target size is manifest metadata
    * (no listing or footer reads — O(1) at any scale). `bucketCols`, when
    * non-empty, records that rows are bucketed by THOSE columns rather
    * than the full PK (probe-key bucketing — see [[merge]]); recording it
    * in the manifest makes a mismatched caller fail loudly instead of
    * silently pruning the wrong buckets. */
  final case class Manifest(version: Long, nBuckets: Int, buckets: Map[Int, Long],
                            schemaB64: String, rowCounts: Map[Int, Long] = Map.empty,
                            bucketCols: Seq[String] = Nil) {
    def schema: StructType =
      DataType.fromJson(new String(Base64.getDecoder.decode(schemaB64), "UTF-8"))
        .asInstanceOf[StructType]

    /** Total rows, when every owned bucket carries a count (manifests
      * written before rowCounts existed may not). */
    def totalRows: Option[Long] =
      if (buckets.keySet.subsetOf(rowCounts.keySet)) Some(buckets.keySet.toSeq.map(rowCounts).sum)
      else None
  }

  final case class MergeStats(version: Long, bucketsRewritten: Int, bucketsTotal: Int,
                              bytesWritten: Long)

  // ---- manifest codec (strict, hand-rolled like core.Checkpoint) ------

  private def intMapJson(m: Map[Int, Long]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")

  private[sinks] def manifestToJson(m: Manifest): String = {
    // each name base64'd individually (names may hold any character),
    // then comma-joined — same quote-free-by-construction trick as schema
    val bc = m.bucketCols
      .map(n => Base64.getEncoder.encodeToString(n.getBytes("UTF-8"))).mkString(",")
    s"""{"version":${m.version},"nBuckets":${m.nBuckets},"schema":"${m.schemaB64}",""" +
      s""""bucketCols":"$bc",""" +
      s""""rowCounts":{${intMapJson(m.rowCounts)}},"buckets":{${intMapJson(m.buckets)}}}"""
  }

  /** The `{…}` object block for `name`, as an int→long map (flat values —
    * no nested objects in this format). Absent block → empty map, so
    * pre-rowCounts manifests still parse. */
  private def intMapFromJson(s: String, name: String): Map[Int, Long] = {
    val at = s.indexOf("\"" + name + "\"")
    if (at < 0) return Map.empty
    val open = s.indexOf('{', at)
    val close = s.indexOf('}', open)
    if (open < 0 || close < 0) return Map.empty
    val pairRe = "\"(\\d+)\":(\\d+)".r
    pairRe.findAllMatchIn(s.substring(open, close + 1))
      .map(mm => mm.group(1).toInt -> mm.group(2).toLong).toMap
  }

  private[sinks] def manifestFromJson(s: String): Manifest = {
    def num(name: String): Long = {
      val re = ("\"" + name + "\":(\\d+)").r
      re.findFirstMatchIn(s).map(_.group(1).toLong)
        .getOrElse(throw new IllegalArgumentException(s"manifest missing '$name'"))
    }
    val schemaRe = "\"schema\":\"([A-Za-z0-9+/=]*)\"".r
    val schemaB64 = schemaRe.findFirstMatchIn(s).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException("manifest missing 'schema'"))
    // absent block (pre-bucketCols manifests) → Nil = bucketed by PK
    val bcRe = "\"bucketCols\":\"([A-Za-z0-9+/=,]*)\"".r
    val bucketCols = bcRe.findFirstMatchIn(s).map(_.group(1)).filter(_.nonEmpty)
      .map(_.split(',').toSeq.map(b => new String(Base64.getDecoder.decode(b), "UTF-8")))
      .getOrElse(Nil)
    Manifest(num("version"), num("nBuckets").toInt, intMapFromJson(s, "buckets"),
      schemaB64, intMapFromJson(s, "rowCounts"), bucketCols)
  }

  // ---- filesystem plumbing (Hadoop FS — works on any scheme) ----------

  private def fileSystem(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def versionDirName(v: Long): String = f"_v$v%09d"

  /** Newest manifest that parses — a torn/corrupt newest file falls back
    * to the previous committed state instead of failing the reader. */
  def currentManifest(spark: SparkSession, path: String): Option[Manifest] = {
    val (f, p) = fileSystem(spark, path)
    if (!f.exists(p)) return None
    val versions = f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case ManifestRe(v) => v.toLong }
      .sorted(Ordering[Long].reverse)
    versions.iterator.flatMap { v =>
      val mp = new Path(p, s"_graft_manifest_v${"%09d".format(v)}.json")
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

  private def writeManifest(f: FileSystem, p: Path, m: Manifest): Unit = {
    f.mkdirs(p)
    val tmp = new Path(p, s"_graft_manifest_tmp_${m.version}")
    val out = f.create(tmp, true)
    try out.write(manifestToJson(m).getBytes("UTF-8")) finally out.close()
    val dest = new Path(p, s"_graft_manifest_v${"%09d".format(m.version)}.json")
    if (!f.rename(tmp, dest)) {
      f.delete(tmp, false)
      throw new java.io.IOException(s"manifest commit failed (concurrent writer?): $dest")
    }
  }

  // ---- read paths ------------------------------------------------------

  private def withBucket(df: DataFrame, pkCols: Seq[String], nBuckets: Int): DataFrame =
    df.withColumn(BucketCol, pmod(hash(pkCols.map(col): _*), lit(nBuckets)).cast("int"))

  /** Read `buckets` (with the bucket column attached) from the version
    * dirs the manifest assigns them to — a partition-pruned read: only
    * the named bucket directories are ever listed or opened. */
  private def readBuckets(spark: SparkSession, path: String, m: Manifest,
                          buckets: Set[Int]): DataFrame = {
    val owned = m.buckets.filter { case (b, _) => buckets.contains(b) }
    if (owned.isEmpty) {
      val schema = m.schema.add(BucketCol, "int")
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }
    val byVersion = owned.groupBy(_._2).view.mapValues(_.keySet).toMap
    byVersion.toSeq.sortBy(_._1).map { case (ver, bs) =>
      val base = s"$path/${versionDirName(ver)}"
      val dirs = bs.toSeq.sorted.map(b => s"$base/$BucketCol=$b")
      spark.read.option("basePath", base).parquet(dirs: _*)
    }.reduce(_.unionByName(_))
  }

  /** Full current contents (user-facing — bucket column dropped). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val m = currentManifest(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed manifest under $path"))
    readBuckets(spark, path, m, m.buckets.keySet).drop(BucketCol)
  }

  // ---- write paths -----------------------------------------------------

  /** Next free version: past the committed manifest AND past any torn
    * manifest file or leftover version dir a crashed writer left behind
    * (a torn `_graft_manifest_vN` must never block committing version N). */
  private def nextVersion(f: FileSystem, p: Path, existing: Option[Manifest]): Long = {
    val VerDirRe = raw"_v(\d{9})".r
    val onDisk =
      if (!f.exists(p)) Seq.empty[Long]
      else f.listStatus(p).toSeq.map(_.getPath.getName).collect {
        case ManifestRe(v) => v.toLong
        case VerDirRe(v)   => v.toLong
      }
    (onDisk ++ existing.map(_.version)).foldLeft(0L)(math.max) + 1
  }

  /** Write `data` (already carrying [[BucketCol]]) as version `old+1`,
    * then atomically commit a manifest where `dropFromOld` buckets stop
    * pointing at their previous versions and every bucket materialized by
    * this write points at the new version. Finally GC the superseded
    * bucket directories and stale manifests (best-effort — a crash here
    * only leaves unreferenced files).
    *
    * CONCURRENCY: the target is a SINGLE-WRITER sink (like every
    * manifest-file table format without an external lock service).
    * Concurrent writer ATTEMPTS are detected and fail loudly, never
    * corrupt, and never silently drop a batch:
    *   - data is written to a writer-unique `_staging_*` dir, then
    *     atomically renamed to the version slot — the rename fails if
    *     another writer claimed the slot first (and the parquet job can
    *     never collide in a shared `_temporary` dir);
    *   - the manifest commit is itself a rename to a version-named file —
    *     second writer of the same version fails;
    *   - after committing, any OTHER manifest that landed between our base
    *     and our version means our merge was computed against stale state:
    *     we roll our manifest back and throw.
    * The thrown IOException means "replay the batch" — merges are
    * idempotent, so the caller retries against the fresh state. */
  private def commitVersion(spark: SparkSession, path: String,
                            existing: Option[Manifest], data: DataFrame,
                            dropFromOld: Set[Int], nBuckets: Int,
                            bucketCols: Seq[String] = Nil): MergeStats = {
    val (f, p) = fileSystem(spark, path)
    val newVer = nextVersion(f, p, existing)
    val verDir = new Path(p, versionDirName(newVer))
    val staging = new Path(p,
      s"_staging_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    // co-locate each bucket's rows before the partitioned write: without
    // this, partitionBy emits one file per (writer task × bucket) — up to
    // shufflePartitions × nBuckets tiny files per commit (measured: the
    // dominant cost of signature-store appends). One batch-sized shuffle
    // buys ~one file per bucket, which is also what keeps NameNode/object
    // listing pressure flat over long merge histories at scale.
    data.repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(staging.toString)
    // empty batches write no partition dirs — an empty staging dir renames
    // fine and yields present = ∅ below, same as before
    if (!f.rename(staging, verDir)) {
      f.delete(staging, true)
      throw new java.io.IOException(
        s"version slot $verDir already claimed (concurrent writer?) — replay the batch")
    }

    val present: Set[Int] =
      if (!f.exists(verDir)) Set.empty
      else f.listStatus(verDir).toSeq.map(_.getPath.getName)
        .collect { case n if n.startsWith(BucketCol + "=") =>
          n.drop(BucketCol.length + 1).toInt }.toSet

    val userSchema = StructType(data.schema.filterNot(_.name == BucketCol))
    val schemaB64 = Base64.getEncoder.encodeToString(userSchema.json.getBytes("UTF-8"))
    val oldBuckets = existing.map(_.buckets).getOrElse(Map.empty[Int, Long])
    val newBuckets = (oldBuckets -- dropFromOld) ++ present.map(_ -> newVer).toMap

    // Per-bucket row counts for the NEW version dir only — a zero-data-column
    // scan of just-written files (footer row counts), cost ∝ the batch.
    // Untouched buckets carry their previous counts forward.
    val newCounts: Map[Int, Long] =
      if (present.isEmpty) Map.empty
      else spark.read.parquet(verDir.toString).groupBy(col(BucketCol)).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val oldCounts = existing.map(_.rowCounts).getOrElse(Map.empty[Int, Long])
    val rowCounts = ((oldCounts -- dropFromOld).view.filterKeys(newBuckets.contains).toMap
      ++ newCounts)

    val newManifest = Manifest(newVer, nBuckets, newBuckets, schemaB64, rowCounts,
      bucketCols)
    writeManifest(f, p, newManifest)

    // post-commit conflict check: a manifest from ANOTHER writer with a
    // version in (base, ours) means our merge read stale buckets — undo
    // our manifest (the competing state is intact) and ask for a replay.
    // Only manifests that PARSE count: a torn file there is a crashed
    // writer nextVersion already skipped, not a competing commit.
    val base = existing.map(_.version).getOrElse(0L)
    val intermediate = f.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case n @ ManifestRe(v) if v.toLong > base && v.toLong < newVer => (n, v.toLong) }
      .filter { case (n, _) =>
        try {
          val in = f.open(new Path(p, n))
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                    finally in.close()
          manifestFromJson(txt); true
        } catch { case scala.util.control.NonFatal(_) => false }
      }.map(_._2)
    if (intermediate.nonEmpty) {
      f.delete(new Path(p, s"_graft_manifest_v${"%09d".format(newVer)}.json"), false)
      f.delete(verDir, true)
      throw new java.io.IOException(
        s"concurrent commit(s) v${intermediate.mkString(",")} landed under our v$newVer — replay the batch")
    }

    val bytes =
      if (f.exists(verDir)) f.getContentSummary(verDir).getLength else 0L
    gc(f, p, Seq(newManifest) ++ existing)
    MergeStats(newVer, (dropFromOld ++ present).size, nBuckets, bytes)
  }

  /** Garbage collection by RETAINED SET, not by numeric version gap: keep
    * the new manifest plus the previous committed one (the corrupt-newest
    * fallback), delete every other manifest, and delete only bucket dirs
    * referenced by NEITHER retained manifest. This makes the fallback
    * actually usable — a reader that falls back to the previous manifest
    * finds every bucket directory it references still on disk; those dirs
    * are reclaimed one commit later, when their manifest leaves the
    * retained set. Numbering gaps (orphan version dirs from crashed
    * writers) cannot widen the window. Best-effort: failures leave
    * garbage, never break state. */
  private def gc(f: FileSystem, p: Path, keep: Seq[Manifest]): Unit = {
    try {
      val keepVers = keep.map(_.version).toSet
      // toSeq first: mapping a Map to swapped pairs would re-key by version
      // and collapse every bucket in the same version dir to one entry
      val referenced: Set[(Long, Int)] =
        keep.flatMap(_.buckets.toSeq.map { case (b, v) => (v, b) }).toSet
      f.listStatus(p).toSeq.map(_.getPath.getName).foreach {
        case n @ ManifestRe(v) if !keepVers.contains(v.toLong) =>
          f.delete(new Path(p, n), false); ()
        // a writer that crashed between create and rename leaves its temp
        // manifest behind; safe to reap here because a LIVE commit renames
        // its temp away before gc runs in the same commitVersion call
        case n if n.startsWith("_graft_manifest_tmp_") =>
          f.delete(new Path(p, n), false); ()
        case _ => ()
      }
      // staging dirs from crashed writers: age-gated (an in-flight writer's
      // staging is at most minutes old; an hour-old one is dead) — the
      // standard object-store orphan-TTL policy
      val staleBefore = System.currentTimeMillis() - 3600000L
      f.listStatus(p).toSeq
        .filter(st => st.getPath.getName.startsWith("_staging_") &&
          st.getModificationTime < staleBefore)
        .foreach(st => { f.delete(st.getPath, true); () })
      val VerDirRe = raw"_v(\d{9})".r
      f.listStatus(p).toSeq.map(_.getPath.getName).foreach {
        case n @ VerDirRe(vs) =>
          val ver = vs.toLong
          val vd = new Path(p, n)
          f.listStatus(vd).toSeq.map(_.getPath.getName)
            .filter(_.startsWith(BucketCol + "="))
            .foreach { bn =>
              val b = bn.drop(BucketCol.length + 1).toInt
              if (!referenced.contains((ver, b))) { f.delete(new Path(vd, bn), true); () }
            }
          if (!f.listStatus(vd).exists(_.getPath.getName.startsWith(BucketCol + "=")))
            { f.delete(vd, true); () }
        case _ => ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Total committed rows as manifest metadata — no file listing, no
    * footer reads. `None` only for a manifest predating rowCounts. */
  def rowCount(spark: SparkSession, path: String): Option[Long] =
    currentManifest(spark, path).flatMap(_.totalRows)

  /** Bucket-pruned point lookup: the stored rows whose probe key may
    * appear in `keys` — only the buckets `keys` hashes into are listed or
    * read, so a small probe against a huge target costs O(probe buckets),
    * never a target scan. `probeCols` must be the target's bucket-key
    * columns (the PK by default; the recorded `bucketCols` for a
    * probe-key-bucketed target — enforced). Returns the matching stored
    * rows (semi-joined on the exact probe key). An empty/missing target
    * yields an empty frame with the keys' schema restricted to
    * `probeCols`. */
  def readMatching(keys: DataFrame, path: String, probeCols: Seq[String]): DataFrame = {
    val spark = keys.sparkSession
    currentManifest(spark, path) match {
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(keys.select(probeCols.map(col): _*).schema))
      case Some(m) =>
        require(m.bucketCols.isEmpty || m.bucketCols == probeCols,
          s"target is bucketed by ${m.bucketCols} — probe with exactly those columns")
        val keyed = withBucket(keys.select(probeCols.map(col): _*).distinct(), probeCols, m.nBuckets)
        val touched = keyed.select(BucketCol).distinct()
          .collect().map(_.getInt(0)).toSet.intersect(m.buckets.keySet)
        if (touched.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], m.schema)
        else
          readBuckets(spark, path, m, touched).drop(BucketCol)
            .join(keyed.drop(BucketCol), probeCols, "left_semi")
    }
  }

  /** The bucket-key columns in force for a target: what the manifest
    * recorded, else the caller's request, else the PK. A non-empty
    * request against a target recorded differently is a hard error —
    * bucket membership is baked into the files, so a silent switch would
    * prune the wrong buckets. Requested cols must be a subset of the PK:
    * that is what guarantees two versions of the same key land in the
    * same bucket (the merge-visibility invariant). */
  private def resolveBucketCols(existing: Option[Manifest], pkCols: Seq[String],
                                requested: Seq[String]): Seq[String] = {
    val recorded = existing.map(_.bucketCols).getOrElse(Nil)
    require(recorded.isEmpty || requested.isEmpty || recorded == requested,
      s"target is bucketed by $recorded but caller asked for $requested")
    require(requested.forall(pkCols.contains),
      s"bucketCols $requested must be a subset of pkCols $pkCols")
    if (recorded.nonEmpty) recorded else if (requested.nonEmpty) requested else pkCols
  }

  /** Cursor-aware upsert of a change batch. I/O ∝ batch size (plus the
    * current contents of the buckets the batch touches), never ∝ target
    * size. Replays are idempotent: max-cursor-per-key over target ∪ batch.
    *
    * `bucketCols` (default: the PK) switches the target to PROBE-KEY
    * bucketing: rows are placed by a PK-subset the reader later probes
    * with, so [[readMatching]] on those columns prunes to just their
    * buckets. The LSH signature store buckets by `(band, bh)` this way —
    * an incoming batch's bands probe only the buckets they hash into. */
  def merge(batch: DataFrame, path: String, pkCols: Seq[String], cursorCol: String,
            nBuckets: Int = DefaultBuckets, bucketCols: Seq[String] = Nil): MergeStats = {
    val spark = batch.sparkSession
    val existing = currentManifest(spark, path)
    val nb = existing.map(_.nBuckets).getOrElse(nBuckets)
    val bc = resolveBucketCols(existing, pkCols, bucketCols)
    val bucketed = withBucket(
      IncrementalSync.latestByKey(batch, pkCols, cursorCol), bc, nb)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = bucketed.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).toSet
      if (touched.isEmpty)
        return MergeStats(existing.map(_.version).getOrElse(0L), 0, nb, 0L)
      val merged = existing match {
        case Some(m) if m.buckets.keySet.intersect(touched).nonEmpty =>
          IncrementalSync.latestByKey(
            readBuckets(spark, path, m, touched).unionByName(bucketed),
            pkCols, cursorCol)
        case _ => bucketed
      }
      commitVersion(spark, path, existing, merged, touched, nb,
        if (bc == pkCols) Nil else bc)
    } finally { bucketed.unpersist(); () }
  }

  /** Delete by key (the reconcile write path): rewrites only buckets that
    * contain a key to delete; a bucket emptied by the delete drops out of
    * the manifest entirely. */
  def deleteKeys(keys: DataFrame, path: String, pkCols: Seq[String]): MergeStats = {
    val spark = keys.sparkSession
    val existing = currentManifest(spark, path)
    val m = existing.getOrElse(
      throw new IllegalStateException(s"no committed manifest under $path"))
    // a probe-key-bucketed target places rows by its recorded bucketCols
    // (⊆ pk, so present in `keys`); bucketing the delete keys the same way
    // is what makes the touched-bucket set correct
    val bc = resolveBucketCols(existing, pkCols, Nil)
    val keyed = withBucket(keys.select(pkCols.map(col): _*).distinct(), bc, m.nBuckets)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = keyed.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).toSet.intersect(m.buckets.keySet)
      if (touched.isEmpty) return MergeStats(m.version, 0, m.nBuckets, 0L)
      val remaining = readBuckets(spark, path, m, touched)
        .join(keyed.drop(BucketCol), pkCols, "left_anti")
      commitVersion(spark, path, existing, remaining, touched, m.nBuckets,
        m.bucketCols)
    } finally { keyed.unpersist(); () }
  }

  /** Full replacement (seed / wraparound resync): every old bucket is
    * dropped; the new contents own the whole keyspace. */
  def replaceAll(data: DataFrame, path: String, pkCols: Seq[String], cursorCol: String,
                 nBuckets: Int = DefaultBuckets, bucketCols: Seq[String] = Nil): MergeStats = {
    val spark = data.sparkSession
    val existing = currentManifest(spark, path)
    val nb = existing.map(_.nBuckets).getOrElse(nBuckets)
    val bc = resolveBucketCols(existing, pkCols, bucketCols)
    val bucketed = withBucket(
      IncrementalSync.latestByKey(data, pkCols, cursorCol), bc, nb)
    commitVersion(spark, path, existing, bucketed,
      existing.map(_.buckets.keySet).getOrElse(Set.empty), nb,
      if (bc == pkCols) Nil else bc)
  }
}
