package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.sinks.BucketedMergeTarget
import graft.sinks.BucketedMergeTarget.Manifest

/** Streaming SOURCE half of the `graft-store` format —
  * `spark.readStream.format("graft-store").load(storeDir)`: the store a
  * pipeline maintains becomes a live input with no extra infrastructure,
  * completing the format's symmetry (batch read/write and the streaming
  * sink already exist; this is the read half the [[graft.streaming
  * .StoreFollower]] provides imperatively, lifted into Structured
  * Streaming's engine-managed offset/commit loop).
  *
  * OFFSETS are `(manifest version, buckets emitted)` pairs
  * ([[StoreSourceOffset]]). Each [[getOffset]] poll is one manifest read
  * — no data I/O, no Spark job in steady state, the same cheap no-op
  * answer `StoreFollower.poll` gives. A micro-batch `(start, end]`
  * emits the CURRENT contents of the buckets whose owning version dir
  * changed between the two pinned manifests: multiple store commits
  * between polls coalesce into one delta naturally, and I/O per batch
  * is ∝ what changed, never ∝ store size.
  *
  * `maxBucketsPerTrigger` BOUNDS each micro-batch: a large delta — the
  * initial snapshot, or a follower catching up after a long gap, where
  * "changed" may be most of a very large store — is walked as a series
  * of bounded batches (the changed-bucket list is sliced in sorted
  * order; the offset's `emitted` field tracks the cut). One store
  * commit is never split mid-bucket, and a NEWER commit does not
  * preempt a delta mid-walk: the in-flight delta completes first, then
  * the next poll diffs against it. This is `maxFilesPerTrigger`
  * discipline for stores — without it, one huge catch-up batch is the
  * classic streaming failure at scale.
  *
  * The feed is upsert-shaped and at-least-once PER KEY (keys sharing a
  * bucket with a changed key are re-emitted; the rows carry the store's
  * cursor column, so a latest-wins consumer — e.g. the `graft-store`
  * streaming SINK with `cursor` pointing at it — absorbs replays
  * idempotently). By DEFAULT deletes are not expressed: a deleted key
  * simply stops appearing, mirroring the reference's follower split —
  * its xmin feed is upsert-only while reconcile handles deletes
  * (`src/xmin/daemon.rs`, `src/commands/reconcile.rs`). The OPT-IN
  * `tombstones` mode adds delete fidelity to the row feed: each delta
  * batch also emits a `_deleted = true` pk-only row for every key
  * present in the base version of a changed bucket but absent from the
  * target version (cost still ∝ changed buckets — the base side reads
  * the same bucket ids one version back). Consumers pair it with the
  * streaming sink's `tombstoneCol` option; bucket-replace mirroring
  * ([[graft.streaming.StoreFollower.replicate]]) remains the
  * whole-store alternative.
  *
  * RECOVERY: manifests and the in-flight changed list are pinned in
  * memory between poll and commit. After a restart that state is gone
  * and the checkpointed start version's manifest usually is too (store
  * gc retains only the newest two) — the source then re-emits ALL
  * buckets of the end manifest in one recovery batch, ignoring the
  * offsets' slice positions: those index the LOST changed list, and
  * slicing a different list could silently drop buckets from the feed.
  * Full re-emit is the documented [[graft.streaming.StoreFollower
  * .Start]] semantics — correctness-free for the idempotent consumers
  * this feed targets — and bounded batching resumes from the next poll.
  *
  * Schema is fixed at stream start (the manifest's schema when the
  * source was created). Columns added to the store mid-stream by
  * additive evolution appear after a stream restart, not mid-run —
  * Structured Streaming requires a stable source schema.
  */
final class GraftStoreStreamSource(spark: SparkSession, path: String,
                                   override val schema: StructType,
                                   maxBucketsPerTrigger: Option[Int] = None,
                                   tombstones: Boolean = false)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => ConnOffset, ReadLimit}
  import GraftStoreStreamSource.DeletedCol

  require(maxBucketsPerTrigger.forall(_ > 0),
    s"graft-store source: maxBucketsPerTrigger must be positive, got $maxBucketsPerTrigger")
  require(!tombstones || schema.fieldNames.contains(DeletedCol),
    s"graft-store source: tombstone mode requires the $DeletedCol column in the schema")

  /** The store's data columns — the declared schema minus the tombstone
    * marker (identical to `schema` in upsert mode). */
  private val dataFields: Array[String] =
    schema.fieldNames.filterNot(_ == DeletedCol)

  /** The delta being walked: `base` is the fully-committed diff base
    * (None = nothing committed yet — the snapshot walk), `target` the
    * manifest whose changed buckets are being emitted, `changed` those
    * buckets in sorted order, `handedOut` how many of them getOffset
    * has released so far. */
  private final case class Walk(base: Option[Manifest], target: Manifest,
                                changed: IndexedSeq[Int], handedOut: Int)

  private var walk: Option[Walk] = None
  private var committedBase: Option[Manifest] = None
  private var lastOffset: Option[StoreSourceOffset] = None
  // manifest served by a restart-recovery getBatch (walk state lost):
  // commit(end) adopts it as the diff base so recovery costs ONE
  // full-store batch, not two
  private var recovered: Option[Manifest] = None
  // Trigger.AvailableNow: commits after prepare are out of scope for
  // this run — the drain loop must see a FIXED end or it never ends
  private var availableNowMode = false
  private var availableNowTarget: Option[Manifest] = None

  private def changedBetween(base: Option[Manifest], cur: Manifest): IndexedSeq[Int] =
    base match {
      case None => cur.buckets.keySet.toIndexedSeq.sorted
      // a compaction commit over EXACTLY our base is content-identical
      // by construction — only the owning dirs moved; the dir diff would
      // re-emit the whole store for a no-op
      case Some(b) if cur.compactedFrom == b.version => IndexedSeq.empty
      case Some(b) =>
        (cur.buckets.collect {
          case (k, d) if !b.buckets.get(k).contains(d) => k
        }.toSet ++ (b.buckets.keySet -- cur.buckets.keySet)).toIndexedSeq.sorted
    }

  private def advanceOffset(): Option[StoreSourceOffset] = synchronized {
    walk match {
      case Some(w) if w.handedOut < w.changed.size =>
        // mid-delta: release the next bounded slice of the SAME target —
        // newer store commits wait until this walk completes
        val next = maxBucketsPerTrigger.fold(w.changed.size)(
          m => math.min(w.changed.size, w.handedOut + m))
        walk = Some(w.copy(handedOut = next))
        lastOffset = Some(StoreSourceOffset(w.target.version, next))
      case _ =>
        val cur = if (availableNowMode) availableNowTarget
                  else BucketedMergeTarget.currentManifest(spark, path)
        cur.foreach { m =>
          val base = walk.map(_.target).orElse(committedBase)
          if (!base.exists(_.version >= m.version)) {
            val changed = changedBetween(base, m)
            val handed = maxBucketsPerTrigger.fold(changed.size)(
              math.min(changed.size, _))
            walk = Some(Walk(base, m, changed, handed))
            lastOffset = Some(StoreSourceOffset(m.version, handed))
          }
        }
    }
    lastOffset
  }

  override def getOffset: Option[V1Offset] = advanceOffset()

  /** [[org.apache.spark.sql.connector.read.streaming
    * .SupportsTriggerAvailableNow]]: without it the engine demotes
    * Trigger.AvailableNow to ONE micro-batch — which, under
    * `maxBucketsPerTrigger`, would silently drain only the first slice
    * of the snapshot. Pinning the prepare-time manifest gives the drain
    * loop a fixed end even if writers keep committing. */
  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    availableNowMode = true
    availableNowTarget = BucketedMergeTarget.currentManifest(spark, path)
  }

  override def getDefaultReadLimit: ReadLimit =
    // the per-trigger bound lives in the walk logic (maxBucketsPerTrigger)
    ReadLimit.allAvailable()

  override def latestOffset(start: ConnOffset, limit: ReadLimit): ConnOffset =
    advanceOffset().orNull

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val (m, base, buckets) = synchronized {
      val endO = StoreSourceOffset.of(end)
      val startO = start.map(StoreSourceOffset.of)
      walk match {
        case Some(w) if w.target.version == endO.version =>
          // in-run: slice the pinned changed list between the two cuts.
          // A start from an OLDER version means this walk's delta began
          // there — its slice positions index this walk's list from 0.
          val from = startO.filter(_.version == endO.version).map(_.emitted).getOrElse(0)
          (w.target, w.base, w.changed.slice(from, endO.emitted).toSet)
        case _ =>
          // restart: pinned state lost — re-emit everything (see scaladoc)
          val m = BucketedMergeTarget.currentManifest(spark, path).getOrElse(
            throw new IllegalStateException(
              s"graft-store source: no committed manifest under $path for offset $endO"))
          recovered = Some(m)
          (m, None, m.buckets.keySet)
      }
    }
    val upserts = BucketedMergeTarget.readBuckets(spark, path, m, buckets)
      .drop(BucketedMergeTarget.BucketCol)
      // conform to the stream's declared schema: columns added to the
      // store after stream start are deferred to a restart
      .select(dataFields.toIndexedSeq.map(col): _*)
    val batch =
      if (!tombstones) upserts
      else {
        // DELETE FIDELITY (opt-in): keys present in the BASE version of
        // the changed buckets but absent from the target version are the
        // delta's deletes — emitted as pk-only rows flagged _deleted.
        // Cost stays ∝ changed buckets (the base side reads the SAME
        // bucket ids, one version back). A snapshot or recovery batch
        // (no base) carries no tombstones by construction. NOTE the
        // retention coupling: the base manifest's bucket dirs must still
        // be on disk, which the store's keep-two-manifests gc guarantees
        // for a follower no more than one commit behind; a stream lagging
        // beyond retention fails loudly here and recovers via restart
        // (snapshot re-emit), never silently dropping deletes.
        val pk = m.pkCols
        require(pk.nonEmpty,
          "graft-store source: tombstone mode needs the store manifest to " +
            "record pkCols (write once with a pk-carrying merge to upgrade)")
        val deletes = base match {
          case None => None
          case Some(b) =>
            val baseRows = BucketedMergeTarget.readBuckets(spark, path, b, buckets)
              .drop(BucketedMergeTarget.BucketCol)
            Some(baseRows.join(upserts.select(pk.map(col): _*), pk, "left_anti")
              .select(pk.map(col): _*))
        }
        val live = upserts.withColumn(DeletedCol,
          org.apache.spark.sql.functions.lit(false))
        deletes.fold(live) { d =>
          val dead = dataFields.foldLeft(d) { (df, f) =>
            if (pk.contains(f)) df
            else df.withColumn(f, org.apache.spark.sql.functions.lit(null)
              .cast(schema(f).dataType))
          }.withColumn(DeletedCol, org.apache.spark.sql.functions.lit(true))
          live.unionByName(dead.select(live.columns.toIndexedSeq.map(col): _*))
        }
      }
    val conformed = batch.select(schema.fieldNames.toIndexedSeq.map(col): _*)
    // getBatch must return a STREAMING frame; wrap the batch plan's
    // executed rows the way FileStreamSource does
    org.apache.spark.sql.graftshim.StreamingFrame.streaming(
      spark, conformed.queryExecution.toRdd, schema)
  }

  override def commit(end: V1Offset): Unit = synchronized {
    val endO = StoreSourceOffset.of(end)
    walk match {
      case Some(w) =>
        if (w.target.version == endO.version && endO.emitted >= w.changed.size) {
          // delta fully processed: its target becomes the next diff base
          committedBase = Some(w.target)
          walk = None
        }
      case None =>
        // a restart-recovery batch emitted EVERY bucket of `recovered`,
        // so once that batch commits, `recovered` is a fully-processed
        // diff base — without this, committedBase stays None and the
        // next getOffset re-emits the whole store a second time
        recovered.filter(_.version >= endO.version).foreach { m =>
          committedBase = Some(m)
        }
    }
    recovered = None
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftStoreStreamSource($path)"
}

object GraftStoreStreamSource {
  /** Tombstone marker column emitted in `tombstones` mode (and the
    * default column the streaming sink's `tombstoneCol` option names). */
  val DeletedCol = "_deleted"
}

/** `(manifest version, changed buckets emitted)` — totally ordered
  * lexicographically because a walk's `emitted` only grows within one
  * version and versions only grow across walks. */
final case class StoreSourceOffset(version: Long, emitted: Int) extends V1Offset {
  override def json: String = s"""{"v":$version,"k":$emitted}"""
}

object StoreSourceOffset {
  private val JsonRe = """\s*\{\s*"v"\s*:\s*(\d+)\s*,\s*"k"\s*:\s*(\d+)\s*\}\s*""".r

  /** Accepts this class, its serialized json, and a bare long (offsets
    * checkpointed by the pre-`maxBucketsPerTrigger` source). */
  def of(o: V1Offset): StoreSourceOffset = o match {
    case s: StoreSourceOffset => s
    case other => other.json match {
      case JsonRe(v, k) => StoreSourceOffset(v.toLong, k.toInt)
      case bare => StoreSourceOffset(bare.trim.toLong, Int.MaxValue)
    }
  }
}
