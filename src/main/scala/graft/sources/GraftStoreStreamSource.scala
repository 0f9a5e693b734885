package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
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
  * OFFSETS are committed manifest versions. Each [[getOffset]] poll is
  * one manifest read — no data I/O, no Spark job in steady state, the
  * same cheap no-op answer `StoreFollower.poll` gives. A micro-batch
  * `(start, end]` emits the CURRENT contents of the buckets whose owning
  * version dir changed between the two pinned manifests: multiple store
  * commits between polls coalesce into one delta naturally, and I/O per
  * batch is ∝ what changed, never ∝ store size.
  *
  * The feed is upsert-shaped and at-least-once PER KEY (keys sharing a
  * bucket with a changed key are re-emitted; the rows carry the store's
  * cursor column, so a latest-wins consumer — e.g. the `graft-store`
  * streaming SINK with `cursor` pointing at it — absorbs replays
  * idempotently). Deletes are NOT expressed: a deleted key simply stops
  * appearing. A consumer needing delete fidelity wants bucket-replace
  * mirroring — [[graft.streaming.StoreFollower.replicate]] — not a row
  * feed. This mirrors the reference's follower split: its xmin feed is
  * upsert-only while reconcile handles deletes (`src/xmin/daemon.rs`,
  * `src/commands/reconcile.rs`).
  *
  * RECOVERY: manifests are pinned in memory between poll and commit.
  * After a restart the checkpointed start version's manifest is usually
  * gone (store gc retains only the newest two) — the source then
  * re-emits ALL buckets of the end manifest. That is the documented
  * [[graft.streaming.StoreFollower.Start]] semantics: full re-emit is
  * correctness-free for the idempotent consumers this feed targets.
  *
  * Schema is fixed at stream start (the manifest's schema when the
  * source was created). Columns added to the store mid-stream by
  * additive evolution appear after a stream restart, not mid-run —
  * Structured Streaming requires a stable source schema.
  */
final class GraftStoreStreamSource(spark: SparkSession, path: String,
                                   override val schema: StructType)
    extends Source {

  /** Manifests pinned between getOffset and getBatch/commit, by version.
    * Bounded: commit() drops everything below the committed version, and
    * getOffset only pins when the version advances. */
  private val pinned = scala.collection.mutable.Map.empty[Long, Manifest]
  private var newestPolled: Option[Long] = None

  private def ver(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getOffset: Option[V1Offset] = synchronized {
    BucketedMergeTarget.currentManifest(spark, path).foreach { m =>
      if (!newestPolled.exists(_ >= m.version)) {
        pinned(m.version) = m
        newestPolled = Some(m.version)
      }
    }
    newestPolled.map(LongOffset.apply)
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val (endM, changed) = synchronized {
      val endV = ver(end)
      // end's manifest: pinned normally; after a restart re-read the
      // store — exact version if it survives gc, else newest (the feed
      // is upsert-shaped, emitting newer state early is harmless)
      val em = pinned.get(endV)
        .orElse(BucketedMergeTarget.currentManifest(spark, path))
        .getOrElse(throw new IllegalStateException(
          s"graft-store source: no committed manifest under $path for offset $endV"))
      val ch = start.map(ver).flatMap(pinned.get) match {
        case Some(sm) =>
          // changed = owner dir differs, plus buckets emptied since start
          em.buckets.collect {
            case (b, d) if !sm.buckets.get(b).contains(d) => b
          }.toSet ++ (sm.buckets.keySet -- em.buckets.keySet)
        case None => em.buckets.keySet // first batch or unpinned restart
      }
      (em, ch)
    }
    val batch = BucketedMergeTarget.readBuckets(spark, path, endM, changed)
      .drop(BucketedMergeTarget.BucketCol)
      // conform to the stream's declared schema: columns added to the
      // store after stream start are deferred to a restart
      .select(schema.fieldNames.toIndexedSeq.map(col): _*)
    // getBatch must return a STREAMING frame; wrap the batch plan's
    // executed rows the way FileStreamSource does
    org.apache.spark.sql.graftshim.StreamingFrame.streaming(
      spark, batch.queryExecution.toRdd, schema)
  }

  override def commit(end: V1Offset): Unit = synchronized {
    val v = ver(end)
    // keep the committed version's manifest — it is the diff base for
    // the NEXT batch; everything older is unreachable
    pinned.filterInPlace { case (k, _) => k >= v }
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftStoreStreamSource($path)"
}
