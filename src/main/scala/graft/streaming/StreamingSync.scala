package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming forms of the sync/analytics operators (T3/T7/T8):
  * the same logical transforms as the batch paths, expressed so they run
  * under `readStream`/`writeStream` with watermarks and state — Spark's
  * micro-batch loop replaces the reference's `tokio::interval` daemon
  * (`src/xmin/daemon.rs:237-329`).
  */
object StreamingSync {

  /** Watermarked tumbling-window aggregation over an event stream —
    * count + exact (decimal) value sum per (window, event_type). Works
    * identically on a batch frame (the oracle path) and a stream: on a
    * stream the watermark bounds state and late data.
    *
    * Sums go through DECIMAL(18,6): float summation is
    * order-dependent, and a shuffle must not change the answer. */
  def windowedEventCounts(events: DataFrame, windowLen: String,
                          watermarkDelay: Option[String] = None): DataFrame = {
    val src = watermarkDelay.fold(events)(d => events.withWatermark("ts", d))
    src.groupBy(
        window(col("ts"), windowLen).as("w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Sliding-window aggregation (T8, beyond the reference — it has no
    * windows at all): each event lands in width/slide overlapping
    * windows. Same batch/stream duality as [[windowedEventCounts]]. */
  def slidingEventCounts(events: DataFrame, width: String, slide: String,
                         watermarkDelay: Option[String] = None): DataFrame = {
    val src = watermarkDelay.fold(events)(d => events.withWatermark("ts", d))
    src.groupBy(
        window(col("ts"), width, slide).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"))
  }

  /** Stream-stream interval join (beyond the reference): attribute each
    * right-stream event to a left-stream event of the same key that
    * happened at most `within` earlier (click → the impression that
    * caused it). Both sides are watermarked — REQUIRED for stream-stream
    * joins, since the interval condition plus the watermarks is what lets
    * Spark expire buffered rows: left state is held `within` + left
    * delay, right state the right delay, so state is
    * O(throughput × (within + delay)), never O(stream).
    *
    * Column contract: `left` has (key, lts), `right` has (key, rts), plus
    * any payload columns; the join emits every (left ⋈ right) pair with
    * rts ∈ [lts, lts + within]. Batch frames run the identical plan (the
    * watermark degrades to a no-op), preserving the batch/stream duality
    * of the window operators. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   within: String, leftDelay: String = "10 minutes",
                   rightDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("lts", leftDelay)
    val r = right.withWatermark("rts", rightDelay)
    l.join(r, l(key) === r(key) &&
        col("rts") >= col("lts") &&
        col("rts") <= col("lts") + expr(s"INTERVAL $within"))
      .drop(r(key))
  }

  /** Session-window aggregation per user (T8, beyond the reference):
    * events closer than `gap` merge into one session; a gap ≥ `gap`
    * starts a new one. In streaming this is Spark's dynamic-gap session
    * state; in batch the same expression computes the gaps-and-islands
    * form the SQL oracle replays. */
  def sessionEventCounts(events: DataFrame, gap: String,
                         watermarkDelay: Option[String] = None): DataFrame = {
    val src = watermarkDelay.fold(events)(d => events.withWatermark("ts", d))
    src.groupBy(
        session_window(col("ts"), gap).as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))
  }

  /** Streaming exact dedup: first occurrence of each content fingerprint
    * wins; later copies are dropped. `withWatermark` +
    * `dropDuplicatesWithinWatermark` bounds the dedup state — a
    * fingerprint older than the watermark delay is forgotten, so state is
    * O(throughput × delay), never O(stream history). That bound is the
    * 100 TB decision: unbounded `dropDuplicates` state on an infinite
    * stream eventually evicts to nothing or OOMs; the batch-side global
    * answer is [[graft.operators.Dedup.exactDedup]] over the accumulated
    * store. The fingerprint column is computed here (md5 of normalized
    * text) so batch and stream agree on what "identical" means. */
  def streamingDedup(docs: DataFrame, textCol: String,
                     watermarkDelay: String): DataFrame =
    docs
      .withColumn("__fp",
        md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ").cast("binary")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  final case class Change(key: String, cursor: Long, payload: String)
  final case class Latest(key: String, cursor: Long, payload: String)

  /** Streaming `_latest` materialization (T7): per-key newest change,
    * kept in typed state via mapGroupsWithState — each micro-batch emits
    * the current latest row per touched key; replays are idempotent
    * because state only advances on a larger cursor. */
  def latestByKeyStream(changes: Dataset[Change]): Dataset[Latest] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .mapGroupsWithState[Latest, Latest](GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Change], state: GroupState[Latest]) =>
          val incoming = rows.maxBy(_.cursor)
          val current = state.getOption
          val next =
            if (current.exists(_.cursor >= incoming.cursor)) current.get
            else Latest(key, incoming.cursor, incoming.payload)
          state.update(next)
          next
      }
  }

  /** Streaming upsert merge into a bucket-pruned parquet target via
    * foreachBatch — the micro-batch form of the sync loop (T3/T4): every
    * micro-batch is merged cursor-aware into [[graft.sinks.BucketedMergeTarget]],
    * rewriting only the buckets the batch touches (I/O ∝ batch, not
    * target) and committing atomically (a crash mid-write leaves the
    * previous manifest intact; the replayed batch re-merges — idempotent,
    * which is exactly Spark's replayed-batch contract). A late-arriving
    * STALE change can never regress the target because the merge keeps
    * max-cursor-per-key. Returns the started query; callers own its
    * lifecycle. Read the target back with `BucketedMergeTarget.read`. */
  def streamingUpsertToParquet(changes: DataFrame, targetPath: String,
                               pkCols: Seq[String], cursorCol: String,
                               checkpointDir: String,
                               nBuckets: Int = graft.sinks.BucketedMergeTarget.DefaultBuckets): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // empty batches no-op inside merge (no version churn)
        graft.sinks.BucketedMergeTarget.merge(batch, targetPath, pkCols, cursorCol, nBuckets)
        ()
      }
      .start()

  /** Streaming near-duplicate ingestion — the 100 TB arrival shape as a
    * `foreachBatch` pipeline: each micro-batch's banded signatures probe
    * the accumulated signature store (bucket-pruned, I/O ∝ batch — see
    * [[graft.operators.IncrementalDedup]]), flagged cross-batch pairs
    * land in a pair store keyed by `(id_new, id_old)`, and the batch's
    * signatures are appended — probe-before-append, ordered inside
    * `ingestBatch` (candidates are materialized before the store
    * advances, so a batch never matches itself through the store).
    *
    * Replay contract (Spark may re-run a failed micro-batch): both
    * stores are cursor-idempotent merges keyed by the epoch, so replayed
    * writes overwrite themselves. A crash BETWEEN append and the pair
    * commit makes the replayed probe see its own batch in the store:
    * self-pairs are filtered inside `probeCandidates`, and any extra
    * pairs are genuine intra-batch near-dups — at-least-once surfaces a
    * superset of pairs, never a wrong pair.
    *
    * Returns the started query; read pairs with
    * `BucketedMergeTarget.read(spark, pairsPath)`. */
  def streamingNearDupIngest(docs: DataFrame, idCol: String, textCol: String,
                             storePath: String, pairsPath: String,
                             checkpointDir: String,
                             params: graft.operators.IncrementalDedup.LshParams =
                               graft.operators.IncrementalDedup.LshParams(),
                             nBuckets: Int = graft.sinks.BucketedMergeTarget.DefaultBuckets)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val (cands, _) = graft.operators.IncrementalDedup.ingestBatch(
          batch, idCol, col(textCol), storePath, epochId, params, nBuckets)
        // merge no-ops on an empty candidate frame (no version churn)
        graft.sinks.BucketedMergeTarget.merge(
          cands.withColumn("batch_id", lit(epochId)),
          pairsPath, Seq("id_new", "id_old"), "batch_id", nBuckets)
        ()
      }
      .start()

  /** Convenience: run the windowed aggregation as a stream into an
    * in-memory sink and block until `input` is drained — the harness the
    * streaming tests (and any smoke run) use. Returns the sink rows. */
  def runWindowedToMemory(stream: DataFrame, windowLen: String,
                          watermarkDelay: String, queryName: String): Unit = {
    val q = windowedEventCounts(stream, windowLen, Some(watermarkDelay))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
