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

  /** Streaming upsert merge into a parquet target via foreachBatch —
    * the micro-batch form of the sync loop (T3/T4): every micro-batch is
    * deduplicated latest-per-key and merged PK-keyed into the target.
    * Replayed batches are idempotent (same anti-join + union outcome),
    * which is exactly Spark's replayed-batch contract. Returns the
    * started query; callers own its lifecycle. */
  def streamingUpsertToParquet(changes: DataFrame, targetPath: String,
                               pkCols: Seq[String], cursorCol: String,
                               checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val deduped = IncrementalSync.latestByKey(batch, pkCols, cursorCol)
        // cursor-aware merge: max-cursor row per key over target ∪ batch,
        // so a late-arriving STALE change can never regress the target
        // (plain PK replacement would — streams don't promise order)
        val merged =
          if (new java.io.File(targetPath).exists()) {
            val target = spark.read.parquet(targetPath)
            IncrementalSync.latestByKey(
              target.unionByName(deduped), pkCols, cursorCol)
          } else deduped
        // stage-then-swap: parquet can't be overwritten while being read
        val staged = targetPath + ".staging"
        merged.write.mode("overwrite").parquet(staged)
        spark.read.parquet(staged).write.mode("overwrite").parquet(targetPath)
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
