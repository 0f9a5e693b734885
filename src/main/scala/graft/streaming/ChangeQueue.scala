package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Durable change-queue consumption (S23/T7) — the reference's
  * sqlite-watcher loop (`src/commands/sync_sqlite.rs:62-187`): poll
  * `ListChanges(limit)` from a durable queue, group per table, apply
  * upserts/deletes, then `AckChanges(maxId)` and persist the cursor so a
  * crash resumes exactly where it stopped.
  *
  * The queue here is any frame with the watcher's change shape
  * (`change_id, table_name, op, primary_key, payload` —
  * `sqlite-watcher/src/queue.rs:60-79`); the cursor rides in
  * [[SyncStateStore]]. Consumption is at-least-once + idempotent apply
  * (PK-keyed upserts), the same contract as the reference.
  */
object ChangeQueue {

  /** One listed page. `changes` is PERSISTED (the stats aggregation, the
    * table split, and every per-table apply all consume it — without the
    * persist the top-k page query re-executes N+1 times for N tables,
    * round-2 verdict #5). Call [[Batch.release]] once applied;
    * [[consumeOnce]] does so automatically. */
  final case class Batch(changes: DataFrame, maxChangeId: Long, count: Long) {
    def release(): Unit = { changes.unpersist(); () }
  }

  /** `ListChanges(limit)`: the next `limit` changes past the cursor, in
    * change_id order (a bounded top-k job, not a full sort). */
  def listChanges(queue: DataFrame, cursor: Long, limit: Int): Option[Batch] = {
    val page = queue.filter(col("change_id") > cursor)
      .orderBy(col("change_id").asc)
      .limit(limit)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = page.agg(max(col("change_id")).cast("long"), count(lit(1))).head()
    if (stats.isNullAt(0)) { page.unpersist(); None }
    else Some(Batch(page, stats.getLong(0), stats.getLong(1)))
  }

  /** Per-table change application order: group the batch by table, apply
    * each table's upserts and deletes through the latest-change-wins
    * dedup (`apply_changes` `sync_sqlite.rs:129-187`). Returns the
    * upsert and delete sets per table. */
  def splitByTable(batch: DataFrame): Map[String, (DataFrame, DataFrame)] = {
    val tables = batch.select("table_name").distinct()
      .collect().map(_.getString(0))
    tables.map { t =>
      val forTable = batch.filter(col("table_name") === t)
      val latest = IncrementalSync.latestByKey(forTable,
        keyCols = Seq("primary_key"), cursorCol = "change_id")
      val (up, del) = IncrementalSync.splitChanges(latest, "op")
      t -> (up, del)
    }.toMap
  }

  /** One full consume cycle: list → apply (caller-provided) → ack by
    * persisting the new cursor. `apply` sees (table, upserts, deletes).
    * Returns the number of changes consumed (0 = caught up). */
  def consumeOnce(queue: DataFrame, store: SyncStateStore, schema: String,
                  queueName: String, limit: Int)(
      apply: (String, DataFrame, DataFrame) => Unit): Long = {
    val cursor = store.watermark(schema, queueName)
    listChanges(queue, cursor, limit) match {
      case None => 0L
      case Some(batch) =>
        try {
          splitByTable(batch.changes).foreach { case (t, (up, del)) =>
            apply(t, up, del)
          }
          // ack: cursor advances only after apply — at-least-once
          store.update(TableSyncState(schema, queueName, batch.maxChangeId,
            System.currentTimeMillis(), batch.count))
        } finally batch.release()
        batch.count
    }
  }
}
