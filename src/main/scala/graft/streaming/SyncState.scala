package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** Per-table sync watermark state — reference `TableSyncState`
  * (`src/xmin/state.rs:12-24`) persisted as JSON between cycles
  * (`state.rs:119-148`): the high-water mark the next incremental scan
  * starts from, plus bookkeeping for monitoring.
  */
final case class TableSyncState(
    schema: String,
    table: String,
    lastVersion: Long,
    lastSyncAtEpochMs: Long,
    lastRowCount: Long
) {
  def key: String = s"$schema.$table"
}

object SyncStateStore {
  private val lineRe =
    ("""\{"schema":"([^"]*)","table":"([^"]*)","last_version":(-?\d+),""" +
      """"last_sync_at":(-?\d+),"last_row_count":(-?\d+)\}""").r
}

/** File-backed store of every table's state (one JSON line per table —
  * append-friendly, trivially parseable, atomic rewrite on save). */
final class SyncStateStore(path: Path) {
  import SyncStateStore.lineRe

  private var states: Map[String, TableSyncState] = load()

  def get(schema: String, table: String): Option[TableSyncState] =
    states.get(s"$schema.$table")

  def watermark(schema: String, table: String): Long =
    get(schema, table).map(_.lastVersion).getOrElse(0L)

  def update(state: TableSyncState): Unit = {
    states = states + (state.key -> state)
    persist()
  }

  def all: Seq[TableSyncState] = states.values.toSeq.sortBy(_.key)

  private def toLine(s: TableSyncState): String =
    s"""{"schema":"${s.schema}","table":"${s.table}","last_version":${s.lastVersion},""" +
      s""""last_sync_at":${s.lastSyncAtEpochMs},"last_row_count":${s.lastRowCount}}"""

  private def load(): Map[String, TableSyncState] =
    if (!Files.exists(path)) Map.empty
    else new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      .linesIterator.flatMap {
        case lineRe(sc, t, v, at, rc) =>
          Some(TableSyncState(sc, t, v.toLong, at.toLong, rc.toLong))
        case _ => None
      }.map(s => s.key -> s).toMap

  private def persist(): Unit = {
    Files.createDirectories(path.toAbsolutePath.getParent)
    val tmp = path.toAbsolutePath.getParent.resolve(path.getFileName.toString + ".tmp")
    Files.write(tmp,
      all.map(toLine).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
