package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyset-paginated batch reading (S11/S16/O1) — the reference's
  * `BatchReader` (`src/xmin/reader.rs:202-312`): page through a table in
  * bounded batches ordered by a compound key `(version, tiebreak)` so
  * duplicate versions (many rows sharing one xmin) can never wedge the
  * cursor, with `WHERE (v, t) > (lastV, lastT)` keyset resumption.
  *
  * In Spark a FULL scan is normally one partitioned job — this reader
  * exists for the sync loop's bounded change batches (apply at most N
  * rows per cycle, remember where you stopped) and for memory-bounded
  * drains of huge change backlogs. Each page is a top-k job
  * (TakeOrderedAndProject — no global sort, no single-partition shuffle).
  */
object KeysetReader {

  final case class Cursor(version: Long, tiebreak: Long)

  /** One page: rows strictly after `cursor` in (version, tiebreak) order,
    * limited to `batchSize`. Returns (page, nextCursor); nextCursor is
    * None when the page came back empty (drained). */
  def readPage(df: DataFrame, versionCol: String, tiebreakCol: String,
               cursor: Option[Cursor], batchSize: Int): (DataFrame, Option[Cursor]) = {
    val v = col(versionCol).cast("long")
    val t = col(tiebreakCol).cast("long")
    val after: Column = cursor match {
      case None => lit(true)
      case Some(c) =>
        (v > c.version) || (v === c.version && t > c.tiebreak)
    }
    val page = df.filter(after)
      .orderBy(v.asc, t.asc)
      .limit(batchSize)
    val last = page.select(v.as("v"), t.as("t"))
      .orderBy(col("v").desc, col("t").desc).limit(1).collect()
    val next = last.headOption.map(r => Cursor(r.getLong(0), r.getLong(1)))
    (page, next)
  }

  /** Drain the whole table as a lazy stream of pages — the batching loop
    * the reference runs per sync cycle (`fetch_batch` until empty). */
  def pages(df: DataFrame, versionCol: String, tiebreakCol: String,
            batchSize: Int,
            start: Option[Cursor] = None): Iterator[DataFrame] =
    new Iterator[DataFrame] {
      private var cursor: Option[Cursor] = start
      private var nextPage: Option[DataFrame] = None
      private var drained = false

      private def advance(): Unit =
        if (!drained && nextPage.isEmpty) {
          val (page, next) = readPage(df, versionCol, tiebreakCol, cursor, batchSize)
          next match {
            case Some(c) => cursor = Some(c); nextPage = Some(page)
            case None    => drained = true
          }
        }

      override def hasNext: Boolean = { advance(); nextPage.nonEmpty }
      override def next(): DataFrame = {
        advance()
        val p = nextPage.getOrElse(throw new NoSuchElementException("drained"))
        nextPage = None
        p
      }
    }
}
