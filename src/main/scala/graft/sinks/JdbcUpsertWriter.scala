package graft.sinks

import java.sql.{Connection, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row}

/** JDBC merge/delete EXECUTOR — drives the [[UpsertSql]] statement
  * builders from Spark tasks, the way the reference's `ChangeWriter`
  * drives its generated SQL (`src/xmin/writer.rs:48-174` apply_batch,
  * `:207-258` delete_rows).
  *
  * Execution model: `df.foreachPartition` — each Spark task opens one
  * connection (via the serializable `connFactory`), drains its partition
  * in parameter-limit-sized batches, and closes. That is the idiomatic
  * Spark replacement for the reference's manual batching loop: N
  * executors × M partitions stream concurrently into the target, and
  * Spark task retry replays a failed partition idempotently because the
  * statements are `ON CONFLICT` upserts.
  *
  * Error degradation mirrors `writer.rs:88-144`: a batch that fails with
  * a retryable SQLException is split in half and each half retried
  * (halve-on-"value too large"), down to single rows — so one poison row
  * fails alone instead of poisoning its whole batch.
  */
object JdbcUpsertWriter {

  type ConnFactory = () => Connection

  /** Bind one row's values at 1-based offset `base`. Values arrive as
    * Spark external JVM types (String, boxed primitives,
    * java.sql.Timestamp, java.math.BigDecimal, Array[Byte]) — setObject
    * covers all of them; null goes through setNull(…, NULL) like the
    * reference's explicit None binding. */
  private def bindRow(st: PreparedStatement, values: Seq[Any], base: Int): Unit =
    values.zipWithIndex.foreach { case (v, i) =>
      if (v == null) st.setNull(base + i, java.sql.Types.NULL)
      else st.setObject(base + i, v)
    }

  /** The one error class the reference degrades on: oversized row data
    * (`writer.rs:117` matches "value too large to transmit"; SQLSTATE
    * 22001 is the standard string_data_right_truncation code). Anything
    * else — constraint violations, serialization failures, dead
    * connections — must propagate immediately, NOT degenerate into ~2N
    * single-row retries. */
  private[sinks] def isValueTooLarge(e: java.sql.SQLException): Boolean =
    e.getSQLState == "22001" ||
      Option(e.getMessage).exists(_.contains("value too large to transmit"))

  /** Execute one multi-row upsert; on a value-too-large failure split in
    * half and retry each half (`writer.rs:88-144`). Single failing rows
    * and every other SQLException propagate. */
  private[sinks] def executeUpsertWithSplit(
      conn: Connection, table: String, columns: Seq[String],
      pkCols: Seq[String], rows: Seq[Seq[Any]]): Unit = {
    if (rows.isEmpty) return
    val sql = UpsertSql.upsertStatement(table, columns, pkCols, rows.size)
    val st = conn.prepareStatement(sql)
    try {
      rows.zipWithIndex.foreach { case (r, i) => bindRow(st, r, i * columns.size + 1) }
      st.executeUpdate()
      ()
    } catch {
      case e: java.sql.SQLException if rows.size > 1 && isValueTooLarge(e) =>
        val (a, b) = rows.splitAt(rows.size / 2)
        executeUpsertWithSplit(conn, table, columns, pkCols, a)
        executeUpsertWithSplit(conn, table, columns, pkCols, b)
    } finally st.close()
  }

  /** Drain one partition's rows as batched upserts. */
  private[sinks] def upsertPartition(
      rows: Iterator[Row], columns: Seq[String], table: String,
      pkCols: Seq[String], conn: Connection): Long = {
    val batchRows = UpsertSql.upsertBatchRows(columns.size)
    var n = 0L
    rows.map(r => columns.map(c => r.getAs[Any](c)))
      .grouped(batchRows)
      .foreach { batch =>
        executeUpsertWithSplit(conn, table, columns, pkCols, batch.toSeq)
        n += batch.size
      }
    n
  }

  /** Distributed upsert: every task merges its partition via
    * `INSERT … ON CONFLICT` honoring the 65 K-param / 100-row caps.
    * Idempotent under Spark task replay (K6/T4). */
  def upsert(df: DataFrame, table: String, pkCols: Seq[String],
             connFactory: ConnFactory): Unit = {
    val columns = df.columns.toSeq
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.nonEmpty) {
        val conn = connFactory()
        try { upsertPartition(it, columns, table, pkCols, conn); () }
        finally conn.close()
      }
    }
  }

  /** Drain one partition's PK rows as batched deletes
    * (single-col `IN (…)`, composite `(a,b) IN ((…))`, 1000/statement —
    * `writer.rs:207-258,333-377`). */
  private[sinks] def deletePartition(
      rows: Iterator[Row], pkCols: Seq[String], table: String,
      conn: Connection): Long = {
    var n = 0L
    rows.map(r => pkCols.map(c => r.getAs[Any](c)))
      .grouped(UpsertSql.DeleteBatch)
      .foreach { batch =>
        val st = conn.prepareStatement(
          UpsertSql.deleteStatement(table, pkCols, batch.size))
        try {
          batch.zipWithIndex.foreach { case (r, i) => bindRow(st, r, i * pkCols.size + 1) }
          st.executeUpdate()
          n += batch.size
        } finally st.close()
      }
    n
  }

  /** Distributed delete-by-PK (K7 / delete propagation T5). */
  def delete(df: DataFrame, table: String, pkCols: Seq[String],
             connFactory: ConnFactory): Unit = {
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.nonEmpty) {
        val conn = connFactory()
        try { deletePartition(it, pkCols, table, conn); () }
        finally conn.close()
      }
    }
  }

  /** Execute DDL statements sequentially on one connection (K1/K8/K9 —
    * `src/jsonb/writer.rs:44-165`). Driver-side: DDL is not data-parallel. */
  def executeDdl(statements: Seq[String], conn: Connection): Unit =
    statements.foreach { sql =>
      val st = conn.createStatement()
      try st.execute(sql)
      finally st.close()
    }

  /** Create the uniform JSONB-model table + indexes, then upsert the
    * `(id, data, _source_type)` frame into it — the executable version of
    * the reference's jsonb ingestion path (`src/jsonb/writer.rs`). */
  def writeJsonbModel(df: DataFrame, table: String,
                      connFactory: ConnFactory): Unit = {
    val ddlConn = connFactory()
    try executeDdl(UpsertSql.jsonbTableDdl(table), ddlConn)
    finally ddlConn.close()
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.nonEmpty) {
        val conn = connFactory()
        try {
          it.grouped(UpsertSql.MaxRowsPerUpsert).foreach { batch =>
            val st = conn.prepareStatement(
              UpsertSql.jsonbUpsertStatement(table, batch.size))
            try {
              batch.zipWithIndex.foreach { case (r, i) =>
                bindRow(st, Seq(r.getAs[Any]("id"), r.getAs[Any]("data"),
                  r.getAs[Any]("_source_type")), i * 3 + 1)
              }
              st.executeUpdate()
            } finally st.close()
          }
        } finally conn.close()
      }
    }
  }
}
