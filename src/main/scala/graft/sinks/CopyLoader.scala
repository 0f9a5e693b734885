package graft.sinks

import java.sql.Connection

import org.apache.spark.sql.{DataFrame, Row}

import graft.core.Identifiers

/** K2 — COPY bulk load, the reference's fast lane for initial snapshot
  * ingestion (`copy_jsonb_batch`, `src/jsonb/writer.rs:230-322`; claimed
  * 5–10× over batch INSERT, `writer.rs:191-192`).
  *
  * Execution model mirrors [[JdbcUpsertWriter]]: `df.foreachPartition`,
  * one connection and ONE `COPY … FROM STDIN` stream per partition — N
  * concurrent COPY streams across the cluster, each a single round-trip
  * protocol. Unlike the reference (which builds the whole batch in one
  * String buffer, `writer.rs:270-272`), rows are streamed in bounded
  * chunks so a 100 GB partition never materializes in executor memory.
  *
  * The PostgreSQL driver isn't on the compile classpath (and the sandbox
  * has no live PG), so the CopyManager is reached reflectively at runtime
  * behind the [[CopyLoader.CopyApi]] seam — tests pin the exact COPY SQL
  * and the exact escaped bytes against a recording mock, byte-for-byte
  * with `escape_copy_text` (`writer.rs:174-186`).
  */
object CopyLoader {

  /** COPY text-format escaping — byte parity with `escape_copy_text`
    * (`writer.rs:174-186`): backslash, tab, newline, carriage return.
    * Everything else (including other control chars) passes through. */
  def escapeCopyText(s: String): String = {
    val b = new StringBuilder(s.length + s.length / 10)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '\t' => b.append("\\t")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case c    => b.append(c)
    }
    b.toString
  }

  /** The COPY command (`writer.rs:252-255`). Caller must validate `table`. */
  def copySql(table: String): String =
    s"""COPY "$table" (id, data, _source_type) FROM STDIN WITH (FORMAT text)"""

  /** One COPY text line: `id\tdata\tsource_type\n` (`writer.rs:274-281`).
    * A null value is written as the COPY text NULL marker `\N` (the
    * reference never produces nulls here — its model columns are NOT
    * NULL — but a null cell must not NPE the whole partition task). */
  def formatRow(id: String, data: String, sourceType: String): String = {
    def field(s: String): String = if (s == null) "\\N" else escapeCopyText(s)
    field(id) + "\t" + field(data) + "\t" + field(sourceType) + "\n"
  }

  /** The COPY-IN seam: production = reflective CopyManager; tests = a
    * recording mock. Must be serializable (captured by task closures). */
  trait CopyApi extends Serializable {
    /** Stream `chunks` into `COPY` and return rows copied. */
    def copyIn(conn: Connection, sql: String, chunks: Iterator[Array[Byte]]): Long
  }

  /** Production adapter over `org.postgresql.copy.CopyManager`, bound by
    * reflection because the PG driver is a runtime-only dependency. */
  object PgCopyApi extends CopyApi {
    def copyIn(conn: Connection, sql: String, chunks: Iterator[Array[Byte]]): Long = {
      val baseConn = Class.forName("org.postgresql.core.BaseConnection")
      val mgrCls = Class.forName("org.postgresql.copy.CopyManager")
      val mgr = mgrCls.getConstructor(baseConn)
        .newInstance(conn.unwrap(baseConn.asInstanceOf[Class[AnyRef]]))
      val copyIn = mgrCls.getMethod("copyIn", classOf[String]).invoke(mgr, sql)
      val copyInCls = Class.forName("org.postgresql.copy.CopyIn")
      val write = copyInCls.getMethod("writeToCopy",
        classOf[Array[Byte]], classOf[Int], classOf[Int])
      chunks.foreach { c =>
        write.invoke(copyIn, c, Integer.valueOf(0), Integer.valueOf(c.length)); ()
      }
      copyInCls.getMethod("endCopy").invoke(copyIn).asInstanceOf[java.lang.Long]
    }
  }

  /** Distributed bulk load of a `(id, data, _source_type)` JSONB-model
    * frame. Table name validated first (`writer.rs:240`); empty
    * partitions open no connection (`writer.rs:243-245`). */
  def copyJsonbModel(df: DataFrame, table: String,
                     connFactory: JdbcUpsertWriter.ConnFactory,
                     api: CopyApi = PgCopyApi,
                     chunkRows: Int = 1000): Unit = {
    Identifiers.validateTableName(table) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(_)  => ()
    }
    val sql = copySql(table)
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.nonEmpty) {
        val conn = connFactory()
        try {
          val chunks = it.grouped(chunkRows).map { batch =>
            batch.iterator.map { r =>
              formatRow(r.getAs[String]("id"), r.getAs[String]("data"),
                r.getAs[String]("_source_type"))
            }.mkString.getBytes("UTF-8")
          }
          api.copyIn(conn, sql, chunks)
          ()
        } finally conn.close()
      }
    }
  }
}
