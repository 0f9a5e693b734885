package graft.snapshot

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sinks.{DdlGen, JdbcUpsertWriter}
import graft.sources.FkGraph

/** Restore/load orchestration (K11/K12 shape) — the reference restores
  * schema first (`psql`, `src/migration/restore.rs:10-172`) and then data
  * single-threaded to respect FK order (`pg_restore -j1`,
  * `restore.rs:174-279`). Spark-first version: schema DDL executes
  * up-front; tables load in FK topological order (parents before
  * children) — each table's write is internally data-parallel across
  * partitions, so the only serialization is BETWEEN dependent tables,
  * which is exactly what FK integrity requires.
  */
object RestoreJob {

  final case class TableSpec(name: String, pkCols: Seq[String])

  final case class Report(ordered: Seq[String], rows: Map[String, Long])

  def run(spark: SparkSession, sourceDir: String, tables: Seq[TableSpec],
          edges: Seq[FkGraph.FkEdge],
          connFactory: JdbcUpsertWriter.ConnFactory): Report = {
    val byName = tables.map(t => t.name -> t).toMap
    val order = FkGraph.topoOrder(tables.map(_.name), edges)

    // schema first (restore.rs:10-172): all DDL on one connection
    val frames: Map[String, DataFrame] = order.map { t =>
      t -> spark.read.parquet(s"$sourceDir/$t.parquet")
    }.toMap
    val ddlConn = connFactory()
    try JdbcUpsertWriter.executeDdl(
      order.map(t => DdlGen.createTableDdl(t, frames(t).schema, byName(t).pkCols)),
      ddlConn)
    finally ddlConn.close()

    // data in FK order: parents fully loaded before children start
    val rows = order.map { t =>
      val df = frames(t)
      JdbcUpsertWriter.upsert(df, t, byName(t).pkCols, connFactory)
      t -> df.count()
    }.toMap
    Report(order, rows)
  }
}
