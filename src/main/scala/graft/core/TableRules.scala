package graft.core

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-table replication rules, per reference `src/table_rules.rs`:
  *   - schema-only (DDL copied, data skipped)          `:303-305`
  *   - arbitrary SQL row predicate per table           `:211-226`
  *   - time-window predicate `col >= NOW() - INTERVAL` `:158-166, 228-255`
  * with the qualified-name parse (`db.schema.table`, `:14-75`) and the
  * order-insensitive fingerprint (`:365-373`).
  *
  * Spark-first: predicates become `df.filter(expr(...))` so Catalyst pushes
  * them into the scan (JDBC pushdown / parquet PushedFilters) — the rule
  * carries config, the optimizer does the work.
  */
final case class QualifiedTable(database: Option[String], schema: String, table: String) {
  def qualified: String = database.fold(s"$schema.$table")(db => s"$db.$schema.$table")
}

object QualifiedTable {
  /** Parse `table`, `schema.table`, or `db.schema.table`
    * (reference `src/table_rules.rs:14-75`; default schema `public`). */
  def parse(s: String): Either[String, QualifiedTable] =
    s.split("\\.").toList match {
      case t :: Nil if t.nonEmpty           => Right(QualifiedTable(None, "public", t))
      case sc :: t :: Nil                   => Right(QualifiedTable(None, sc, t))
      case db :: sc :: t :: Nil             => Right(QualifiedTable(Some(db), sc, t))
      case _                                => Left(s"invalid qualified table name: '$s'")
    }
}

final case class TimeFilterRule(column: String, window: String) {
  /** Rendered SQL predicate, reference `src/table_rules.rs:158-166`. */
  def predicateSql: String = s""""$column" >= NOW() - INTERVAL '$window'"""

  /** Spark Column form of the same predicate. */
  def predicate: Column =
    col(column) >= current_timestamp() - expr(s"INTERVAL '$window'")
}

final case class TableRules(
    schemaOnly: Set[String] = Set.empty,                 // qualified names
    tableFilters: Map[String, String] = Map.empty,       // qualified -> SQL predicate
    timeFilters: Map[String, TimeFilterRule] = Map.empty // qualified -> rule
) {

  /** A table may have a SQL predicate or a time filter, not both
    * (reference `src/table_rules.rs:228-255` rejects the conflict). */
  def addTableFilter(table: String, pred: String): Either[String, TableRules] =
    if (timeFilters.contains(table)) Left(s"$table already has a time filter")
    else Right(copy(tableFilters = tableFilters + (table -> pred)))

  def addTimeFilter(table: String, column: String, window: String): Either[String, TableRules] =
    normalizeTimeWindow(window).flatMap { w =>
      if (tableFilters.contains(table)) Left(s"$table already has a SQL filter")
      else Right(copy(timeFilters = timeFilters + (table -> TimeFilterRule(column, w))))
    }

  def isSchemaOnly(table: String): Boolean = schemaOnly.contains(table)

  /** All tables with a row predicate of either kind
    * (reference `predicate_tables` `src/table_rules.rs:320-339`). */
  def predicateTables: Map[String, String] =
    tableFilters ++ timeFilters.map { case (t, r) => t -> r.predicateSql }

  /** Apply this table's rules to a DataFrame: schema-only → empty frame
    * (limit 0 prunes the scan entirely), predicates → pushed-down filter. */
  def apply(table: String, df: DataFrame): DataFrame =
    if (isSchemaOnly(table)) df.limit(0)
    else
      tableFilters.get(table).map(p => df.filter(expr(p)))
        .orElse(timeFilters.get(table).map(r => df.filter(r.predicate)))
        .getOrElse(df)

  /** Validate + normalize `<n> <unit>` windows
    * (reference `normalize_time_window` `src/table_rules.rs:479`). */
  def normalizeTimeWindow(w: String): Either[String, String] = {
    val trimmed = w.trim.toLowerCase
    val re = "^(\\d+)\\s*(hour|hours|day|days|week|weeks|month|months|year|years)$".r
    trimmed match {
      case re(n, unit) =>
        val u = if (unit.endsWith("s")) unit else unit + "s"
        Right(s"$n $u")
      case _ => Left(s"invalid time window: '$w'")
    }
  }

  /** Order-insensitive SHA-256 fingerprint mirroring the reference's
    * separator scheme (`src/table_rules.rs:365-373`, `:534-560`): set
    * entries as `name|`, map entries as `name=value|`, time-filter values
    * encoded `column|window`, sections separated by `#`. */
  def fingerprint: String = {
    val md = MessageDigest.getInstance("SHA-256")
    def feed(s: String): Unit = md.update(s.getBytes(StandardCharsets.UTF_8))
    schemaOnly.toSeq.sorted.foreach(t => feed(s"$t|"))
    feed("#")
    tableFilters.toSeq.sortBy(_._1).foreach { case (t, p) => feed(s"$t=$p|") }
    feed("#")
    timeFilters.toSeq.sortBy(_._1).foreach { case (t, r) => feed(s"$t=${r.column}|${r.window}|") }
    md.digest().map("%02x".format(_)).mkString
  }
}
