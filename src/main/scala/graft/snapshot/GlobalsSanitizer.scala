package graft.snapshot

/** Globals-dump sanitization (S8) — the reference's five rewrite passes
  * over `pg_dumpall --globals-only` output, needed because managed
  * PostgreSQL (e.g. AWS RDS) rejects parts of a vanilla globals dump
  * (`src/migration/dump.rs:98-301` + role rewrite `:303-440`). Pure
  * String → String functions here (the reference reads/writes the file
  * in place; file plumbing is the caller's concern):
  *
  *   1. duplicate roles: wrap `CREATE ROLE` in a DO block catching
  *      duplicate_object so re-runs are idempotent;
  *   2. strip `ALTER ROLE … SUPERUSER` (comment out);
  *   3. strip `ALTER ROLE … SET <guc>` (restricted GUCs);
  *   4. strip tablespace statements (CREATE TABLESPACE + any `rds_*`
  *      tablespace reference);
  *   5. strip grants of restricted roles / `GRANTED BY` RDS grantors.
  */
object GlobalsSanitizer {

  val RestrictedRoles: Set[String] = Set(
    "pg_checkpoint", "pg_read_all_data", "pg_write_all_data",
    "pg_read_all_settings", "pg_read_all_stats", "pg_stat_scan_tables",
    "pg_monitor", "pg_signal_backend", "pg_read_server_files",
    "pg_write_server_files", "pg_execute_server_program",
    "pg_create_subscription", "pg_maintain", "pg_use_reserved_connections")

  val RestrictedGrantors: Set[String] = Set(
    "rdsadmin", "rds_superuser", "rdsrepladmin", "rds_replication")

  private def commentLines(sql: String)(shouldComment: String => Boolean): String =
    sql.linesIterator.map { line =>
      if (shouldComment(line)) "-- " + line else line
    }.mkString("", "\n", if (sql.endsWith("\n")) "\n" else "")

  /** Pass 2 (`dump.rs:114-139`). */
  def removeSuperuser(sql: String): String =
    commentLines(sql)(l => l.contains("ALTER ROLE") && l.contains("SUPERUSER"))

  /** Pass 3 (`dump.rs:145-172`): any `ALTER ROLE … SET` parameter. */
  def removeRestrictedGucSettings(sql: String): String =
    commentLines(sql) { l =>
      val lower = l.toLowerCase
      lower.contains("alter role") && lower.contains("set")
    }

  /** Pass 4 (`dump.rs:181-221`). */
  def removeTablespaceStatements(sql: String): String =
    commentLines(sql) { l =>
      val lower = l.trim.toLowerCase
      lower.startsWith("create tablespace") ||
        lower.contains("'rds_") || lower.contains("\"rds_") ||
        lower.contains("tablespace rds_")
    }

  /** Pass 5 (`dump.rs:228-301`). */
  def removeRestrictedRoleGrants(sql: String): String =
    commentLines(sql) { l =>
      val lower = l.trim.toLowerCase
      lower.startsWith("grant ") && {
        val grantee = lower.split("\\s+").lift(1).map(_.stripPrefix("\"").stripSuffix("\""))
        val restrictedRole = grantee.exists(RestrictedRoles.contains)
        val restrictedGrantor = RestrictedGrantors.exists(g =>
          lower.contains(s"granted by $g") || lower.contains(s"""granted by "$g""""))
        restrictedRole || restrictedGrantor
      }
    }

  /** Pass 1 (`dump.rs:303-440`): each `CREATE ROLE x …;` line becomes a
    * DO block swallowing duplicate_object, so restoring onto a target
    * that already has the role proceeds. */
  def wrapCreateRoles(sql: String): String = {
    val out = sql.linesIterator.map { line =>
      val trimmed = line.dropWhile(_.isWhitespace)
      if (!trimmed.startsWith("CREATE ROLE ")) line
      else {
        val indent = line.take(line.length - trimmed.length)
        val body = trimmed.trim.stripSuffix(";").trim
        extractRoleToken(body) match {
          case None => line
          case Some(token) =>
            val notice = unquoteRole(token).replace("'", "''")
            Seq(
              s"${indent}DO $$$$",
              s"${indent}BEGIN",
              s"$indent    $body;",
              s"${indent}EXCEPTION",
              s"$indent    WHEN duplicate_object THEN",
              s"$indent        RAISE NOTICE 'Role $notice already exists on target, skipping CREATE ROLE';",
              s"${indent}END $$$$;"
            ).mkString("\n")
        }
      }
    }.mkString("", "\n", if (sql.endsWith("\n")) "\n" else "")
    out
  }

  private[snapshot] def extractRoleToken(statement: String): Option[String] = {
    val rem = statement.stripPrefix("CREATE ROLE").dropWhile(_.isWhitespace)
    if (rem.isEmpty) None
    else if (rem.startsWith("\"")) {
      // doubled quotes escape a literal quote inside the identifier
      var i = 1
      while (i < rem.length) {
        if (rem.charAt(i) == '"') {
          if (i + 1 < rem.length && rem.charAt(i + 1) == '"') i += 2
          else { i += 1; return Some(rem.substring(0, i)) }
        } else i += 1
      }
      None
    } else {
      val end = rem.indexWhere(c => c.isWhitespace || c == ';') match {
        case -1 => rem.length
        case i  => i
      }
      if (end == 0) None else Some(rem.substring(0, end))
    }
  }

  private def unquoteRole(token: String): String =
    if (token.length >= 2 && token.startsWith("\"") && token.endsWith("\""))
      token.substring(1, token.length - 1).replace("\"\"", "\"")
    else token

  /** All five passes in the reference's order. */
  def sanitizeAll(sql: String): String =
    removeRestrictedRoleGrants(
      removeTablespaceStatements(
        removeRestrictedGucSettings(
          removeSuperuser(
            wrapCreateRoles(sql)))))
}
