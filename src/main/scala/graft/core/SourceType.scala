package graft.core

/** Typed source connections, per reference `src/lib.rs:28-38` (enum
  * SourceType) with URL-scheme / file-extension detection mirroring
  * `src/lib.rs:65-86`.
  */
sealed trait SourceType {
  /** JDBC driver-ish scheme the Spark reader would use. */
  def scheme: String
}

object SourceType {
  case object PostgreSQL extends SourceType { val scheme = "postgresql" }
  case object SQLite     extends SourceType { val scheme = "sqlite"     }
  case object MongoDB    extends SourceType { val scheme = "mongodb"    }
  case object MySQL      extends SourceType { val scheme = "mysql"      }

  /** Detect the source type from a connection URL or file path.
    * Reference semantics (`src/lib.rs:65-86`): URL scheme first, then
    * SQLite file extensions, else error.
    */
  def detect(url: String): Either[String, SourceType] = {
    val lower = url.toLowerCase
    if (lower.startsWith("postgres://") || lower.startsWith("postgresql://"))
      Right(PostgreSQL)
    else if (lower.startsWith("mongodb://") || lower.startsWith("mongodb+srv://"))
      Right(MongoDB)
    else if (lower.startsWith("mysql://") || lower.startsWith("mariadb://"))
      Right(MySQL)
    else if (lower.startsWith("sqlite://"))
      Right(SQLite)
    else if (lower.endsWith(".db") || lower.endsWith(".sqlite") || lower.endsWith(".sqlite3"))
      Right(SQLite)
    else
      Left(s"cannot detect source type from: $url")
  }
}
