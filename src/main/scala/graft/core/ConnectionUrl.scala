package graft.core

/** Connection-URL parsing, password stripping, and the source≠target
  * data-loss guard — reference `src/utils.rs:656+` (parse), `:724+`
  * (redact), `validate_source_target_different` (`src/utils.rs:602-640`).
  */
final case class ConnectionUrl(
    scheme: String,
    user: Option[String],
    password: Option[String],
    host: String,
    port: Option[Int],
    database: Option[String]
) {
  /** URL with the password replaced — safe for logs/errors (the
    * reference's credential-leak tests demand this). */
  def redacted: String = {
    val auth = user.map(u => u + password.map(_ => ":***").getOrElse("") + "@").getOrElse("")
    val p = port.map(":" + _).getOrElse("")
    val db = database.map("/" + _).getOrElse("")
    s"$scheme://$auth$host$p$db"
  }

  /** Identity for the ≠-guard: host+port+database+user
    * (`src/utils.rs:602-640`). */
  def endpointKey: (String, Int, String, String) =
    (host.toLowerCase, port.getOrElse(ConnectionUrl.defaultPort(scheme)),
      database.getOrElse(""), user.getOrElse(""))
}

object ConnectionUrl {

  def defaultPort(scheme: String): Int = scheme match {
    case "postgresql" | "postgres" => 5432
    case "mysql" | "mariadb"       => 3306
    case "mongodb"                 => 27017
    case _                         => 0
  }

  private val re =
    "^([a-z+]+)://(?:([^:@/]+)(?::([^@/]*))?@)?([^:/?#]+)(?::(\\d+))?(?:/([^?#]*))?(?:[?#].*)?$".r

  def parse(url: String): Either[String, ConnectionUrl] = url match {
    case re(scheme, user, password, host, port, db) =>
      Right(ConnectionUrl(
        scheme, Option(user), Option(password), host,
        Option(port).map(_.toInt),
        Option(db).filter(_.nonEmpty)))
    case _ => Left(s"cannot parse connection url")
  }

  /** Abort if source and target resolve to the same endpoint — replicating
    * a database onto itself is the reference's hardest data-loss guard. */
  def validateSourceTargetDifferent(source: String, target: String): Either[String, Unit] =
    for {
      s <- parse(source)
      t <- parse(target)
      _ <- if (s.endpointKey == t.endpointKey)
             Left(s"source and target are the same endpoint: ${s.redacted}")
           else Right(())
    } yield ()
}
