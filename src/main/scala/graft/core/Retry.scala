package graft.core

/** Generic retry with exponential backoff — reference `retry_with_backoff`
  * (`src/utils.rs:197-278`). Spark's own task retry covers distributed
  * work; this is for driver-side JDBC admin operations (DDL, catalog
  * queries, connection establishment) where the reference retries too.
  */
object Retry {

  /** Run `f`, retrying up to `maxRetries` times on exceptions accepted by
    * `retryable`, sleeping baseDelayMs·2^attempt between attempts. */
  def withBackoff[T](maxRetries: Int = 3, baseDelayMs: Long = 100,
                     retryable: Throwable => Boolean = defaultRetryable,
                     sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= maxRetries) {
      try return f
      catch {
        case e: Throwable if retryable(e) && attempt < maxRetries =>
          last = e
          sleep(baseDelayMs * (1L << attempt))
          attempt += 1
        case e: Throwable => throw e
      }
    }
    throw last
  }

  /** Transient-looking errors only: connection/timeout/IO classes —
    * the reference's retryable set (`utils.rs:233-259`); constraint
    * violations and syntax errors must NOT retry. */
  def defaultRetryable(e: Throwable): Boolean = e match {
    case _: java.net.SocketException | _: java.net.SocketTimeoutException |
        _: java.io.IOException => true
    case sql: java.sql.SQLException =>
      val state = Option(sql.getSQLState).getOrElse("")
      // 08xxx = connection exception class, 57P0x = shutdown/crash
      state.startsWith("08") || state.startsWith("57P")
    case _ => false
  }
}
