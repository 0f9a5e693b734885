package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, SQLException}
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Recording java.sql.Connection for executor tests (no live database in
  * the sandbox — the round-1 verdict prescribes exactly this: "test
  * against a mock java.sql.Connection recording statements").
  *
  * Implemented with reflection proxies so the huge JDBC interfaces need
  * no hand-stubbing. State lives in JVM-static maps keyed by test name:
  * Spark serializes foreachPartition closures even in local mode, so an
  * instance captured in the closure would be a copy — statics are the
  * only channel back to the driver (single-JVM tests only, which is what
  * local[n] is).
  */
object MockJdbc {

  /** One executed statement: SQL text + 1-based bound parameters (empty
    * for plain Statement.execute). */
  final case class Exec(sql: String, params: Map[Int, Any])

  private val log = new ConcurrentHashMap[String, java.util.List[Exec]]()
  private val queryHandlers = new ConcurrentHashMap[String, String => Seq[Seq[Any]]]()
  // values that make executeUpdate throw (halve-on-error tests)
  private val poisons = new ConcurrentHashMap[String, Any]()
  private val opened = new ConcurrentHashMap[String, java.lang.Integer]()

  def reset(key: String): Unit = {
    log.put(key, java.util.Collections.synchronizedList(new java.util.ArrayList[Exec]()))
    queryHandlers.remove(key)
    poisons.remove(key)
    poisonErrors.remove(key)
    opened.put(key, 0)
  }

  def recorded(key: String): List[Exec] =
    Option(log.get(key)).map(_.asScala.toList).getOrElse(Nil)

  def setQueryHandler(key: String, h: String => Seq[Seq[Any]]): Unit =
    queryHandlers.put(key, h)

  /** Any bound param == value → executeUpdate throws SQLException. */
  def setPoison(key: String, value: Any): Unit = poisons.put(key, value)

  /** SQLSTATE + message for the poison throw (default: the value-too-
    * large class the split path retries on). */
  def setPoisonError(key: String, message: String, sqlState: String): Unit = {
    poisonErrors.put(key, (message, sqlState)); ()
  }
  private val poisonErrors = new ConcurrentHashMap[String, (String, String)]()
  private def poisonError(key: String): (String, String) =
    poisonErrors.getOrDefault(key, ("value too large (poison)", "22001"))

  def connectionsOpened(key: String): Int = opened.getOrDefault(key, 0)

  private def record(key: String, e: Exec): Unit = {
    log.computeIfAbsent(key,
      _ => java.util.Collections.synchronizedList(new java.util.ArrayList[Exec]()))
      .add(e)
    ()
  }

  /** Serializable factory usable from foreachPartition closures. */
  def factory(key: String): () => Connection = {
    val k = key // capture only the string
    () => MockJdbc.connection(k)
  }

  def connection(key: String): Connection = {
    opened.merge(key, 1, (a, b) => a + b)
    newProxy[Connection] { (method, args) =>
      method.getName match {
        case "prepareStatement" => prepared(key, args(0).asInstanceOf[String])
        case "createStatement"  => statement(key)
        case "close" | "commit" | "setAutoCommit" => null
        case "isClosed"         => java.lang.Boolean.FALSE
        case "toString"         => s"MockConnection($key)"
        case "hashCode"         => Integer.valueOf(System.identityHashCode(this))
        case "equals"           => java.lang.Boolean.FALSE
        case n => throw new UnsupportedOperationException(s"mock Connection.$n")
      }
    }
  }

  private def prepared(key: String, sql: String): java.sql.PreparedStatement = {
    val params = mutable.Map.empty[Int, Any]
    newProxy[java.sql.PreparedStatement] { (method, args) =>
      method.getName match {
        case "setObject" | "setString" =>
          params(args(0).asInstanceOf[Integer].intValue()) = args(1); null
        case "setNull" =>
          params(args(0).asInstanceOf[Integer].intValue()) = null; null
        case "executeUpdate" | "execute" =>
          Option(poisons.get(key)).foreach { p =>
            if (params.values.exists(v => v == p)) {
              val (msg, state) = poisonError(key)
              throw new SQLException(msg, state)
            }
          }
          record(key, Exec(sql, params.toMap))
          params.clear()
          Integer.valueOf(1)
        case "executeQuery" =>
          record(key, Exec(sql, params.toMap))
          resultSet(rowsFor(key, sql))
        case "close" | "clearParameters" => null
        case "toString" => s"MockPreparedStatement($sql)"
        case n => throw new UnsupportedOperationException(s"mock PreparedStatement.$n")
      }
    }
  }

  private def statement(key: String): java.sql.Statement =
    newProxy[java.sql.Statement] { (method, args) =>
      method.getName match {
        case "execute" =>
          record(key, Exec(args(0).asInstanceOf[String], Map.empty))
          java.lang.Boolean.TRUE
        case "executeUpdate" =>
          record(key, Exec(args(0).asInstanceOf[String], Map.empty))
          Integer.valueOf(1)
        case "executeQuery" =>
          val sql = args(0).asInstanceOf[String]
          record(key, Exec(sql, Map.empty))
          resultSet(rowsFor(key, sql))
        case "close" => null
        case "toString" => "MockStatement"
        case n => throw new UnsupportedOperationException(s"mock Statement.$n")
      }
    }

  private def rowsFor(key: String, sql: String): Seq[Seq[Any]] =
    Option(queryHandlers.get(key)).map(_(sql)).getOrElse(Seq.empty)

  private def resultSet(rows: Seq[Seq[Any]]): java.sql.ResultSet = {
    var idx = -1
    newProxy[java.sql.ResultSet] { (method, args) =>
      def cell(i: Int): Any = rows(idx)(i - 1)
      method.getName match {
        case "next" =>
          idx += 1
          java.lang.Boolean.valueOf(idx < rows.size)
        case "getString"  => Option(cell(args(0).asInstanceOf[Integer])).map(_.toString).orNull
        case "getLong"    => java.lang.Long.valueOf(cell(args(0).asInstanceOf[Integer]).toString)
        case "getInt"     => Integer.valueOf(cell(args(0).asInstanceOf[Integer]).toString)
        case "getBoolean" => java.lang.Boolean.valueOf(cell(args(0).asInstanceOf[Integer]).toString)
        case "close" | "wasNull" => java.lang.Boolean.FALSE
        case n => throw new UnsupportedOperationException(s"mock ResultSet.$n")
      }
    }
  }

  private def newProxy[T](handler: (Method, Array[AnyRef]) => AnyRef)(
      implicit ct: scala.reflect.ClassTag[T]): T = {
    val iface = ct.runtimeClass
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        override def invoke(proxy: AnyRef, method: Method, args: Array[AnyRef]): AnyRef =
          handler(method, if (args == null) Array.empty else args)
      }).asInstanceOf[T]
  }
}
