package graft.sinks

import java.sql.Connection
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.{MockJdbc, SparkTestSession}

/** K2 COPY bulk load: escaping byte-for-byte vs `escape_copy_text`
  * (`src/jsonb/writer.rs:174-186`), the exact COPY command, and the
  * executor path against a recording CopyApi (no live PG in the sandbox). */
class CopyLoaderSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  test("escapeCopyText matches escape_copy_text byte-for-byte") {
    import CopyLoader.escapeCopyText
    assert(escapeCopyText("plain") == "plain")
    assert(escapeCopyText("a\\b") == "a\\\\b")
    assert(escapeCopyText("a\tb") == "a\\tb")
    assert(escapeCopyText("a\nb") == "a\\nb")
    assert(escapeCopyText("a\rb") == "a\\rb")
    // all four in one value, in order
    assert(escapeCopyText("\\\t\n\r") == "\\\\\\t\\n\\r")
    // the reference escapes ONLY those four — other controls/unicode pass
    assert(escapeCopyText("abé✓") == "abé✓")
    assert(escapeCopyText("") == "")
    // JSON payloads: embedded \" stays; the backslash doubles
    assert(escapeCopyText("""{"k":"a\"b"}""") == """{"k":"a\\"b"}""")
  }

  test("copySql is the reference's COPY command (writer.rs:252-255)") {
    assert(CopyLoader.copySql("users") ==
      """COPY "users" (id, data, _source_type) FROM STDIN WITH (FORMAT text)""")
  }

  test("formatRow is id\\tdata\\tsource\\n with per-field escaping") {
    assert(CopyLoader.formatRow("1", """{"a":1}""", "sqlite") ==
      "1\t{\"a\":1}\tsqlite\n")
    assert(CopyLoader.formatRow("k\t1", "line1\nline2", "mysql") ==
      "k\\t1\tline1\\nline2\tmysql\n")
  }

  test("copyJsonbModel streams escaped chunks through one COPY per partition") {
    val key = "copy-exec"
    MockJdbc.reset(key)
    RecordingCopy.reset(key)
    val s = spark
    import s.implicits._
    val df = Seq(
      ("1", """{"name":"Alice"}""", "sqlite"),
      ("2", """{"note":"tab\there"}""", "sqlite"),
      ("3", """{"n":3}""", "sqlite"))
      .toDF("id", "data", "_source_type")
      .repartition(2)

    CopyLoader.copyJsonbModel(df, "docs", MockJdbc.factory(key),
      api = new RecordingCopy(key))

    val calls = RecordingCopy.calls(key)
    // one COPY stream per non-empty partition, all with the pinned SQL
    assert(calls.nonEmpty && calls.size <= 2)
    assert(calls.forall(_._1 ==
      """COPY "docs" (id, data, _source_type) FROM STDIN WITH (FORMAT text)"""))
    // decoded frames reassemble to exactly the three escaped rows
    val lines = calls.map(_._2).mkString.split("\n").filter(_.nonEmpty).toSet
    assert(lines == Set(
      "1\t{\"name\":\"Alice\"}\tsqlite",
      "2\t{\"note\":\"tab\\\\there\"}\tsqlite", // the JSON's literal backslash doubles
      "3\t{\"n\":3}\tsqlite"))
  }

  test("invalid table names are rejected before any connection opens") {
    val key = "copy-invalid"
    MockJdbc.reset(key)
    val s = spark
    import s.implicits._
    val df = Seq(("1", "{}", "sqlite")).toDF("id", "data", "_source_type")
    intercept[IllegalArgumentException] {
      CopyLoader.copyJsonbModel(df, "bad;name", MockJdbc.factory(key),
        api = new RecordingCopy(key))
    }
    assert(MockJdbc.connectionsOpened(key) == 0)
  }
}

/** Recording CopyApi — JVM-static state keyed by test name (same channel
  * MockJdbc uses: foreachPartition closures are serialized copies even in
  * local mode). */
object RecordingCopy {
  private val calls_ = new ConcurrentHashMap[String, java.util.List[(String, String)]]()
  def reset(key: String): Unit = {
    calls_.put(key, java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, String)]()))
    ()
  }
  def calls(key: String): List[(String, String)] =
    Option(calls_.get(key)).map(_.asScala.toList).getOrElse(Nil)
  private[sinks] def record(key: String, sql: String, data: String): Unit = {
    calls_.computeIfAbsent(key, _ => java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, String)]())).add((sql, data))
    ()
  }
}

final class RecordingCopy(key: String) extends CopyLoader.CopyApi {
  def copyIn(conn: Connection, sql: String, chunks: Iterator[Array[Byte]]): Long = {
    val data = chunks.map(new String(_, "UTF-8")).mkString
    RecordingCopy.record(key, sql, data)
    data.count(_ == '\n').toLong
  }
}
