package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}
import java.security.MessageDigest

/** Job-level checkpoint/resume for multi-table snapshot jobs — reference
  * `src/checkpoint.rs:14-46` (metadata: hashes of source, target, filter
  * config + completed set) and `:86-104` (atomic save via temp file +
  * rename). A checkpoint is only resumable when every identity hash
  * matches — a changed filter or endpoint invalidates it
  * (`checkpoint.rs:118-143`).
  *
  * The JSON is written and parsed here without a JSON library. Hash
  * values are hex digests (escape-free by construction); table names get
  * full JSON string escaping, so legal quoted PostgreSQL identifiers —
  * commas, brackets, quotes, backslashes — checkpoint and resume intact.
  */
final case class Checkpoint(
    sourceHash: String,
    targetHash: String,
    filterHash: String,
    completed: Set[String]
) {

  def isCompatibleWith(sourceHash: String, targetHash: String, filterHash: String): Boolean =
    this.sourceHash == sourceHash && this.targetHash == targetHash &&
      this.filterHash == filterHash

  def markCompleted(table: String): Checkpoint =
    copy(completed = completed + table)

  def toJson: String = {
    val done = completed.toSeq.sorted
      .map(n => "\"" + Checkpoint.escapeJsonString(n) + "\"").mkString("[", ",", "]")
    s"""{"source_hash":"$sourceHash","target_hash":"$targetHash","filter_hash":"$filterHash","completed":$done}"""
  }

  /** Atomic persist: write a temp file in the same directory, then
    * ATOMIC_MOVE over the destination (`checkpoint.rs:86-104`). */
  def save(path: Path): Unit = {
    Files.createDirectories(path.toAbsolutePath.getParent)
    val tmp = path.toAbsolutePath.getParent.resolve(path.getFileName.toString + ".tmp")
    Files.write(tmp, toJson.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

object Checkpoint {

  /** Minimal JSON string escaping: backslash, quote, and control chars —
    * everything RFC 8259 requires, nothing more. */
  private[core] def escapeJsonString(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case c if c < ' '  => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.toString
  }

  /** Inverse of [[escapeJsonString]] (handles the full \\uXXXX form too,
    * so checkpoints hand-edited by other tools still parse). */
  private[core] def unescapeJsonString(s: String): Either[String, String] = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' =>
          if (i + 1 >= s.length) return Left("dangling escape")
          s.charAt(i + 1) match {
            case '"'  => b.append('"'); i += 2
            case '\\' => b.append('\\'); i += 2
            case '/'  => b.append('/'); i += 2
            case 'n'  => b.append('\n'); i += 2
            case 't'  => b.append('\t'); i += 2
            case 'r'  => b.append('\r'); i += 2
            case 'b'  => b.append('\b'); i += 2
            case 'f'  => b.append('\f'); i += 2
            case 'u' =>
              if (i + 6 > s.length) return Left("truncated \\u escape")
              try { b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6 }
              catch { case _: NumberFormatException => return Left("bad \\u escape") }
            case other => return Left(s"unknown escape '\\$other'")
          }
        case c => b.append(c); i += 1
      }
    }
    Right(b.toString)
  }

  /** Parse a JSON array of strings starting at `s(from) == '['`; returns
    * the items and the index just past the closing ']'. Escape-aware —
    * a ']' or ',' inside a quoted name cannot terminate the array. */
  private def parseStringArray(s: String, from: Int): Either[String, (Seq[String], Int)] = {
    if (from >= s.length || s.charAt(from) != '[') return Left("expected '['")
    val items = Seq.newBuilder[String]
    var i = from + 1
    while (i < s.length) {
      s.charAt(i) match {
        case c if c.isWhitespace || c == ',' => i += 1
        case ']' => return Right((items.result(), i + 1))
        case '"' =>
          var j = i + 1
          while (j < s.length && s.charAt(j) != '"') {
            if (s.charAt(j) == '\\') j += 2 else j += 1
          }
          if (j >= s.length) return Left("unterminated string")
          unescapeJsonString(s.substring(i + 1, j)) match {
            case Left(err) => return Left(err)
            case Right(v)  => items += v
          }
          i = j + 1
        case other => return Left(s"unexpected '$other' in array")
      }
    }
    Left("unterminated array")
  }

  /** SHA-256 of an endpoint string — the identity hash for source/target
    * (`checkpoint.rs:156-163`). Credentials are stripped first when the
    * string parses as a URL, so checkpoints don't embed secrets. */
  def endpointHash(endpoint: String): String = {
    val canonical = ConnectionUrl.parse(endpoint).map(_.redacted).getOrElse(endpoint)
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(canonical.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
  }

  def fresh(source: String, target: String, filter: ReplicationFilter,
            rules: TableRules): Checkpoint =
    Checkpoint(endpointHash(source), endpointHash(target),
      filter.fingerprintWith(rules), Set.empty)

  private val headerRe =
    ("""\{"source_hash":"([0-9a-f]+)","target_hash":"([0-9a-f]+)",""" +
      """"filter_hash":"([0-9a-f]+)","completed":""").r

  def fromJson(json: String): Either[String, Checkpoint] = {
    val trimmed = json.trim
    headerRe.findPrefixMatchOf(trimmed) match {
      case Some(m) =>
        parseStringArray(trimmed, m.end).flatMap { case (tables, after) =>
          if (trimmed.substring(after).trim == "}")
            Right(Checkpoint(m.group(1), m.group(2), m.group(3), tables.toSet))
          else Left("trailing content after completed array")
        }
      case None => Left("unparseable checkpoint json")
    }
  }

  def load(path: Path): Option[Checkpoint] =
    if (Files.exists(path))
      fromJson(new String(Files.readAllBytes(path), StandardCharsets.UTF_8)).toOption
    else None

  /** Load-or-fresh with identity validation: an incompatible checkpoint
    * (different source/target/filter) is discarded, not resumed. */
  def resume(path: Path, source: String, target: String,
             filter: ReplicationFilter, rules: TableRules): Checkpoint = {
    val want = fresh(source, target, filter, rules)
    load(path) match {
      case Some(cp) if cp.isCompatibleWith(want.sourceHash, want.targetHash, want.filterHash) => cp
      case _ => want
    }
  }
}
