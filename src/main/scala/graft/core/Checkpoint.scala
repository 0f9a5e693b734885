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
  * The JSON is written and parsed here without a JSON library (values
  * are hex digests and validated table identifiers — no escaping needed
  * beyond rejecting quotes).
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

  def markCompleted(table: String): Checkpoint = {
    require(Checkpoint.jsonSafe(table),
      s"table name not checkpoint-safe (quote/comma/bracket): $table")
    copy(completed = completed + table)
  }

  def toJson: String = {
    // fromJson splits the completed array on ',' — a name containing a
    // comma (or bracket/quote) would round-trip into bogus entries and
    // silently mark never-copied tables completed on resume
    require(completed.forall(Checkpoint.jsonSafe),
      "table names must not contain quotes, commas, or brackets")
    val done = completed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
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

  /** Safe to embed in the hand-rolled completed-array JSON. */
  private[core] def jsonSafe(name: String): Boolean =
    !name.exists(c => c == '"' || c == ',' || c == '[' || c == ']')

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

  private val jsonRe =
    ("""\{"source_hash":"([0-9a-f]+)","target_hash":"([0-9a-f]+)",""" +
      """"filter_hash":"([0-9a-f]+)","completed":\[([^\]]*)\]\}""").r

  def fromJson(json: String): Either[String, Checkpoint] = json.trim match {
    case jsonRe(s, t, f, done) =>
      val tables = done.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSet
      Right(Checkpoint(s, t, f, tables))
    case _ => Left("unparseable checkpoint json")
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
