package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}

/** The exclusive-publish primitive behind every [[BucketedMergeTarget]]
  * commit — the one contended operation in the store's protocol.
  *
  * Contract: atomically make the bytes at `tmp` visible under `dest` IFF
  * `dest` does not already exist. Returns true when this writer won the
  * slot (tmp is consumed); false when a concurrent writer already owns it
  * (the caller replays its batch). A loser must never overwrite, tear, or
  * partially materialize `dest` — the committed state is always exactly
  * one winner's bytes.
  *
  * The reference gets this guarantee from PostgreSQL transaction atomicity
  * (`src/jsonb/writer.rs:230-322` — every batch lands inside one
  * transaction); a filesystem-backed target has to pick a primitive per
  * storage system:
  *
  *  - [[CommitLock.FsNative]] — HDFS atomic fail-if-exists rename / local
  *    `file://` hard-link. Free where those primitives exist.
  *  - [[CommitLock.ConditionalPut]] — the object-store protocol: a
  *    create-if-absent register arbitrates the slot, exactly the semantics
  *    of an S3 `PUT` with `If-None-Match: *` (supported natively since
  *    late 2024), a GCS `PUT` with `x-goog-if-generation-match: 0`, or a
  *    DynamoDB-style lock service (the shape Delta Lake's S3 multi-writer
  *    LogStore uses). Plugging a register backed by any of those makes the
  *    store safely multi-writer on a pure object store.
  */
trait CommitLock {
  def publish(f: FileSystem, tmp: Path, dest: Path): Boolean
}

object CommitLock {

  /** Filesystem-native exclusive publish.
    *
    *  - HDFS: `rename(tmp, dest)` is atomic at the NameNode and returns
    *    false when dest exists — rename IS the lock.
    *  - local `file://`: POSIX rename(2) silently REPLACES an existing
    *    destination (Hadoop's RawLocalFileSystem delegates to
    *    File.renameTo), so the lock is `Files.createLink(dest, tmp)` —
    *    link(2) fails EEXIST atomically — then the tmp is unlinked.
    */
  case object FsNative extends CommitLock {
    def publish(f: FileSystem, tmp: Path, dest: Path): Boolean =
      if (f.getScheme == "file") {
        val tmpFile = java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath)
        val destFile = java.nio.file.Paths.get(f.makeQualified(dest).toUri.getPath)
        try {
          java.nio.file.Files.createLink(destFile, tmpFile)
          f.delete(tmp, false)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          // FS mounted without hard-link support: fall back to rename and
          // accept its (weaker) local semantics rather than failing outright
          case _: UnsupportedOperationException => f.rename(tmp, dest)
        }
      } else f.rename(tmp, dest)
  }

  /** One atomic create-if-absent per key — the only primitive the
    * conditional-put protocol needs. Implementations map directly onto:
    * S3 `PUT If-None-Match: *` (the 412 response = false), GCS
    * `if-generation-match: 0`, DynamoDB `attribute_not_exists` put, or a
    * ZooKeeper ephemeral node. Keys are fully-qualified destination URIs,
    * so one register can arbitrate many targets. */
  trait PutIfAbsentRegister {
    /** True iff this call CREATED the key (won); false if it existed. */
    def putIfAbsent(key: String): Boolean

    /** Free a key this caller previously won — invoked ONLY when the
      * winner could not materialize the slot and KNOWS nothing landed
      * (its move returned false), so the version number must not stay
      * parked behind a claim that protects nothing. Maps onto a DynamoDB
      * conditional delete / ZooKeeper node delete; for a store whose
      * conditional PUT carries the manifest bytes themselves, a claimed
      * slot IS a committed state and this is never called. */
    def release(key: String): Unit
  }

  /** Single-JVM register for tests and local multi-writer runs: a
    * ConcurrentHashMap CAS stands in for the store's conditional write. */
  final class InMemoryRegister extends PutIfAbsentRegister {
    private val keys = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def putIfAbsent(key: String): Boolean = keys.add(key)
    def release(key: String): Unit = { keys.remove(key); () }
    def contains(key: String): Boolean = keys.contains(key)
  }

  /** Object-store-safe publish: the register's create-if-absent arbitrates
    * the slot BEFORE any bytes move, so on a store whose rename is
    * copy+delete (S3A, GCS connector) the losers never start a copy that
    * could tear or replace the winner's object. Only the single winner
    * materializes `dest`; its rename/copy is uncontended by construction.
    *
    * When the underlying store's PUT itself supports preconditions, the
    * register IS the store (putIfAbsent = the conditional PUT of the
    * manifest bytes) and the FS move below is the same operation — this
    * class then models the two-step lock-service deployment (DynamoDB /
    * ZooKeeper) where arbitration and byte movement are separate. */
  final class ConditionalPut(register: PutIfAbsentRegister) extends CommitLock {
    def publish(f: FileSystem, tmp: Path, dest: Path): Boolean = {
      val key = f.makeQualified(dest).toUri.toString
      if (!register.putIfAbsent(key)) false
      else {
        // winner: uncontended move into the slot we now own. A crash here
        // leaves the key claimed but dest absent — readers fall back to
        // the previous manifest (same torn-commit stance as FsNative).
        // Liveness after such a crash is the REGISTER's responsibility:
        // production registers must lease, not own, their claims (DynamoDB
        // item TTL / ZooKeeper ephemeral node / S3 conditional-PUT where
        // the claim IS the manifest bytes, so a claimed slot is already a
        // committed state) — otherwise a dead writer's claim parks its
        // version number forever.
        // a move can fail by returning false OR by throwing (a missing
        // tmp — e.g. reaped by a concurrent gc as debris — throws on the
        // local FS). Either way: if nothing landed at dest, RELEASE the
        // claim, or this version number stays parked behind a slot that
        // protects nothing and every replay of base+1 loses arbitration
        // forever. If dest DOES exist after a failed move (a torn
        // copy+delete on an object store), keep the claim — it is the
        // only thing preventing another writer overwriting the torn
        // object's slot; the register's lease frees it.
        val moved =
          try f.rename(tmp, dest)
          catch { case scala.util.control.NonFatal(_) => false }
        if (!moved) {
          if (!f.exists(dest)) register.release(key)
          throw new java.io.IOException(
            s"claimed commit slot $dest but could not move manifest into place — replay the batch")
        }
        true
      }
    }
  }

  // ---- per-target lock resolution ---------------------------------------

  /** Pluggable lock selection: longest matching registered path prefix
    * wins, else [[FsNative]]. Registration is deployment configuration
    * (e.g. route `s3a://bucket/...` targets through a ConditionalPut
    * backed by the store's conditional write) — the default preserves the
    * HDFS/local behavior unchanged. */
  @volatile private var overrides: List[(String, CommitLock)] = Nil

  def register(pathPrefix: String, lock: CommitLock): Unit = synchronized {
    overrides = (pathPrefix, lock) :: overrides.filterNot(_._1 == pathPrefix)
  }

  def unregister(pathPrefix: String): Unit = synchronized {
    overrides = overrides.filterNot(_._1 == pathPrefix)
  }

  /** The lock in force for a destination path. */
  def forTarget(f: FileSystem, dest: Path): CommitLock = {
    val qualified = f.makeQualified(dest).toUri.toString
    overrides.filter { case (prefix, _) => qualified.startsWith(prefix) }
      .sortBy(-_._1.length).headOption.map(_._2).getOrElse(FsNative)
  }
}
