package graft.sinks

import java.nio.file.{Files, Path => JPath}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The pluggable commit lock: the conditional-put protocol must give the
  * same one-winner-per-slot / zero-lost-batch guarantees the FS-native
  * primitives give — that is what makes the store safely multi-writer on
  * a pure object store (where rename is copy+delete and hard links don't
  * exist). */
class CommitLockSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private def tmp(prefix: String): JPath = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }
  private def hfs(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }
  private def kv(rows: Seq[(Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "cursor", "v")
  }

  test("default lock resolution is FsNative; prefix registration routes and unregisters") {
    val (fs, _) = hfs(tmp("cl-route").toString)
    val dest = new Path(tmp("cl-route").resolve("t").toString, "_m.json")
    assert(CommitLock.forTarget(fs, dest) == CommitLock.FsNative)
    val lock = new CommitLock.ConditionalPut(new CommitLock.InMemoryRegister)
    val prefix = fs.makeQualified(dest.getParent).toUri.toString
    CommitLock.register(prefix, lock)
    try assert(CommitLock.forTarget(fs, dest) eq lock)
    finally CommitLock.unregister(prefix)
    assert(CommitLock.forTarget(fs, dest) == CommitLock.FsNative)
    // longest prefix wins
    val broad = new CommitLock.ConditionalPut(new CommitLock.InMemoryRegister)
    CommitLock.register("file:/", broad)
    CommitLock.register(prefix, lock)
    try assert(CommitLock.forTarget(fs, dest) eq lock)
    finally { CommitLock.unregister("file:/"); CommitLock.unregister(prefix) }
  }

  test("ConditionalPut: a loser never touches the slot — no bytes move before arbitration") {
    val root = tmp("cl-loser").resolve("t").toString
    val (fs, rootPath) = hfs(root)
    fs.mkdirs(rootPath)
    val register = new CommitLock.InMemoryRegister
    val lock = new CommitLock.ConditionalPut(register)
    val dest = new Path(rootPath, "_slot.json")
    // pre-claim the slot: every subsequent publish must lose WITHOUT
    // creating or replacing dest (on an object store a loser's copy+delete
    // "rename" would tear the winner's object — arbitration must come first)
    assert(register.putIfAbsent(fs.makeQualified(dest).toUri.toString))
    val t = new Path(rootPath, "_tmp_1")
    val out = fs.create(t, true)
    try out.write("loser".getBytes("UTF-8")) finally out.close()
    assert(!lock.publish(fs, t, dest))
    assert(!fs.exists(dest), "loser materialized bytes in a slot it did not own")
    assert(fs.exists(t), "loser consumed its tmp despite losing")
  }

  test("ConditionalPut: 16 racers to one slot — exactly one wins, content is the winner's") {
    val root = tmp("cl-race").resolve("t").toString
    val (fs, rootPath) = hfs(root)
    fs.mkdirs(rootPath)
    val lock = new CommitLock.ConditionalPut(new CommitLock.InMemoryRegister)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(16)
    try {
      for (round <- 1 to 20) {
        val dest = new Path(rootPath, s"_slot_$round.json")
        val start = new CountDownLatch(1)
        val wins = new java.util.concurrent.atomic.AtomicInteger(0)
        val winners = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
        val tasks = (1 to 16).map { w =>
          pool.submit(new Runnable {
            def run(): Unit = {
              val t = new Path(rootPath, s"_tmp_${round}_$w")
              val out = fs.create(t, true)
              try out.write(s"writer-$w".getBytes("UTF-8")) finally out.close()
              start.await(30, TimeUnit.SECONDS)
              if (lock.publish(fs, t, dest)) {
                wins.incrementAndGet(); winners.add(w); ()
              } else fs.delete(t, false)
            }
          })
        }
        start.countDown()
        tasks.foreach(_.get(60, TimeUnit.SECONDS))
        assert(wins.get() == 1, s"round $round: ${wins.get()} writers won the same slot")
        val in = fs.open(dest)
        val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        val w = winners.iterator().next()
        assert(got == s"writer-$w",
          s"round $round: slot holds '$got' but writer $w won")
      }
    } finally pool.shutdownNow()
  }

  test("ConditionalPut releases its claim when the move lands nothing — the slot stays winnable") {
    // The liveness hole a parked claim opens: writer wins arbitration but
    // its tmp is gone (a concurrent gc reaped it as debris) — the move
    // returns false. Without a release, version N stays claimed forever
    // and every replay of base+1 loses arbitration: the target is
    // permanently unwritable. With it, the replay (or any other writer)
    // claims the freed slot and commits.
    val root = tmp("cl-park").resolve("t").toString
    val (fs, rootPath) = hfs(root)
    fs.mkdirs(rootPath)
    val register = new CommitLock.InMemoryRegister
    val lock = new CommitLock.ConditionalPut(register)
    val dest = new Path(rootPath, "_slot.json")
    val key = fs.makeQualified(dest).toUri.toString
    val t = new Path(rootPath, "_tmp_reaped")
    val out = fs.create(t, true)
    try out.write("victim".getBytes("UTF-8")) finally out.close()
    fs.delete(t, false) // the gc-reaped-my-tmp scenario
    intercept[java.io.IOException] { lock.publish(fs, t, dest) }
    assert(!register.contains(key), "failed move left the slot claimed — parked forever")
    // the replay wins the same slot with a fresh tmp
    val t2 = new Path(rootPath, "_tmp_replay")
    val out2 = fs.create(t2, true)
    try out2.write("replay".getBytes("UTF-8")) finally out2.close()
    assert(lock.publish(fs, t2, dest))
    assert(fs.exists(dest))
  }

  // ---- leased protocol (round-5 verdict #2) -----------------------------

  test("FileTtlRegister: leases expire, generations fence, tombstones never reuse") {
    var now = 0L
    val reg = new CommitLock.FileTtlRegister(tmp("ttl-reg"), 1000, () => now)
    val key = "file:/t/_m_v1.json"
    // A claims and (simulated) crashes
    assert(reg.claim(key).contains(1L))
    // lease live: nobody else gets in
    assert(reg.claim(key).isEmpty)
    now = 999; assert(reg.claim(key).isEmpty)
    // lease expired: B usurps with a STRICTLY HIGHER generation
    now = 1001
    assert(reg.claim(key).contains(2L))
    // B commits; A's late commit is fenced off; B's re-commit is idempotent
    assert(reg.commit(key, 2L))
    assert(!reg.commit(key, 1L), "a stale generation committed past its usurper")
    assert(reg.commit(key, 2L))
    assert(reg.committedGen(key).contains(2L))
    // committed key admits no further claims, however stale the leases
    now = 100000
    assert(reg.claim(key).isEmpty)
    // released generations are tombstoned, never reused
    val key2 = "file:/t/_m_v2.json"
    assert(reg.claim(key2).contains(1L))
    reg.release(key2, 1L)
    assert(reg.claim(key2).contains(2L), "a released generation number was reused")
    // reclaim of a committed key drops all state (gc integration)
    reg.reclaimCommitted(key)
    assert(reg.committedGen(key).isEmpty)
    assert(reg.claim(key).contains(1L), "reclaimed key should start fresh")
  }

  test("FileTtlRegister: concurrent usurpers of an expired lease — exactly one per round wins") {
    var now = 0L
    val reg = new CommitLock.FileTtlRegister(tmp("ttl-race"), 1000, () => now)
    val key = "file:/t/_m_race.json"
    assert(reg.claim(key).contains(1L)) // crashed original winner
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(16)
    try {
      for (round <- 1 to 10) {
        now += 2000 // expire the previous round's claim
        val start = new CountDownLatch(1)
        val claimed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
        val tasks = (1 to 16).map { _ =>
          pool.submit(new Runnable {
            def run(): Unit = {
              start.await(30, TimeUnit.SECONDS)
              reg.claim(key).foreach { g => claimed.add(g); () }
            }
          })
        }
        start.countDown()
        tasks.foreach(_.get(60, TimeUnit.SECONDS))
        assert(claimed.size == 1,
          s"round $round: ${claimed.size} usurpers won generations $claimed")
        assert(claimed.peek() == round + 1L, "generations must be strictly increasing")
      }
    } finally pool.shutdownNow()
  }

  test("LeasedConditionalPut: a crashed winner's slot is retaken after its lease expires") {
    val root = tmp("lease-crash").resolve("t").toString
    val (fs, rootPath) = hfs(root)
    fs.mkdirs(rootPath)
    var now = 0L
    val reg = new CommitLock.FileTtlRegister(tmp("lease-crash-reg"), 1000, () => now)
    val lock = new CommitLock.LeasedConditionalPut(reg)
    val dest = new Path(rootPath, "_slot.json")
    val key = fs.makeQualified(dest).toUri.toString
    // the winner claims, then dies before staging anything
    assert(reg.claim(key).contains(1L))
    def tmpFile(name: String, content: String): Path = {
      val t = new Path(rootPath, name)
      val out = fs.create(t, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      t
    }
    // while the lease is live the slot is simply owned — publish loses
    val t1 = tmpFile("_tmp_b1", "writer-b")
    assert(!lock.publish(fs, t1, dest))
    assert(!fs.exists(dest), "loser materialized bytes while the lease was live")
    // lease expires: the same writer's replay takes the slot
    now = 2000
    assert(lock.publish(fs, t1, dest), "slot not retaken after lease expiry")
    val in = fs.open(dest)
    val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    assert(got == "writer-b")
  }

  test("LeasedConditionalPut: a slow usurped winner is fenced — committed state never torn") {
    val root = tmp("lease-fence").resolve("t").toString
    val (fs, rootPath) = hfs(root)
    fs.mkdirs(rootPath)
    var now = 0L
    val reg = new CommitLock.FileTtlRegister(tmp("lease-fence-reg"), 1000, () => now)
    val lock = new CommitLock.LeasedConditionalPut(reg)
    val dest = new Path(rootPath, "_slot.json")
    val key = fs.makeQualified(dest).toUri.toString
    def tmpFile(name: String, content: String): Path = {
      val t = new Path(rootPath, name)
      val out = fs.create(t, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      t
    }
    // slow winner A: claims gen 1 and stages its bytes (the publish
    // protocol's first two steps), then stalls past its lease
    assert(reg.claim(key).contains(1L))
    val stagingA = new Path(rootPath, s"_graft_staging_${dest.getName}.g1")
    assert(fs.rename(tmpFile("_tmp_a", "slow-winner-a"), stagingA))
    now = 2000
    // B usurps and commits fully through the real publish path
    assert(lock.publish(fs, tmpFile("_tmp_b", "usurper-b"), dest))
    def destContent(): String = {
      val in = fs.open(dest)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    assert(destContent() == "usurper-b")
    // A wakes and resumes its protocol: the commit MUST be fenced off,
    // and nothing A does may touch the committed bytes
    assert(!reg.commit(key, 1L), "stale generation committed over its usurper")
    assert(fs.delete(stagingA, false)) // A's cleanup of its own debris
    assert(destContent() == "usurper-b", "slow winner tore the committed state")
    // and a third writer simply loses without touching the slot
    assert(!lock.publish(fs, tmpFile("_tmp_c", "late-c"), dest))
    assert(destContent() == "usurper-b")
  }

  test("LeasedConditionalPut: crash between commit and final move rolls forward") {
    val root = tmp("lease-roll").resolve("t").toString
    val (fs, rootPath) = hfs(root)
    fs.mkdirs(rootPath)
    var now = 0L
    val reg = new CommitLock.FileTtlRegister(tmp("lease-roll-reg"), 1000, () => now)
    val lock = new CommitLock.LeasedConditionalPut(reg)
    val dest = new Path(rootPath, "_slot.json")
    val key = fs.makeQualified(dest).toUri.toString
    def tmpFile(name: String, content: String): Path = {
      val t = new Path(rootPath, name)
      val out = fs.create(t, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      t
    }
    // winner A: claim, stage, COMMIT — then dies before the final move
    assert(reg.claim(key).contains(1L))
    val stagingA = new Path(rootPath, s"_graft_staging_${dest.getName}.g1")
    assert(fs.rename(tmpFile("_tmp_a", "committed-a"), stagingA))
    assert(reg.commit(key, 1L))
    assert(!fs.exists(dest))
    // B's attempt (even with A's lease long expired) must NOT win — the
    // slot is committed — and must complete A's move before reporting loss
    now = 100000
    assert(!lock.publish(fs, tmpFile("_tmp_b", "late-b"), dest))
    assert(fs.exists(dest), "committed-but-unmoved slot was not rolled forward")
    val in = fs.open(dest)
    val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    assert(got == "committed-a", "roll-forward materialized the wrong bytes")
  }

  test("four concurrent writers per round never lose a batch under LeasedConditionalPut") {
    // the merge-level multi-writer race, routed through the LEASED lock:
    // the full store protocol must hold when the exclusive primitive is a
    // lease claim + fenced commit (real clock, generous TTL — no expiry
    // should trigger here, this is the happy-path contention regime)
    val dir = tmp("lease-merge-race").resolve("t").toString
    val (fs, rootPath) = hfs(dir)
    val prefix = fs.makeQualified(rootPath).toUri.toString
    CommitLock.register(prefix, new CommitLock.LeasedConditionalPut(
      new CommitLock.FileTtlRegister(tmp("lease-merge-reg"), 60000)))
    try {
      BucketedMergeTarget.merge(kv(Seq((0L, 1L, "seed"))), dir, Seq("id"), "cursor", 8)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      def mergeWithReplay(id: Long): Unit = {
        var attempts = 0
        var done = false
        while (!done) {
          attempts += 1
          try {
            BucketedMergeTarget.merge(kv(Seq((id, 2L, s"w$id"))), dir, Seq("id"), "cursor", 8)
            done = true
          } catch { case _: java.io.IOException if attempts < 50 => () }
        }
      }
      val ids = for (w <- 1 to 4) yield 10L + w
      import scala.concurrent.{Await => A2}
      A2.result(Future.sequence(ids.map(id => Future(mergeWithReplay(id)))), 600.seconds)
      val got = BucketedMergeTarget.read(spark, dir)
        .filter(col("id") > 0L).select("id").collect().map(_.getLong(0)).toSet
      assert(got == ids.toSet, s"lost batches: ${ids.toSet -- got}")
      assert(BucketedMergeTarget.currentManifest(spark, dir).get.version == 5L)
    } finally CommitLock.unregister(prefix)
  }

  test("four concurrent writers per round never lose a batch under ConditionalPut") {
    // The merge-level race from MergeTargetSpec, rerun with the target
    // routed through the conditional-put lock: the whole store protocol
    // (strict base+1 versions, replay-on-loss) must hold when the
    // exclusive primitive is a register claim instead of a link/rename.
    val dir = tmp("cl-merge-race").resolve("t").toString
    val (fs, rootPath) = hfs(dir)
    val prefix = fs.makeQualified(rootPath).toUri.toString
    CommitLock.register(prefix, new CommitLock.ConditionalPut(new CommitLock.InMemoryRegister))
    try {
      BucketedMergeTarget.merge(kv(Seq((0L, 1L, "seed"))), dir, Seq("id"), "cursor", 8)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      def mergeWithReplay(id: Long): Unit = {
        var attempts = 0
        var done = false
        while (!done) {
          attempts += 1
          try {
            BucketedMergeTarget.merge(kv(Seq((id, 2L, s"w$id"))), dir, Seq("id"), "cursor", 8)
            done = true
          } catch { case _: java.io.IOException if attempts < 50 => () }
        }
      }
      val ids = for (round <- 1 to 3; w <- 1 to 4) yield round * 10L + w
      for (round <- 1 to 3) {
        val batch = ids.filter(_ / 10 == round)
        Await.result(Future.sequence(batch.map(id => Future(mergeWithReplay(id)))), 600.seconds)
      }
      val got = BucketedMergeTarget.read(spark, dir)
        .filter(col("id") > 0L).select("id").collect().map(_.getLong(0)).toSet
      assert(got == ids.toSet, s"lost batches: ${ids.toSet -- got}")
      assert(BucketedMergeTarget.currentManifest(spark, dir).get.version == 13L)
    } finally CommitLock.unregister(prefix)
  }
}
