package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sinks.BucketedMergeTarget

class IncrementalClusterSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private def tmp() = {
    val d = java.nio.file.Files.createTempDirectory("inc-cluster")
    (d.resolve("byId").toString, d.resolve("byRep").toString)
  }
  private def edges(pairs: (Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    pairs.toDF("id_a", "id_b")
  }
  private def stored(byId: String): Map[Long, Long] =
    IncrementalCluster.assignments(spark, byId)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  private def scratch(all: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges(all: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental updates equal from-scratch CC over the cumulative edge set") {
    val (byId, byRep) = tmp()
    val batches = Seq(
      Seq(1L -> 2L, 3L -> 4L, 10L -> 11L),
      Seq(2L -> 3L),                    // merges {1,2} with {3,4}
      Seq(20L -> 21L, 21L -> 22L),      // fresh chain
      Seq(4L -> 20L, 11L -> 12L),       // merges the big cluster with the chain
      Seq(1L -> 2L))                    // pure repeat — nothing changes
    var cumulative = Seq.empty[(Long, Long)]
    batches.zipWithIndex.foreach { case (b, i) =>
      IncrementalCluster.update(edges(b: _*), byId, byRep, batchId = i.toLong)
      cumulative = cumulative ++ b
      assert(stored(byId) == scratch(cumulative), s"diverged after batch $i")
    }
    // min-label invariant: the giant component is labeled by its min id
    assert(stored(byId)(22L) == 1L && stored(byId)(4L) == 1L)
    // byRep agrees: every member of cluster 1 is probeable under rep 1,
    // and no row lingers under a superseded rep
    val s = spark
    import s.implicits._
    val under1 = BucketedMergeTarget.readMatching(
      Seq(1L).toDF("rep"), byRep, Seq("rep"))
    assert(under1.select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 4L, 20L, 21L, 22L))
    val all = BucketedMergeTarget.read(s, byRep)
    assert(all.select("rep").distinct().collect().map(_.getLong(0)).toSet ==
      stored(byId).values.toSet)
  }

  test("a narrower-typed batch widens to the store's id type instead of missing buckets") {
    // ADVICE r5: bucket hashes are type-sensitive — an Int-typed batch
    // probing a Long-seeded store would hash the wrong buckets, silently
    // miss existing assignments, and fragment clusters. The update must
    // align the batch to the stored type up front.
    val (byId, byRep) = tmp()
    val s = spark
    import s.implicits._
    IncrementalCluster.update(edges(1L -> 2L), byId, byRep, batchId = 0L)
    // same logical keys, INT typed: 2 joins the existing {1,2} cluster
    IncrementalCluster.update(Seq((2, 3)).toDF("id_a", "id_b"), byId, byRep, batchId = 1L)
    assert(stored(byId) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      "narrower-typed batch fragmented the cluster (probed the wrong buckets)")
    // the store keeps its Long schema — the batch was widened, not the store narrowed
    val idType = BucketedMergeTarget.currentManifest(s, byId).get.schema("id").dataType
    assert(idType == org.apache.spark.sql.types.LongType)
    // the reverse (a WIDER batch against a narrow store) cannot be cast
    // safely and must fail loudly, not probe wrong buckets
    val (byId2, byRep2) = tmp()
    IncrementalCluster.update(Seq((1, 2)).toDF("id_a", "id_b"), byId2, byRep2, batchId = 0L)
    intercept[IllegalArgumentException] {
      IncrementalCluster.update(edges(2L -> 3L), byId2, byRep2, batchId = 1L)
    }
  }

  test("probes are bucket-pruned: a small batch reads a sliver of the stores") {
    val (byId, byRep) = tmp()
    // 200 two-node clusters
    val seed = (0L until 200L).map(i => (1000 + 2 * i) -> (1001 + 2 * i))
    IncrementalCluster.update(edges(seed: _*), byId, byRep, 0L)
    // one edge touching two of them
    val probe = BucketedMergeTarget.readMatching(
      { val s = spark; import s.implicits._; Seq(1000L, 1002L).toDF("id") },
      byId, Seq("id"))
    val filesRead = probe.inputFiles.length
    val filesTotal = BucketedMergeTarget.read(spark, byId).inputFiles.length
    assert(filesRead < filesTotal,
      s"probe read $filesRead of $filesTotal files — no pruning")
    IncrementalCluster.update(edges(1000L -> 1002L), byId, byRep, 1L)
    assert(stored(byId)(1003L) == 1000L)
  }

  test("a small batch touching a mega-cluster bails out of the driver regime, stays correct") {
    val (byId, byRep) = tmp()
    // one 13-member cluster accumulated under the default (roomy) budget
    val big = (0L until 12L).map(i => i -> (i + 1))
    IncrementalCluster.update(edges(big: _*), byId, byRep, 0L)
    // a 1-edge batch (well under driverMaxEdges=5) joins it — but its
    // affected-cluster MEMBERSHIP (13 rows) exceeds the local budget, so
    // the update must take the distributed path, not collect the cluster
    // onto the driver. Same closure either way — that is the pin.
    IncrementalCluster.update(edges(12L -> 100L), byId, byRep, 1L,
      driverMaxEdges = 5L)
    assert(stored(byId) == scratch(big :+ (12L -> 100L)))
    assert(stored(byId)(100L) == 0L)
    // and the next roomy-budget update over the healed stores still works
    IncrementalCluster.update(edges(100L -> 101L), byId, byRep, 2L)
    assert(stored(byId)(101L) == 0L)
  }

  test("randomized batch sequences stay equivalent to from-scratch CC") {
    val rnd = new scala.util.Random(20260812L)
    val (byId, byRep) = tmp()
    var cumulative = Seq.empty[(Long, Long)]
    (0 until 8).foreach { b =>
      val batch = Seq.fill(1 + rnd.nextInt(6)) {
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)
      }.filter { case (a, bb) => a != bb }
      if (batch.nonEmpty) {
        IncrementalCluster.update(edges(batch: _*), byId, byRep, b.toLong)
        cumulative = cumulative ++ batch
        assert(stored(byId) == scratch(cumulative), s"diverged after batch $b")
      }
    }
  }

  test("driver-local and distributed paths write identical stores (incl. mixed sequences)") {
    val rnd = new scala.util.Random(20260813L)
    val (byIdL, byRepL) = tmp()   // default: local path (small batches)
    val (byIdD, byRepD) = tmp()   // forced distributed (driverMaxEdges = 0)
    val (byIdM, byRepM) = tmp()   // alternating paths on ONE store pair
    (0 until 6).foreach { b =>
      val batch = Seq.fill(1 + rnd.nextInt(8)) {
        (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)
      }.filter { case (a, bb) => a != bb }
      if (batch.nonEmpty) {
        val e = edges(batch: _*)
        IncrementalCluster.update(e, byIdL, byRepL, b.toLong)
        IncrementalCluster.update(e, byIdD, byRepD, b.toLong, driverMaxEdges = 0L)
        IncrementalCluster.update(e, byIdM, byRepM, b.toLong,
          driverMaxEdges = if (b % 2 == 0) 1000000L else 0L)
        assert(stored(byIdL) == stored(byIdD), s"byId diverged at batch $b")
        assert(stored(byIdM) == stored(byIdD), s"mixed byId diverged at batch $b")
        def repRows(p: String) = BucketedMergeTarget.read(spark, p)
          .select("rep", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(repRows(byRepL) == repRows(byRepD), s"byRep diverged at batch $b")
        assert(repRows(byRepM) == repRows(byRepD), s"mixed byRep diverged at batch $b")
      }
    }
  }

  test("a replay heals an interrupted dual write (byId landed, byRep did not)") {
    val (byId, byRep) = tmp()
    IncrementalCluster.update(edges(1L -> 2L, 5L -> 6L), byId, byRep, 0L)
    // simulate batch 1 crashing between the byId merge and the byRep
    // merge: land ONLY the byId half of "edge 2—5 merges the clusters"
    val s = spark
    import s.implicits._
    val half = Seq((1L, 1L, 1L), (2L, 1L, 1L), (5L, 1L, 5L), (6L, 1L, 5L))
      .toDF("id", "rep", "prev_rep").withColumn("batch_id", lit(1L))
    BucketedMergeTarget.merge(half, byId, Seq("id"), "batch_id")
    // byRep still has the pre-merge state (rows under rep 5)
    // REPLAY batch 1 through the real path — must converge both stores
    IncrementalCluster.update(edges(2L -> 5L), byId, byRep, 1L)
    assert(stored(byId) == scratch(Seq(1L -> 2L, 5L -> 6L, 2L -> 5L)))
    val under1 = BucketedMergeTarget.readMatching(
      Seq(1L).toDF("rep"), byRep, Seq("rep"))
    assert(under1.select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 5L, 6L))
    val under5 = BucketedMergeTarget.readMatching(
      Seq(5L).toDF("rep"), byRep, Seq("rep"))
    assert(under5.count() == 0, "superseded rep rows must be deleted on replay")
  }
}
