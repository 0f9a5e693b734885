package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.BucketedMergeTarget

/** Incremental duplicate-CLUSTER maintenance: keep a persisted
  * (id → cluster representative) assignment correct as verified near-dup
  * edge batches arrive — the step after [[IncrementalDedup]]'s candidate
  * probing, and the piece that turns per-batch dedup into per-batch
  * CLUSTERING without ever re-running connected components over the
  * accumulated graph (O(corpus) per arrival at 100 TB).
  *
  * Storage — two [[BucketedMergeTarget]]s, probed on different keys:
  *
  *   - `byId` `(id, rep, prev_rep, batch_id)`, PK `id`, bucketed by id:
  *     answers "what cluster is this node in?" for the batch's touched
  *     nodes — probe I/O ∝ batch.
  *   - `byRep` `(rep, id, batch_id)`, PK `(rep, id)`, bucketed by the
  *     probe key `rep`: answers "who else is in these clusters?" for the
  *     affected representatives — probe I/O ∝ affected clusters.
  *
  * An update loads ONLY the members of clusters the batch touches, runs
  * [[Dedup.connectedComponents]] (driver union-find fast path for the
  * usual small local graph) over {new edges} ∪ {member→rep star edges},
  * and writes back the re-labeled nodes — work ∝ batch + affected
  * clusters, independent of the accumulated corpus.
  *
  * CRASH/REPLAY CONTRACT (same at-least-once discipline as the sync
  * loop): an update that fails anywhere must be REPLAYED with the same
  * `batchId` before the next batch is ingested. The dual write commits
  * `byId` first and records each node's previous representative, so a
  * replay probes `byRep` under both current AND previous reps and sees
  * through any half-written state; merges are cursor-idempotent. Star
  * edges derived from superseded rows are harmless: a node's former rep
  * was genuinely connected to it, and components only ever grow.
  */
object IncrementalCluster {

  /** Current assignments `(id, rep)` — a full read of the byId store. */
  def assignments(spark: SparkSession, byIdPath: String): DataFrame =
    BucketedMergeTarget.read(spark, byIdPath).select(col("id"), col("rep"))

  /** Apply one batch of undirected edges `(id_a, id_b)`. Returns the
    * re-labeled assignments `(id, rep, prev_rep)` this batch wrote. */
  def update(edges: DataFrame, byIdPath: String, byRepPath: String,
             batchId: Long,
             nBuckets: Int = BucketedMergeTarget.DefaultBuckets): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("id_a"), col("id_b"))
      .filter(col("id_a") =!= col("id_b")).distinct()
    val touched = e.select(col("id_a").as("id"))
      .unionByName(e.select(col("id_b").as("id"))).distinct()

    // current (and previous) representatives of the touched nodes; nodes
    // never seen before represent themselves
    val knownRaw =
      if (BucketedMergeTarget.exists(spark, byIdPath))
        BucketedMergeTarget.readMatching(touched, byIdPath, Seq("id"))
          .select(col("id"), col("rep"), col("prev_rep"))
      else touched.limit(0).select(col("id"), col("id").as("rep"), col("id").as("prev_rep"))
    val touchedAsg = touched.join(knownRaw, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("rep"), col("id")).as("rep"),
        coalesce(col("prev_rep"), col("id")).as("prev_rep"))

    // every cluster the batch touches, under current AND previous reps
    // (previous covers an interrupted predecessor's half-written state)
    val reps = touchedAsg.select(col("rep"))
      .unionByName(touchedAsg.select(col("prev_rep").as("rep"))).distinct()
    val members =
      if (BucketedMergeTarget.exists(spark, byRepPath))
        BucketedMergeTarget.readMatching(reps, byRepPath, Seq("rep"))
          .select(col("rep"), col("id"))
      else reps.limit(0).select(col("rep"), col("rep").as("id"))

    // local graph: new edges + star edges (member—rep, touched—rep,
    // touched—prev_rep). All stars reflect real historical connectivity.
    val star = members.select(col("id").as("id_a"), col("rep").as("id_b"))
      .unionByName(touchedAsg.select(col("id").as("id_a"), col("rep").as("id_b")))
      .unionByName(touchedAsg.select(col("id").as("id_a"), col("prev_rep").as("id_b")))
      .filter(col("id_a") =!= col("id_b"))
    val comp = Dedup.connectedComponents(e.unionByName(star))

    // EVERY old (rep, id) location a node may occupy in byRep — the
    // members read (byRep truth), plus the byId view and its prev (which
    // may be staler than byRep after an interrupted predecessor). Feeds
    // BOTH the moved-row deletion (which must clear all of them) and the
    // prev_rep bookkeeping (max = the stale-est sound location, so the
    // NEXT replay still probes it).
    val oldLocs = members.select(col("rep"), col("id"))
      .unionByName(touchedAsg.select(col("rep"), col("id")))
      .unionByName(touchedAsg.select(col("prev_rep").as("rep"), col("id")))
      .distinct()
      .localCheckpoint(true)
    val oldAsg = oldLocs.groupBy(col("id")).agg(max(col("rep")).as("__old"))
    val newAsg = comp.select(col("id"), col("comp").as("rep"))
      .join(oldAsg, Seq("id"), "left")
      .select(col("id"), col("rep"),
        coalesce(col("__old"), col("id")).as("prev_rep"))
      .localCheckpoint(true) // computed ONCE; three writes below reuse it

    // byId FIRST: once it lands, a replay recovers byRep via prev_rep
    BucketedMergeTarget.merge(
      newAsg.withColumn("batch_id", lit(batchId)),
      byIdPath, Seq("id"), "batch_id", nBuckets)
    // byRep: new locations in, moved rows' old locations out — ONE commit
    // (applyBatch); the old merge-then-deleteKeys pair cost a second
    // manifest bump per batch and left a stale-row window between them
    val moved = oldLocs
      .join(newAsg.select(col("id"), col("rep").as("__new")), Seq("id"))
      .filter(col("rep") =!= col("__new"))
      .select(col("rep"), col("id"))
    BucketedMergeTarget.applyBatch(
      newAsg.select(col("rep"), col("id")).withColumn("batch_id", lit(batchId)),
      moved, byRepPath, Seq("rep", "id"), "batch_id", nBuckets, Seq("rep"))
    newAsg
  }
}
