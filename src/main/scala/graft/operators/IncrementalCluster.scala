package graft.operators

import scala.jdk.CollectionConverters._

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
    * re-labeled assignments `(id, rep, prev_rep)` this batch wrote.
    *
    * TWO EXECUTION PATHS, identical semantics (equivalence
    * property-pinned across the threshold in IncrementalClusterSpec):
    *
    *   - batches of ≤ `driverMaxEdges` integral-id edges (the usual
    *     incremental arrival) run DRIVER-LOCAL: one collect of the edge
    *     batch, two zero-shuffle bucket-pruned point lookups
    *     ([[BucketedMergeTarget.readMatchingLocal]] — bucket hashes
    *     evaluated on the driver), union-find + relabeling in plain
    *     Scala, then the two store commits from local relations. This
    *     cuts the per-update fixed overhead from ~20 tiny Spark jobs
    *     (distinct/join/checkpoint shuffles over batch-sized frames) to
    *     the two probes + two commits — the lever that bounds
    *     incremental-store throughput (round-4 verdict #4). The batch
    *     and its affected-cluster neighborhood land on the driver, which
    *     is exactly the regime [[Dedup.connectedComponents]] already
    *     accepts for its union-find fast path.
    *   - larger batches (or non-integral ids) run the distributed
    *     dataflow below — work ∝ batch + affected clusters, never the
    *     accumulated corpus.
    */
  def update(edges: DataFrame, byIdPath: String, byRepPath: String,
             batchId: Long,
             nBuckets: Int = BucketedMergeTarget.DefaultBuckets,
             driverMaxEdges: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val spark = edges.sparkSession
    // Bucket hashes are type-sensitive (Murmur3 over Int literals differs
    // from the same values as Longs), so a batch whose id type differs
    // from the store's would probe the WRONG buckets and silently miss
    // existing assignments — in the driver path (readMatchingLocal) and
    // the distributed path (readMatching bucket-prunes on the keys
    // frame's type) alike. Align the batch to the stored type up front:
    // widen when safe, fail loudly when the cast would narrow.
    val rawType = edges.schema("id_a").dataType
    val storedType = BucketedMergeTarget.currentManifest(spark, byIdPath)
      .flatMap(m => m.schema.fields.find(_.name == "id").map(_.dataType))
    val width = Map[org.apache.spark.sql.types.DataType, Int](
      ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)
    val aligned = storedType match {
      case Some(st) if st != rawType =>
        require(width.contains(rawType) && width.contains(st) &&
            width(rawType) < width(st),
          s"edge id type $rawType does not match the store's id type $st " +
            "and cannot widen to it — probes would hash the wrong buckets")
        edges.select(col("id_a").cast(st).as("id_a"),
          col("id_b").cast(st).as("id_b"))
      case _ => edges.select(col("id_a"), col("id_b"))
    }
    val e = aligned.filter(col("id_a") =!= col("id_b")).distinct()
    val idType = e.schema("id_a").dataType
    val integral = Seq(ByteType, ShortType, IntegerType, LongType).contains(idType) &&
      idType == e.schema("id_b").dataType
    if (integral && driverMaxEdges > 0) {
      val cap = math.min(driverMaxEdges + 1, Int.MaxValue.toLong).toInt
      // count the gate, don't collect it (the connectedComponents fast-path
      // shape): an oversized batch must not materialize driverMaxEdges
      // rows on the driver just to learn it's oversized — and the persist
      // lets the distributed fallback reuse the distinct instead of
      // re-deriving the whole edge lineage for each of its consumers
      val persisted = e.persist()
      try {
        // ONE job gates AND fetches: collecting through limit(cap) means
        // a result shorter than the cap IS the complete distinct edge
        // set (the limit never truncated), so the size check and the
        // collect no longer cost a job each
        val limited = traced("edge collect")(persisted.limit(cap).collect())
        if (limited.length <= driverMaxEdges) {
          val out = updateLocal(spark, limited, idType,
            byIdPath, byRepPath, batchId, nBuckets, driverMaxEdges)
          // None = the batch is small but its affected-cluster membership
          // is not — fall through to the distributed path, whose work is
          // ∝ batch + affected clusters with nothing driver-resident
          out match {
            case Some(df) => return df
            case None => ()
          }
        }
        updateDistributed(spark, persisted, byIdPath, byRepPath, batchId, nBuckets)
      } finally { persisted.unpersist(false); () }
    } else updateDistributed(spark, e, byIdPath, byRepPath, batchId, nBuckets)
  }

  /** Driver-local update: the whole probe → union-find → relabel round
    * in plain Scala; Spark runs only the two pruned store reads and the
    * two commits. Returns None when the affected-cluster MEMBERSHIP
    * exceeds `maxLocal` — a small batch can touch an arbitrarily large
    * accumulated cluster, and the driver regime is bounded by what lands
    * on the driver (edges + members), not by the batch alone. */
  /** Coarse stage timing to stderr when SPARK_GRAFT_TRACE is set — the
    * per-batch latency budget is fixed overhead (jobs + commits), so
    * where it goes is worth being able to see in any environment. */
  private val trace = sys.env.contains("SPARK_GRAFT_TRACE")
  private def traced[A](name: String)(f: => A): A =
    if (!trace) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[inc-cluster] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

  private def updateLocal(spark: SparkSession, eRows: Array[org.apache.spark.sql.Row],
                          idType: org.apache.spark.sql.types.DataType,
                          byIdPath: String, byRepPath: String, batchId: Long,
                          nBuckets: Int, maxLocal: Long): Option[DataFrame] = {
    import scala.collection.mutable
    // ids as longs for the union-find; `orig` maps back to the runtime
    // representation of the stored type (Byte/Short/Int/Long)
    val orig = mutable.Map.empty[Long, Any]
    def reg(a: Any): Long = {
      val l = a.asInstanceOf[Number].longValue
      orig.getOrElseUpdate(l, a); l
    }
    val eL = eRows.map(r => (reg(r.get(0)), reg(r.get(1))))
    val touched: Set[Long] = eL.iterator.flatMap(p => Iterator(p._1, p._2)).toSet

    val byIdManifest = BucketedMergeTarget.currentManifest(spark, byIdPath)
    val known: Map[Long, (Long, Long)] = traced("probe byId") {
      if (byIdManifest.isEmpty) Map.empty
      else BucketedMergeTarget.readMatchingLocal(spark, byIdPath, "id",
          touched.map(orig).toSeq, idType, byIdManifest)
        .select(col("id"), col("rep"), col("prev_rep")).collect()
        .map(r => reg(r.get(0)) -> (reg(r.get(1)), reg(r.get(2)))).toMap
    }
    val touchedAsg: Map[Long, (Long, Long)] =
      touched.iterator.map(id => id -> known.getOrElse(id, (id, id))).toMap

    val reps: Set[Long] = touchedAsg.valuesIterator.flatMap(v => Iterator(v._1, v._2)).toSet
    val byRepManifest = BucketedMergeTarget.currentManifest(spark, byRepPath)
    val memberCap = math.min(maxLocal, Int.MaxValue.toLong - 1).toInt
    val memberRows: Array[org.apache.spark.sql.Row] = traced("probe byRep") {
      if (byRepManifest.isEmpty) Array.empty
      else BucketedMergeTarget.readMatchingLocal(spark, byRepPath, "rep",
          reps.map(orig).toSeq, idType, byRepManifest)
        .select(col("rep"), col("id")).limit(memberCap + 1).collect()
    }
    // a touched mega-cluster (more members than the local budget) must
    // not be union-found on the driver — bail to the distributed path
    if (memberRows.length > memberCap) return None
    val members: Seq[(Long, Long)] =
      memberRows.map(r => (reg(r.get(0)), reg(r.get(1)))).toSeq

    // local graph: new edges + star edges (member—rep, touched—rep,
    // touched—prev_rep) — same construction as the distributed path
    val star = members.iterator.map { case (r, i) => (i, r) } ++
      touchedAsg.iterator.map { case (i, (r, _)) => (i, r) } ++
      touchedAsg.iterator.map { case (i, (_, p)) => (i, p) }
    val allEdges = (eL.iterator ++ star).filter(p => p._1 != p._2).toSeq
    val nodes: Set[Long] = allEdges.iterator.flatMap(p => Iterator(p._1, p._2)).toSet ++
      touched

    // union-find with path compression; component label = min member id
    // (the same labeling connectedComponents produces)
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    allEdges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val compMin = mutable.Map.empty[Long, Long]
    nodes.foreach { n =>
      val r = find(n)
      compMin(r) = math.min(compMin.getOrElse(r, n), n)
    }
    def comp(n: Long): Long = compMin(find(n))

    // every old (rep, id) location a node may occupy — as distributed
    val oldLocs: Set[(Long, Long)] = members.toSet ++
      touchedAsg.iterator.map { case (i, (r, _)) => (r, i) } ++
      touchedAsg.iterator.map { case (i, (_, p)) => (p, i) }
    val oldAsg: Map[Long, Long] =
      oldLocs.groupBy(_._2).view.mapValues(_.map(_._1).max).toMap
    val newAsg: Seq[(Long, Long, Long)] =
      nodes.toSeq.sorted.map(id => (id, comp(id), oldAsg.getOrElse(id, id)))
    val newRep: Map[Long, Long] = newAsg.iterator.map(t => t._1 -> t._2).toMap
    val moved: Seq[(Long, Long)] =
      oldLocs.filter { case (r, i) => newRep(i) != r }.toSeq.sorted

    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val asgSchema = StructType(Seq(
      StructField("id", idType), StructField("rep", idType),
      StructField("prev_rep", idType), StructField("batch_id", LongType)))
    val asgRows = newAsg.map(t =>
      org.apache.spark.sql.Row(orig(t._1), orig(t._2), orig(t._3), batchId))

    val byRepSchema = StructType(Seq(
      StructField("rep", idType), StructField("id", idType),
      StructField("batch_id", LongType)))
    val byRepUpserts = newAsg.map(t =>
      org.apache.spark.sql.Row(orig(t._2), orig(t._1), batchId))
    val movedRows = moved.map(p =>
      org.apache.spark.sql.Row(orig(p._1), orig(p._2)))
    // ONE overlapped commit round for both stores: the two stagings are
    // independent Spark jobs over different paths and run CONCURRENTLY;
    // only the manifest publishes are serialized, byId FIRST — the
    // crash/replay contract lives in publish order (byRep's manifest
    // must never precede byId's), not staging order. A crash between
    // the publishes leaves "byId landed, byRep did not", healed by
    // replay exactly as before; a failed byId prepare abandons byRep's
    // uniquely-named staging to the orphan TTL.
    traced("commit both") {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val prepById = Future(BucketedMergeTarget.prepareBatchLocal(
        spark, asgSchema, asgRows, Nil, byIdPath, Seq("id"), "batch_id", nBuckets))
      val prepByRep = Future(BucketedMergeTarget.prepareBatchLocal(
        spark, byRepSchema, byRepUpserts, movedRows, byRepPath,
        Seq("rep", "id"), "batch_id", nBuckets, Seq("rep")))
      Await.result(prepById, 600.seconds)
        .foreach(p => BucketedMergeTarget.publishVersion(spark, p))
      Await.result(prepByRep, 600.seconds)
        .foreach(p => BucketedMergeTarget.publishVersion(spark, p))
    }
    Some(spark.createDataFrame(
      newAsg.map(t => org.apache.spark.sql.Row(orig(t._1), orig(t._2), orig(t._3))).asJava,
      StructType(asgSchema.fields.dropRight(1))))
  }

  /** The distributed dataflow (batches beyond the driver regime). */
  private def updateDistributed(spark: SparkSession, e: DataFrame,
                                byIdPath: String, byRepPath: String, batchId: Long,
                                nBuckets: Int): DataFrame = {
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
