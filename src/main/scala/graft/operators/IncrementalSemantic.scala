package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.sinks.BucketedMergeTarget
import graft.sinks.BucketedMergeTarget.MergeStats

/** Incremental SEMANTIC dedup (SemDeDup, Abbas et al. '23, run as
  * continuous ingestion): each arriving batch of embeddings is cleaned
  * against the accumulated corpus's SURVIVOR store — the embedding-space
  * twin of [[IncrementalDedup]] (MinHash text near-dups) and of the span
  * gram store (exact substring state). Re-running whole-corpus SemDeDup
  * per arrival is O(corpus) per batch; this is O(batch).
  *
  * The store holds the surviving vectors themselves, keyed by their SRP
  * bucket — a bucket-pruned vector index:
  *
  *   - rows are `(bucket, vec_id, nrm, v, batch_id)` in a
  *     [[BucketedMergeTarget]] bucketed by the PROBE key `bucket`, so
  *     append I/O and probe I/O are both ∝ the batch's buckets, never
  *     the accumulated corpus;
  *   - only SURVIVORS enter the store: a dropped vector is represented
  *     by whichever senior neighbor killed it, so the store stays the
  *     cleaned corpus (exactly what SemDeDup hands downstream) and
  *     store growth is bounded by the post-dedup rate, not the crawl
  *     rate.
  *
  * Drop rule for a batch vector y (threshold t, rounded to 6 dp like
  * [[Similarity.pairwiseCosineCandidates]] so a SQL oracle agrees
  * bit-for-bit): y drops iff its bucket is ACTIVE and
  *
  *   - some stored survivor x shares y's bucket with cos(x, y) >= t
  *     (store seniority — earlier arrivals win), or
  *   - some batch-mate x with x.vec_id < y.vec_id shares the bucket
  *     with cos(x, y) >= t (within-batch seniority, the one-shot
  *     [[Similarity]] pair rule).
  *
  * A bucket is active when its COMBINED population (batch + stored
  * survivors) is <= maxBucket; an over-cap bucket contributes no drops
  * — the hot-bucket discipline of every LSH operator here (a degenerate
  * embedding cluster would otherwise go quadratic). The one-shot
  * operator's `>= 2` lower bound is vacuous (singleton buckets have no
  * pairs) and is not replicated.
  *
  * `hPlanes` is a STORE parameter, not per-batch: stored bucket ids are
  * h-bit, so every batch appended to one store must derive buckets with
  * the same h (and the same portable plane family) — the
  * [[IncrementalDedup.LshParams]] contract. Size h for the corpus the
  * store will GROW INTO (h = log2(n_final / targetBucket)); planes
  * beyond need cost h sign-dots per vector, while under-sizing fattens
  * every bucket (the measured failure
  * [[Similarity.pairwiseCosineCandidatesAuto]] exists to avoid).
  *
  * Reference anchor: the reference accumulates per-batch sync state
  * (database-replicator src/xmin/daemon.rs:336-461) but has no
  * embedding operators; this extends its incremental discipline to the
  * similarity family. */
object IncrementalSemantic {

  /** Store row identity; `bucket` leads so PK-prefix bucketing and the
    * probe key coincide. */
  val VecPk: Seq[String] = Seq("bucket", "vec_id")

  /** Probe-key bucketing: appends place and probes prune by `bucket`. */
  val VecBucketCols: Seq[String] = Seq("bucket")

  /** SRP/threshold scheme of a store — identical for every batch
    * appended to it (bucket ids are h-bit; the store cannot check).
    * `dim` is the vector dimensionality, fixed per store like
    * `hPlanes`: when set, bucketing runs the native all-planes pass
    * with the plane matrix as literals; when None, [[batchVectors]]
    * probes the first row per batch (a tiny extra Spark job, and an
    * empty batch silently falls back to the slower per-row-hash HOF
    * path — prefer setting it). */
  final case class SrpParams(hPlanes: Int, threshold: Double,
                             portable: Boolean = true, maxBucket: Int = 10000,
                             dim: Option[Int] = None)

  private def emptyLike(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Batch vectors in store row shape (without `batch_id`). */
  def batchVectors(batch: DataFrame, idCol: String, vecCol: String,
                   p: SrpParams): DataFrame = {
    val dim = p.dim.orElse(
      batch.select(size(col(vecCol))).head(1).headOption.map(_.getInt(0)))
    batch.select(
      Similarity.srpBucket(col(vecCol), p.hPlanes, p.portable, dim).as("bucket"),
      col(idCol).as("vec_id"),
      Similarity.norm(col(vecCol)).as("nrm"),
      col(vecCol).as("v"))
  }

  /** One ingestion step: probe the survivor store, resolve the batch's
    * keeps/drops, append the keeps, return `(vec_id, batch_id, kept)`
    * for every batch vector. The verdict frame is checkpointed BEFORE
    * the append commits, so it stays valid however late it is consumed
    * (the store has moved on by then — same discipline as the span
    * store's excise seeds). */
  def ingestBatch(batch: DataFrame, idCol: String, vecCol: String,
                  storePath: String, batchId: Long, p: SrpParams,
                  nBuckets: Int = BucketedMergeTarget.DefaultBuckets): DataFrame = {
    val spark = batch.sparkSession
    // not pre-partitioned: the verdict plan's three bucket-keyed reads
    // of this cache share one exchange via ReusedExchange (the sides of
    // the self-join and the store probe are identical subplans), so an
    // upfront repartition would only add a fourth payload shuffle
    val sigs = batchVectors(batch, idCol, vecCol, p)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // Pure-INDEX regime: the 6-rounded cosine is capped at 1.0, so a
      // threshold above 1 makes every drop rule unsatisfiable BY
      // CONSTRUCTION — skip the store probe and both pair joins
      // entirely (computing O(bucket²) dot products to prove an empty
      // set is the q_ann_store 100× failure mode) and append the whole
      // batch as survivors.
      if (p.threshold > 1.0) {
        val verdict = sigs
          .select(col("vec_id"), lit(batchId).as("batch_id"),
            lit(true).as("kept"))
          .localCheckpoint(true)
        val keeps = sigs.select(col("bucket"), col("vec_id"), col("nrm"),
          col("v"), lit(batchId).as("batch_id"))
        val _: MergeStats = BucketedMergeTarget.merge(keeps, storePath,
          VecPk, "batch_id", nBuckets, VecBucketCols)
        return verdict
      }
      val stored =
        if (BucketedMergeTarget.exists(spark, storePath))
          BucketedMergeTarget.readMatching(sigs, storePath, VecBucketCols)
            .select(col("bucket"), col("vec_id"), col("nrm"), col("v"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        else
          emptyLike(spark, StructType(
            sigs.select("bucket", "vec_id", "nrm", "v").schema.fields.toIndexedSeq))
      try {
        // combined-population hot-bucket cap: over-cap buckets are
        // INACTIVE for this batch (no drops from them)
        val active = sigs.groupBy(col("bucket")).agg(count(lit(1)).as("__na"))
          .join(stored.groupBy(col("bucket")).agg(count(lit(1)).as("__nb")),
            Seq("bucket"), "left")
          .filter(col("__na") + coalesce(col("__nb"), lit(0L)) <= p.maxBucket)
          .select("bucket")
        val probing = sigs.join(active, Seq("bucket"))
        def cos(a: String, b: String) =
          round(Similarity.dot(col(s"$a.v"), col(s"$b.v")) /
            (col(s"$a.nrm") * col(s"$b.nrm")), 6)
        val crossDrop = probing.as("y")
          .join(stored.as("x"), col("x.bucket") === col("y.bucket"))
          .filter(cos("x", "y") >= p.threshold)
          .select(col("y.vec_id"))
        val withinDrop = probing.as("y")
          .join(probing.as("x"),
            col("x.bucket") === col("y.bucket") &&
              col("x.vec_id") < col("y.vec_id"))
          .filter(cos("x", "y") >= p.threshold)
          .select(col("y.vec_id"))
        val dropped = crossDrop.unionAll(withinDrop).distinct()
          .withColumn("__dropped", lit(true))
        val verdict = sigs.select("vec_id")
          .join(dropped, Seq("vec_id"), "left")
          .select(col("vec_id"), lit(batchId).as("batch_id"),
            not(coalesce(col("__dropped"), lit(false))).as("kept"))
          .localCheckpoint(true) // probe results outlive the append below
        val keeps = sigs.join(
          verdict.filter(col("kept")).select("vec_id"), Seq("vec_id"))
          .select(col("bucket"), col("vec_id"), col("nrm"), col("v"),
            lit(batchId).as("batch_id"))
        val _: MergeStats = BucketedMergeTarget.merge(keeps, storePath,
          VecPk, "batch_id", nBuckets, VecBucketCols)
        verdict
      } finally { stored.unpersist(); () }
    } finally { sigs.unpersist(); () }
  }

  /** The query vector's SRP bucket, computed ON THE DRIVER with the
    * same plane matrix and fold order as `graft_srp_bucket` — one
    * vector needs no Spark job. */
  def queryBucket(queryVec: Array[Float], p: SrpParams): Long = {
    val dim = queryVec.length
    val planes = graft.functions.SrpBucket.planesHex(p.hPlanes, dim)
    var b = 0L
    var pl = 0
    while (pl < p.hPlanes) {
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += queryVec(i).toDouble * planes(pl * dim + i); i += 1 }
      if (acc >= 0) b |= 1L << pl
      pl += 1
    }
    b
  }

  /** ANN top-k SERVED FROM THE STORE — the survivor store doubles as a
    * bucket-pruned vector index. The query's bucket and its
    * Hamming-≤radius multi-probe set are derived on the driver
    * (matching the ingest's plane family bit-for-bit), then
    * [[BucketedMergeTarget.readMatchingLocal]] reads ONLY the store
    * buckets those probe ids hash into — one narrow pruned scan, no
    * Spark job to plan the probe — and the candidates rank by the
    * 6-rounded cosine with the id tiebreak (stored `nrm` reused; the
    * query norm is the same driver-side fold the oracle's SQL norm
    * replays). At scale this is the point-lookup shape: a top-k costs
    * I/O ∝ the probed buckets' files, never the corpus. */
  def storeTopK(spark: SparkSession, storePath: String,
                queryVec: Array[Float], k: Int, p: SrpParams,
                radius: Int = 1): DataFrame = {
    val probes = Similarity.probeBuckets(queryBucket(queryVec, p),
      p.hPlanes, radius)
    val cand = BucketedMergeTarget.readMatchingLocal(spark, storePath,
      "bucket", probes, org.apache.spark.sql.types.LongType)
    var qn = 0.0
    queryVec.foreach(x => qn += x.toDouble * x.toDouble)
    qn = math.sqrt(qn)
    val qLit = array(queryVec.toIndexedSeq.map(x => lit(x.toDouble)): _*)
    cand.select(col("vec_id"),
        round(Similarity.dot(col("v"), qLit) / (col("nrm") * lit(qn)), 6)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }
}
