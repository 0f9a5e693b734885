package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.sinks.BucketedMergeTarget
import graft.sinks.BucketedMergeTarget.MergeStats

/** Incremental corpus deduplication: dedup an INCOMING BATCH against the
  * accumulated corpus's persisted signature store — the real ingestion
  * shape at 100 TB, where re-running whole-corpus dedup per batch
  * (O(corpus) per arrival) is not an option.
  *
  * The store holds banded MinHash-LSH signatures `(band, bh, id,
  * batch_id)` in a [[BucketedMergeTarget]] bucketed by the PROBE key
  * `(band, bh)` (probe-key bucketing — `bucketCols`), so:
  *
  *   - append I/O ∝ batch: a batch's signatures rewrite only the store
  *     buckets its `(band, bh)` values hash into;
  *   - probe I/O ∝ batch: finding stored near-dup candidates reads ONLY
  *     those same buckets (`readMatching` prunes by manifest), never the
  *     accumulated store — pinned by `MergeTargetSpec`-style tests;
  *   - the candidate join carries `(id, band, bh)` rows only — document
  *     text never enters the store or the join, exactly the
  *     [[Dedup.minhashCandidates]] discipline.
  *
  * Equivalence: probing batch B against the store of corpus A yields the
  * same pairs as [[Dedup.crossMinhashCandidates]](B, A) — the whole-corpus
  * operator replayed from scratch (property-pinned). The hot-bucket cap
  * applies to the combined (batch + stored) population per `(band, bh)`,
  * like the cross-corpus sweep.
  *
  * Reference anchor: the reference's incremental sync accumulates state
  * per batch (`src/xmin/daemon.rs:336-461`); it has no fuzzy-dedup
  * analogue — this operator extends that incremental discipline to the
  * dedup family.
  */
object IncrementalDedup {

  /** Signature-store row identity: one row per (band, bh, id). */
  val SigPk: Seq[String] = Seq("band", "bh", "id")

  /** Probe-key bucketing: stores place and readers prune by `(band, bh)`. */
  val SigBucketCols: Seq[String] = Seq("band", "bh")

  /** LSH scheme of a store — every batch appended to one store MUST use
    * identical parameters, or signatures stop being comparable (the
    * store cannot check this: hashes are opaque). */
  final case class LshParams(ngramN: Int = 3, bands: Int = 4, rowsPerBand: Int = 3,
                             hashFn: Column => Column = Dedup.xxhash,
                             maxBucket: Int = 200)

  /** Banded signatures of a batch, in store row shape `(band, bh, id)`. */
  def batchSignatures(batch: DataFrame, idCol: String, text: Column,
                      params: LshParams): DataFrame =
    Dedup.bandedSignatures(batch, idCol, text, params.ngramN, params.bands,
      params.rowsPerBand, params.hashFn)

  /** Append a batch's signatures to the store (creating it on first use).
    * `batchId` is the ingestion cursor: replaying a batch is idempotent
    * (latest-per-key), and each signature row records the last batch that
    * asserted it. Rewrites only the buckets the batch touches. */
  def appendBatch(batch: DataFrame, idCol: String, text: Column,
                  storePath: String, batchId: Long, params: LshParams,
                  nBuckets: Int = BucketedMergeTarget.DefaultBuckets): MergeStats =
    appendSignatures(batchSignatures(batch, idCol, text, params), storePath,
      batchId, nBuckets)

  private def appendSignatures(sigs: DataFrame, storePath: String, batchId: Long,
                               nBuckets: Int): MergeStats =
    BucketedMergeTarget.merge(sigs.withColumn("batch_id", lit(batchId)),
      storePath, SigPk, "batch_id", nBuckets, SigBucketCols)

  /** Candidate near-dup pairs `(id_new, id_old)` between batch signatures
    * and the accumulated store: stored rows are read ONLY from the buckets
    * the batch's `(band, bh)` values hash into, then joined bucket-wise
    * with the combined-population hot-bucket cap. An absent/empty store
    * yields no pairs. `batchSigs` is consumed twice — pass a persisted
    * frame (as [[ingestBatch]] does) or accept recompute. */
  def probeCandidates(batchSigs: DataFrame, storePath: String,
                      maxBucket: Int): DataFrame = {
    val spark = batchSigs.sparkSession
    val idType = batchSigs.schema("id").dataType
    if (!BucketedMergeTarget.exists(spark, storePath))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id_new", idType),
          org.apache.spark.sql.types.StructField("id_old", idType))))
    val stored = BucketedMergeTarget.readMatching(batchSigs, storePath, SigBucketCols)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // cap on the combined bucket population, as in crossCandidatePairs:
      // an uncapped boilerplate bucket goes quadratic in |batch|·|stored|
      val keep = batchSigs.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("__na"))
        .join(stored.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("__nb")),
          Seq("band", "bh")) // inner: both sides must populate the bucket
        .filter(col("__na") + col("__nb") <= maxBucket)
        .select("band", "bh")
      batchSigs.join(keep, Seq("band", "bh"))
        .join(stored.select(col("band"), col("bh"), col("id").as("__ido")),
          Seq("band", "bh"))
        .select(col("id").as("id_new"), col("__ido").as("id_old"))
        .filter(col("id_new") =!= col("id_old")) // replayed batch meets itself
        .distinct()
        .localCheckpoint(true) // materialize before the persist is released
    } finally { stored.unpersist(); () }
  }

  /** One ingestion step: signatures once, probe against the accumulated
    * store, THEN append (order matters — a batch must not match itself
    * through the store; intra-batch duplicates are a separate
    * [[Dedup.minhashCandidates]] call on the batch when wanted). Returns
    * the candidate pairs and the append stats. */
  def ingestBatch(batch: DataFrame, idCol: String, text: Column,
                  storePath: String, batchId: Long, params: LshParams,
                  nBuckets: Int = BucketedMergeTarget.DefaultBuckets)
      : (DataFrame, MergeStats) = {
    val sigs = batchSignatures(batch, idCol, text, params)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val candidates = probeCandidates(sigs, storePath, params.maxBucket)
      val stats = appendSignatures(sigs, storePath, batchId, nBuckets)
      (candidates, stats)
    } finally { sigs.unpersist(); () }
  }
}
