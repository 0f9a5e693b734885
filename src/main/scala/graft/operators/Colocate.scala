package graft.operators

import org.apache.spark.sql.DataFrame

/** Join co-location via bucketed tables — the standing answer to "this
  * equi-join shuffles both sides every run".
  *
  * A fact table written once with [[writeBucketed]] is hash-partitioned
  * into `nBuckets` files per partition by the join key AND sorted within
  * each bucket. Any later equi-join between two tables bucketed to the
  * same count on their join keys plans as a SortMergeJoin with NO
  * Exchange on either side (pinned by `PlanSpec`): the shuffle was paid
  * once at write time and amortizes over every subsequent join — the
  * right trade for the repeatedly-joined core tables of a 100 TB
  * warehouse (orders ⋈ lineitem every day). The per-run Sort is ALSO
  * elided (pinned) when the scan is allowed to expose the in-bucket
  * order — `spark.sql.legacy.bucketedTableScan.outputOrdering=true`,
  * off by default since it caps scan parallelism at one task per
  * bucket; size nBuckets to the cluster before turning it on.
  *
  * This complements [[graft.sinks.BucketedMergeTarget]]: that sink owns
  * its hash-bucket layout for MERGE pruning (I/O ∝ batch); this one
  * registers Spark-native bucketing metadata in the catalog so the
  * OPTIMIZER can elide exchanges. Same principle — pre-partition once,
  * reuse the partitioning across stages — surfaced to two consumers.
  *
  * Reference anchor: the reference co-locates nothing (single-node,
  * `src/postgres/reader.rs` streams rows); bucketing is the Spark-native
  * capability a cluster user gains by switching.
  */
object Colocate {

  /** Write `df` as a bucketed + in-bucket-sorted managed parquet table.
    * Every table that will join against it on `keys` should use the SAME
    * `nBuckets` — mismatched counts fall back to shuffling one side. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
                    keys: Seq[String]): Unit =
    // co-locate each bucket's rows into ONE writer task first: the
    // planner only elides the per-run Sort when every bucket holds at
    // most one file (multiple files per bucket are individually sorted
    // but not merged). One shuffle at write time buys sort-free SMJs on
    // every subsequent join — and ~nBuckets files instead of
    // (writer tasks × nBuckets).
    df.repartition(nBuckets, keys.map(df.col): _*)
      .write.mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
