package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** PK-bucketed table storage — the decision SURVEY §7.5 calls the make-
  * or-break for reconciliation at 100 TB: the periodic anti-join delete
  * reconciliation (and every PK-keyed merge) shuffles both sides on the
  * PK unless the data already lives pre-partitioned by it. Writing
  * source and target bucketed by the same key into the same bucket count
  * turns those joins into zero-exchange zips of co-located buckets.
  *
  * Uses Spark's native bucketing (`bucketBy` + `sortBy` + catalog
  * tables): the scan reports the bucket spec, and the planner elides the
  * Exchange on equi-joins over the bucket columns — pinned by a plan
  * test. On a real cluster the same tables would live in object storage
  * behind the metastore; locally they live under spark.sql.warehouse.dir.
  */
object BucketedStore {

  /** Write `df` as a bucketed, bucket-sorted catalog table. */
  def saveBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                   nBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Reconciliation anti-join over two co-bucketed tables: with matching
    * bucket specs this plans WITHOUT a shuffle on either side. */
  def orphanedKeysBucketed(spark: SparkSession, sourceTable: String,
                           targetTable: String, pkCols: Seq[String]): DataFrame = {
    val src = load(spark, sourceTable).select(pkCols.map(spark.table(sourceTable)(_)): _*)
    val tgt = load(spark, targetTable)
    tgt.join(src, pkCols, "left_anti")
  }
}
