package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines —
  * beyond the reference (it has no sampling), but table stakes at
  * 100 TB: splits must be CONTENT-STABLE (the same document lands in the
  * same split on every run, every engine, every cluster size), never
  * `rand()` (which reshuffles per run and breaks train/test hygiene on
  * incremental reruns).
  *
  * Mechanism: hex digits of md5(key). Engine-portable (any SQL engine
  * renders the same md5 hex), codegen'd, and a pure narrow map — no
  * shuffle, no state, no seed to version.
  */
object Sampling {

  /** Split id in [0, 16): the first hex digit of md5(key). Granularity
    * 1/16 — compose two digits ([0,256)) via `hexBucket(c, 2)` when
    * finer fractions are needed. */
  def hexBucket(key: Column, digits: Int = 1): Column =
    substring(md5(key.cast("string").cast("binary")), 1, digits)

  /** Deterministic train/holdout label: `trainSixteenths`/16 of the
    * keyspace is "train", the rest "val". Content-stable: a document's
    * split never changes across runs or engines. */
  def splitLabel(key: Column, trainSixteenths: Int = 12): Column = {
    require(trainSixteenths >= 1 && trainSixteenths <= 15,
      "trainSixteenths must be in [1, 15]")
    val trainDigits = "0123456789abcdef".take(trainSixteenths)
    when(contains(lit(trainDigits), hexBucket(key)), lit("train"))
      .otherwise(lit("val"))
  }

  /** Stratified cap: keep at most `k` rows per stratum, chosen
    * DETERMINISTICALLY by md5-hash order of the key (not by arrival
    * order — stable under any partitioning). The window partitions by
    * stratum, so it scales with the largest stratum, not the table. */
  def stratifiedCap(df: DataFrame, stratumCol: Column, key: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(md5(key.cast("string").cast("binary")), key)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Temporal thinning (debounce): keep a row only when it is at least
    * `minGapSeconds` after the PREVIOUS row of the same keys (lag
    * semantics — each row compares to its immediate predecessor in
    * (ts, tieCol) order, kept or not; the first row per key always
    * survives). One window partitioned by the keys — parallel per key,
    * no global sort. Comparison is on full-precision timestamps
    * (`prev + INTERVAL` — never unix-seconds truncation), and the
    * explicit `tieCol` makes equal-timestamp runs deterministic: the
    * lowest tie value survives, the rest see a zero gap and drop. */
  def debounce(df: DataFrame, keys: Seq[String], tsCol: String, tieCol: String,
               minGapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .filter(col("__prev").isNull ||
        col(tsCol) >= col("__prev") + expr(s"INTERVAL $minGapSeconds SECONDS"))
      .drop("__prev")
  }
}
