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

  /** LEAKAGE-FREE train/holdout split: the split key is the document's
    * near-dup CLUSTER REPRESENTATIVE, not the document itself, so every
    * member of a duplicate cluster lands in the same split and no
    * near-duplicate pair ever straddles train/eval. Per-document
    * hashing ([[splitLabel]] on doc_id) leaks: a pair of near-dups
    * hashes independently, and with a 12/16 train fraction ~37 % of
    * dup pairs end up with one copy in train and one in eval —
    * benchmark contamination manufactured by your own splitter. The
    * standard guard in every serious pretraining pipeline (the
    * document-level complement of the decontamination sweep).
    *
    * Input: any frame carrying (idCol, cluster_rep) — e.g.
    * [[graft.operators.Dedup.clusterRepresentatives]]'s output, where
    * singletons are their own rep, so unclustered docs split exactly
    * like [[splitLabel]]. A narrow codegen'd map over the rep column —
    * no shuffle beyond what the cluster computation already paid. */
  def leakFreeSplit(reps: DataFrame, idCol: String,
                    trainSixteenths: Int = 12): DataFrame =
    reps.select(col(idCol), col("cluster_rep"),
      splitLabel(col("cluster_rep"), trainSixteenths).as("split"))

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

  /** Source-mix rebalancing (the data-mixing operator): downsample each
    * source deterministically so the kept corpus matches a TARGET mix —
    * e.g. "50 % web, 30 % books, 15 % code, 5 % reference" out of
    * whatever arrived. The largest corpus satisfying every share exactly
    * is kept: N = min over sources of ⌊n_s·100/w_s⌋, quota_s =
    * ⌊w_s·N/100⌋ — all INTEGER arithmetic, so any engine derives the
    * identical quotas (no floating-point fencepost). Within a source the
    * keepers are the quota-first rows in md5(key) order — the same
    * content-stable discipline as [[stratifiedCap]], so reruns and
    * engines agree row-for-row.
    *
    * Weights are parts-per-100 over the sources to KEEP (must sum to
    * 100); sources without a weight are dropped; every weighted source
    * must exist (fail-loud, since a missing source would silently zero
    * the whole mix). The per-source counts are one aggregate collected
    * to the driver — #sources rows, metadata. The rank window partitions
    * by source (scales with the largest source, like [[stratifiedCap]]);
    * at extreme skew the scale path is a per-source md5-threshold
    * selection instead of a full rank — same keeper set, two passes. */
  def rebalanceMix(df: DataFrame, sourceCol: String, key: Column,
                   weightsPer100: Seq[(String, Long)]): DataFrame = {
    require(weightsPer100.nonEmpty && weightsPer100.forall(_._2 > 0),
      "weights must be positive")
    require(weightsPer100.map(_._2).sum == 100L,
      s"weights must sum to 100, got ${weightsPer100.map(_._2).sum}")
    val spark = df.sparkSession
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = weightsPer100.collect { case (s, _) if !counts.contains(s) => s }
    require(missing.isEmpty, s"weighted sources absent from the corpus: $missing")
    val n = weightsPer100.map { case (s, w) => counts(s) * 100L / w }.min
    val quotas = weightsPer100.map { case (s, w) => (s, w * n / 100L) }
    import spark.implicits._
    val qdf = quotas.toDF(sourceCol, "__q")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(key.cast("string").cast("binary")), key)
    df.join(broadcast(qdf), Seq(sourceCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__q"))
      .drop("__rk", "__q")
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
