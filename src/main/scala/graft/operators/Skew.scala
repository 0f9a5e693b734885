package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting. Spark's AQE rewrites skewed
  * sort-merge joins at runtime; explicit salting remains the tool when
  * (a) AQE can't see the skew (first run, no stats), (b) the build side
  * must stay a shuffle join, or (c) a single hot key dwarfs everything
  * (the classic null-key / boilerplate-doc case in training pipelines).
  *
  * Shape: the BIG side gets a deterministic per-row salt in [0, S) that
  * is independent of the join key (a hot key's rows spread across S
  * sub-keys); the SMALL side is replicated S times; the join runs on
  * (key, salt). Row counts multiply only on the small side — S × |small|
  * extra rows buys S-way spreading of the hottest key.
  */
object Skew {

  /** Per-row salt: position-derived (partition id ⊕ offset via
    * monotonically_increasing_id), mod S. Content hashing would send
    * IDENTICAL duplicate rows — precisely the hot-key case — to one
    * salt; position spreads them.
    *
    * Guarantee (pinned by a property test): the salted-join RESULT is
    * independent of the salt values — every big-side row matches the
    * replicated small side under any salt in [0, S), so correctness
    * never depends on which salt a row gets. Salt values themselves are
    * NOT stable across replans (AQE may coalesce upstream partitions and
    * shift monotonically_increasing_id); only the spreading matters. */
  def rowSalt(df: DataFrame, saltFactor: Int): Column =
    pmod(monotonically_increasing_id(), lit(saltFactor)).cast("int")

  /** Salt factor chosen FROM a [[HeavyHitters.keySkew]] report — the
    * closed loop between diagnosis and mitigation: the hottest key's
    * `share` says what fraction of all rows one reducer would receive
    * un-salted; spreading it across S sub-keys divides that by S, so the
    * smallest S with share·partitions/S ≤ targetLoad (fair partition
    * loads ≈ targetLoad × 1/partitions) is
    * ceil(share · partitions / targetLoad). Returns 1 — salting off,
    * `saltedJoin(…, 1)` degenerates to the plain join — when the
    * heaviest key already fits a fair share; capped at `maxSalt`
    * because S also multiplies the replicated small side.
    *
    * The report is top-k rows by construction, so the collect here is
    * bounded metadata, not data. Correctness never depends on the
    * returned value (the salted join's result is salt-invariant — the
    * property test pins it); only the load distribution does. */
  def saltFactorFromSkew(skewReport: DataFrame, partitions: Int,
                         targetLoad: Double = 1.0, maxSalt: Int = 64): Int = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    require(targetLoad > 0, s"targetLoad must be > 0, got $targetLoad")
    require(maxSalt >= 1, s"maxSalt must be >= 1, got $maxSalt")
    val maxShare = skewReport.agg(max(col("share"))).head() match {
      case r if r.isNullAt(0) => 0.0 // empty report: nothing to spread
      case r                  => r.getDouble(0)
    }
    val s = math.ceil(maxShare * partitions / targetLoad).toInt
    math.min(maxSalt, math.max(1, s))
  }

  /** Salted inner equi-join of a skewed big side with a small side. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    require(saltFactor >= 1)
    val saltedBig = big.withColumn("__salt", rowSalt(big, saltFactor))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit(_)): _*)))
    saltedBig.join(replicatedSmall, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase (salted) aggregation for skew-heavy group-bys where a
    * single group overwhelms one reducer: partial-aggregate on
    * (key, salt), then final-aggregate on key. `partials` maps each
    * value column to a (partialAgg, finalAgg) pair — e.g. sum/sum,
    * count/sum. Hash aggregation already combines map-side, so this only
    * pays off when per-key partial STATE is the bottleneck (huge
    * collect-style aggs); provided for that case. */
  def twoPhaseSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  saltFactor: Int): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, saltFactor))
    salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__pn"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__pn")).as("n_rows"))
  }
}
