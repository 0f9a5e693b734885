package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins — operators the reference engine lacks entirely (its
  * joins are reconciliation plumbing, SURVEY §2.4) but that event data
  * makes essential. Spark has no native as-of join; the naive encoding
  * (`l.ts >= r.ts` range join + groupBy max) explodes to
  * O(|L|·|R|/keys) intermediate rows before pruning. This implementation
  * is the scalable union-scan form:
  *
  *   1. tag right rows side=0, left rows side=1, align schemas;
  *   2. ONE shuffle: partition by key, order by (ts, side) — right
  *      sorts before left at equal ts, making the match inclusive;
  *   3. running `last(value, ignoreNulls)` over the ordered partition
  *      carries the newest right value forward to each left row;
  *   4. keep the left rows.
  *
  * Cost: one shuffle of |L| + |R| rows and a linear pass — the same
  * asymptotics as a sort-merge join, with no intermediate blowup at any
  * key/time distribution. Skewed keys salt like any other shuffle.
  */
object TemporalJoin {

  /** For each left row, attach the newest `rightValCol` from `right`
    * with `right.ts <= left.ts` on the same `keys` (inclusive as-of
    * backward join). Left rows with no prior right row get NULL.
    *
    * `right` must be unique per (keys, ts) — pre-aggregate ties (e.g.
    * `groupBy(keys, ts).agg(max(id))`) so "the newest right row" is
    * well-defined; this operator cannot guess a tiebreak for arbitrary
    * payloads. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightValCol: String, outCol: String): DataFrame = {
    // the union-scan encoding owns these scratch names; silently replacing
    // a caller column (withColumn semantics) would corrupt the result
    Seq("__side", "__rv").foreach { n =>
      require(!left.columns.contains(n) && !right.columns.contains(n),
        s"asofJoin reserves column name '$n' — rename it on the input")
    }
    require(!left.columns.contains(outCol),
      s"outCol '$outCol' already exists on the left frame — pick a fresh name")
    val leftCols = left.columns.toSeq
    val valType = right.schema(rightValCol).dataType
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(valType))
    val r0 = right
      .select((keys.map(col) :+ col(tsCol) :+ col(rightValCol).as("__rv")): _*)
      .withColumn("__side", lit(0))
    // align the right frame to the left's schema (left-only columns null)
    val rAligned = leftCols.foldLeft(r0) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val ordered = Seq(col(tsCol).asc, col("__side").asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordered: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rAligned.select((leftCols.map(col) :+ col("__side") :+ col("__rv")): _*)
      .unionByName(l.select((leftCols.map(col) :+ col("__side") :+ col("__rv")): _*))
      .withColumn(outCol, last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rv")
  }

  /** Time-bucketed range join: pairs (l, r) on the same `keys` with
    * `r.ts` in `[l.ts - before, l.ts]`. Implemented by joining on
    * coarse time buckets of width `before` (each left row probes its own
    * and the previous bucket) so the join never considers pairs more
    * than one bucket apart — the standard bucketed range-join rewrite
    * that keeps the pair space O(matches), not O(|L|·|R|/keys). */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                tsCol: String, beforeSeconds: Long,
                rightValCol: String, outCol: String): DataFrame = {
    require(beforeSeconds > 0, "window must be positive")
    val lb = left.withColumn("__b",
      floor(unix_timestamp(col(tsCol)) / beforeSeconds).cast("long"))
    val probe = lb.withColumn("__pb", explode(array(col("__b") - 1, col("__b"))))
    val rb = right
      .select((keys.map(col) :+ col(tsCol).as("__rts") :+ col(rightValCol).as(outCol)): _*)
      .withColumn("__pb", floor(unix_timestamp(col("__rts")) / beforeSeconds).cast("long"))
    // each (left, right) pair meets in exactly one bucket (the right
    // row's own), so no dedup is needed — or legal (two right rows with
    // equal payloads are two genuine matches)
    probe.join(rb, keys :+ "__pb")
      .filter(col("__rts") <= col(tsCol) &&
        col("__rts") >= col(tsCol) - expr(s"INTERVAL $beforeSeconds SECONDS"))
      .drop("__b", "__pb", "__rts")
  }
}
