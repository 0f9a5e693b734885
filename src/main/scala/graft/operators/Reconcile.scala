package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delete-reconciliation — the reference's orphan detection:
  *   - J1 hash anti-join (`Reconciler::find_orphaned_rows`
  *     `src/xmin/reconciler.rs:45-78`): target PKs not present in source.
  *   - J2 streaming sort-merge anti-join (`reconcile_table_batched`
  *     `:223-386`) — Spark's sort-merge `left_anti` IS this operator;
  *     no manual keyset pagination needed.
  *
  * The text-cast ordering invariant (`reconciler.rs:469-475`, a documented
  * data-loss bug class): both sides' PKs are cast to STRING before
  * comparison so ordering/equality semantics are identical regardless of
  * source column types. We keep that lesson.
  *
  * Scale: anti-join shuffles both sides on the PK. Only PK columns are
  * projected before the join (column pruning → minimal shuffle payload);
  * if the source side is small, Catalyst/AQE picks broadcast automatically.
  */
object Reconcile {

  /** Normalize PK columns to text on both sides (the `::text` invariant). */
  private def pkNormalized(df: DataFrame, pkCols: Seq[String]): DataFrame =
    df.select(pkCols.map(c => col(c).cast("string").as(c)): _*)

  /** PKs present in target but not in source → rows to delete downstream.
    * Exactly `target EXCEPT source` on the PK projection. */
  def orphanedKeys(source: DataFrame, target: DataFrame, pkCols: Seq[String]): DataFrame =
    pkNormalized(target, pkCols)
      .join(pkNormalized(source, pkCols), pkCols, "left_anti")

  /** Count + keys, the reference's per-table reconcile report
    * (`reconcile_table` `src/xmin/reconciler.rs:87-126`). */
  def reconcile(source: DataFrame, target: DataFrame, pkCols: Seq[String]): (Long, DataFrame) = {
    val orphans = orphanedKeys(source, target, pkCols)
    (orphans.count(), orphans)
  }
}
