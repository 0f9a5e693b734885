package graft.types

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ID extraction for the JSONB document model — reference
  * `src/sqlite/converter.rs:209-297` (SQLite),
  * `src/mongodb/converter.rs:236-260` (Mongo),
  * `src/mysql/converter.rs:263-276` (MySQL):
  *
  *   1. declared single-column PK → that column;
  *   2. heuristic candidate (`id`/`rowid`/`_id`, case-insensitive) — used
  *      only if verified unique via `COUNT(*) == COUNT(DISTINCT col)`;
  *   3. fallback: stable 1-based row number.
  *
  * Scale note: the row-number fallback is a single global window — fine for
  * the reference's per-table loads, a bottleneck at 100 TB. [[rowNumberIds]]
  * therefore uses zipWithIndex-style partition offsets (two passes, no
  * global shuffle-to-one) rather than `row_number() OVER (ORDER BY …)`.
  */
object IdExtraction {

  private val candidates = Seq("id", "rowid", "_id")

  /** First `id|rowid|_id` column present (case-insensitive),
    * reference `src/sqlite/converter.rs:240-260`. */
  def heuristicCandidate(df: DataFrame): Option[String] =
    candidates.flatMap(c => df.columns.find(_.equalsIgnoreCase(c))).headOption

  /** `COUNT(*) == COUNT(DISTINCT col)` exact uniqueness test
    * (`column_is_unique` `src/sqlite/converter.rs:278-297`). Exact — the
    * reference semantics forbid approx_count_distinct here. */
  def columnIsUnique(df: DataFrame, column: String): Boolean = {
    val r = df.agg(
      count(lit(1)).as("n"),
      count_distinct(col(column)).as("d"),
      count(col(column)).as("nn")).head()
    // null ids would collide after cast; require no nulls AND all distinct
    r.getLong(0) == r.getLong(1) && r.getLong(0) == r.getLong(2)
  }

  /** Stable 1-based row numbers in `orderCols` order without a single-
    * partition global window: sort, then add per-partition offsets
    * (computed from partition sizes) to the intra-partition index.
    * Range-partitioned sort keeps order across partitions, so
    * offset+local-index == global row_number. */
  def rowNumberIds(df: DataFrame, orderCols: Seq[Column]): DataFrame = {
    val sorted = df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*)
    val withLocal = sorted.withColumn("__pidx", spark_partition_id())
    // partition sizes are tiny metadata (one row per partition) → collect is safe
    val sizes = withLocal.groupBy(col("__pidx")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = sizes.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
      .sliding(2).collect { case Array((_, off), (pid, _)) => (pid, off) }.toMap
    val offsetsAdjusted =
      if (sizes.isEmpty) Map.empty[Int, Long]
      else Map(sizes.head._1 -> 0L) ++ offsets
    val offCol = offsetsAdjusted.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("__pidx") === pid, lit(off)).otherwise(acc)
    }
    val w = Window.partitionBy(col("__pidx")).orderBy(orderCols: _*)
    withLocal
      .withColumn("__rid", row_number().over(w).cast("long") + offCol)
      .drop("__pidx")
  }

  /** Full extraction pipeline: returns (frame-with-`__id`-column, idColumnName).
    * `declaredPk` = single-column PK if the catalog declared one. */
  def withId(df: DataFrame, declaredPk: Option[String]): (DataFrame, String) =
    declaredPk match {
      case Some(pk) => (df.withColumn("__id", col(pk).cast("string")), pk)
      case None =>
        heuristicCandidate(df) match {
          case Some(c) if columnIsUnique(df, c) =>
            (df.withColumn("__id", col(c).cast("string")), c)
          case _ =>
            val ordered = rowNumberIds(df, df.columns.toSeq.map(col))
            (ordered.withColumn("__id", col("__rid").cast("string")).drop("__rid"),
             "<row_number>")
        }
    }
}
