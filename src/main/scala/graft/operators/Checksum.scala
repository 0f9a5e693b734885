package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-verification checksums — reference `compute_table_checksum`
  * (`src/migration/checksum.rs:33-111`):
  * `md5(string_agg(row_data, '' ORDER BY row_num))` over
  * `COALESCE("col"::text,'') || '|' || …`, empty table → "empty".
  *
  * Two variants:
  *   - [[orderedChecksum]] — bit-compatible with the reference's ordered
  *     md5-of-concatenation chain. Requires a global sort; keep for
  *     small/medium verification jobs.
  *   - [[unorderedChecksum]] — order-insensitive sum-of-row-hashes. One
  *     map + one partial-aggregable reduce, no sort, no shuffle of data
  *     rows: the variant that survives 100 TB. Equality between two
  *     tables holds iff multiset-of-rows matches (mod 2^64 collisions).
  */
object Checksum {

  /** `COALESCE(col::text,'') || '|' || …` row rendering
    * (`src/migration/checksum.rs:63-68`). */
  def rowText(df: DataFrame): Column =
    concat_ws("|", df.columns.toIndexedSeq.map(c => coalesce(col(c).cast("string"), lit(""))): _*)

  /** Exact reference semantics: md5 over rows concatenated in full-row
    * sort order (the reference's `ROW_NUMBER() OVER (ORDER BY all cols)`,
    * checksum.rs:82). The ordering is applied INSIDE the aggregation
    * (`sort_array(collect_list(...))`) — deterministic under any
    * partitioning, unlike collect_list over pre-sorted input whose
    * partial-buffer merge order Spark does not guarantee. */
  /** Guard for the ordered variant: every row lands in ONE aggregation
    * buffer, so it is only safe for verification-sized tables. Callers
    * needing scale use [[unorderedChecksum]]. */
  val OrderedChecksumMaxRows: Long = 2000000L

  def orderedChecksum(df: DataFrame): DataFrame = {
    val n = df.count()
    require(n <= OrderedChecksumMaxRows,
      s"orderedChecksum collects all rows into one buffer ($n > " +
        s"$OrderedChecksumMaxRows); use unorderedChecksum for large tables")
    val rows = df.select(rowText(df).as("row_data"))
    val agged = rows.agg(
      md5(to_binary(array_join(sort_array(collect_list(col("row_data"))), ""),
                    lit("utf-8"))).as("checksum"),
      count(lit(1)).as("row_count"))
    // empty table → "empty" (checksum.rs:102-106)
    agged.select(
      when(col("row_count") === 0, lit("empty")).otherwise(col("checksum")).as("checksum"),
      col("row_count"))
  }

  /** Scalable order-insensitive checksum: per-row 64-bit hash (xxhash64 of
    * the rendered row text), summed as DECIMAL(38,0) — a long sum of
    * 2^63-scale hashes overflows immediately under Spark 4's ANSI mode,
    * and the decimal sum stays exact to ~10^19 rows. Commutative +
    * associative → map-side partial aggregation, no ordering requirement,
    * no data movement beyond one value per partition. */
  def unorderedChecksum(df: DataFrame): DataFrame =
    df.select(xxhash64(rowText(df)).cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("h"))
      .agg(
        sum(col("h")).as("hash_sum"),
        count(lit(1)).as("row_count"))

  /** Source/target comparison — the `verify` command's per-table compare
    * (`src/migration/checksum.rs:114-142`): counts AND checksums equal. */
  def tablesMatch(source: DataFrame, target: DataFrame): Boolean = {
    val s = unorderedChecksum(source).head()
    val t = unorderedChecksum(target).head()
    s.getLong(1) == t.getLong(1) &&
      (s.getLong(1) == 0L || s.get(0) == t.get(0))
  }
}
