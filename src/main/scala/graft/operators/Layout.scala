package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering: Z-order (Morton-curve) writes for
  * multi-column file/row-group pruning.
  *
  * A table sorted by one column prunes scans on THAT column perfectly
  * and on every other column not at all — each written file's min/max
  * range for the other columns spans the whole domain. Interleaving the
  * bits of two rank-bucketed columns into one Morton value and
  * range-partitioning + sorting by it keeps every file's bounding
  * rectangle tight in BOTH dimensions, so parquet min/max statistics
  * prune selective predicates on either column (or both) to ~√(files)
  * instead of all of them. This is the standard layout trick behind
  * `OPTIMIZE ZORDER BY` in manifest-log table formats, expressed here as
  * plain DataFrame transforms: two driver-side min/max lookups, a
  * codegen'd bit-interleave projection, `repartitionByRange` on the
  * Morton value, and a within-partition sort — one shuffle, no custom
  * writer.
  *
  * Bucketing is uniform between the observed min and max (`width_bucket`
  * into 2¹⁶ cells per dimension). Heavily skewed columns would
  * concentrate buckets — rank/quantile bucketing drops in by replacing
  * the bucket expression — but uniform is the right default for the
  * time/id/metric columns layout clustering targets.
  */
object Layout {

  /** Bits per dimension; two dimensions interleave into 32 bits. */
  val DimBits = 16

  /** Morton interleave of two already-bucketed ints in [0, 2¹⁶):
    * bit i of `a` lands at 2i+1, bit i of `b` at 2i — a pure
    * shift/and/or expression tree, fully inside whole-stage codegen. */
  def interleave(a: Column, b: Column): Column =
    (0 until DimBits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1)).cast("long"), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1)).cast("long"), 2 * i))
    }

  /** `df` plus a `zval` column: the Morton value of `colA` × `colB`,
    * each uniform-bucketed into 2¹⁶ cells between its observed min and
    * max (one tiny driver-side agg — metadata, not data). Constant
    * columns bucket to 0 and degrade gracefully to a 1-D order. */
  def withZValue(df: DataFrame, colA: String, colB: String): DataFrame = {
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    def bucket(c: String, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0)
      else least(
        (((col(c).cast("double") - lit(lo)) / lit(hi - lo)) * (1 << DimBits))
          .cast("int"),
        lit((1 << DimBits) - 1))
    df.withColumn("zval",
      interleave(bucket(colA, r.getDouble(0), r.getDouble(1)),
                 bucket(colB, r.getDouble(2), r.getDouble(3))))
  }

  /** Write `df` Z-ordered on (colA, colB) into ~`nFiles` parquet files
    * (rounded up to a power of two): partition on the TOP bits of the
    * Morton value — not sampled ranges of the raw value, whose
    * boundaries land mid-cell and let one file's bounding box straddle
    * curve cells — so every file holds whole curve cells and its
    * per-column min/max stays tight. Sort within partitions by the full
    * value, drop the scratch columns. One shuffle; file count chosen by
    * the caller to target row-group-sized files. */
  def zorderWrite(df: DataFrame, colA: String, colB: String,
                  path: String, nFiles: Int): Unit =
    zorderFrame(df, colA, colB, nFiles)
      .write.mode("overwrite").parquet(path)

  /** The frame [[zorderWrite]] writes — exposed so the plan (exactly one
    * range exchange on the cell id, in-partition sort, no extra shuffle)
    * can be pinned by tests. */
  def zorderFrame(df: DataFrame, colA: String, colB: String,
                  nFiles: Int): DataFrame = {
    require(nFiles >= 1 && nFiles <= (1 << 30), s"nFiles=$nFiles out of range")
    val bits = if (nFiles == 1) 0 else 32 - Integer.numberOfLeadingZeros(nFiles - 1)
    withZValue(df, colA, colB)
      .withColumn("__zfile", shiftright(col("zval"), 2 * DimBits - bits))
      .repartitionByRange(1 << bits, col("__zfile"))
      .sortWithinPartitions("zval")
      .drop("zval", "__zfile")
  }

  /** Per-file min/max bounds of `cols` for the parquet under `path` —
    * exactly the statistics a scan's file/row-group pruning consults.
    * One row per file: (file, min_c1, max_c1, min_c2, max_c2, …). */
  def fileBounds(spark: org.apache.spark.sql.SparkSession, path: String,
                 cols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(cols.head)).as(s"min_${cols.head}"),
           (max(col(cols.head)).as(s"max_${cols.head}") +:
             cols.tail.flatMap(c =>
               Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))): _*)
}
