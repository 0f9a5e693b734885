package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 re-expressed
  * Spark-first; [[oracleSql]] carries the DuckDB-equivalent SQL the driver
  * uses as a correctness oracle at sf0.01.
  *
  * Determinism rules applied throughout (so the value-hash compare passes):
  *   - money/quantity sums go through explicit DECIMAL casts (exact,
  *     order-independent) instead of floating-point sums;
  *   - every aggregate / computed column is aliased identically here and in
  *     the oracle SQL;
  *   - result sets avoid nondeterministic orderings (unique sort keys or no
  *     reliance on order at all).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val dec = DecimalType(18, 2)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesRelational.queries ++ QueriesPipeline.queries ++ Map(
    // A1/A5-style pricing summary (TPC-H Q1 shape) over lineitem.
    // Decimal-exact sums (order-independent under any partitioning), then a
    // final cast to DOUBLE on BOTH sides: the exact decimal sums are equal,
    // so the IEEE754 doubles are bit-identical, and the driver's value-hash
    // sees the same canonical value regardless of how each engine renders
    // its native decimal result types (the round-1 hash-mismatch cause).
    "q1_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val qty   = col("l_quantity").cast(dec)
      val price = col("l_extendedprice").cast(dec)
      val disc  = col("l_discount").cast(dec)
      val tax   = col("l_tax").cast(dec)
      val discPrice = (price * (lit(1).cast(dec) - disc)).cast(DecimalType(18, 4))
      li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(qty).cast(DoubleType).as("sum_qty"),
          sum(price).cast(DoubleType).as("sum_base_price"),
          sum(discPrice).cast(DoubleType).as("sum_disc_price"),
          sum((discPrice * (lit(1).cast(dec) + tax)).cast(DecimalType(18, 6)))
            .cast(DoubleType).as("sum_charge"),
          count(lit(1)).as("count_order")
        )
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueriesRelational.oracleSql ++ QueriesPipeline.oracleSql ++ Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
