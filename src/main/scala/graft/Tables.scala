package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Testdata table loaders shared by the query maps. */
object Tables {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in two physical encodings across fixture
    * generations, so branch on the dtype the scan actually produces:
    *   - parquet TIMESTAMP(NANOS): Spark 4 rejects it outright unless read
    *     as raw int64 nanos (`nanosAsLong`, set below — a no-op for other
    *     encodings); floor-divide to micros (exact, and identical to
    *     DuckDB's nanos→micros truncation) and rebuild a TimestampType
    *     column via `timestamp_micros`;
    *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as
    *     TIMESTAMP_NTZ; cast to TimestampType so downstream types (and the
    *     driver's oracle schema compare) match what `timestamp_micros`
    *     produced — value-identical because the session timezone is UTC.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => sys.error(s"events.ts: unsupported parquet type $other")
    }
  }
}
