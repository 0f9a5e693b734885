package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-dtype canary for `Tables.events`: the driver has shipped
  * `events.ts` as parquet TIMESTAMP(NANOS) (read as int64 nanos under the
  * legacy flag) and as TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ) across
  * fixture generations — round 6 lost 17 oracle queries because the loader
  * only handled the first. This spec writes the same rows in all three
  * encodings `Tables.events` claims to support and pins that every one
  * loads, yields TimestampType, and produces identical values — so a
  * future fixture regeneration flips a named test here, not 17 opaque
  * driver gates.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 2024-03-01T00:00:00 plus offsets, in micros (exact in all encodings)
  private val microsUtc = Seq(1709251200000000L, 1709251260500000L, 1709337599999999L)

  private def writeFixture(encode: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("tables-spec-").toString
    val base = microsUtc.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
    encode(base).select("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def load(dir: String) = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      s"Tables.events must normalize ts to TimestampType (got ${df.schema("ts").dataType})")
    df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").as[(Long, Long)].collect().toSeq
  }

  private val expected = microsUtc.zipWithIndex.map { case (us, i) => (i.toLong, us) }

  test("events loads int64-nanos fixture (legacy TIMESTAMP(NANOS) read shape)") {
    // a raw long column is exactly what the nanosAsLong scan produces
    val dir = writeFixture(_.withColumn("ts", col("us") * 1000L))
    val df = spark.read.parquet(s"$dir/events.parquet")
    assert(df.schema("ts").dataType === LongType)
    assert(load(dir) === expected)
  }

  test("events loads micros TIMESTAMP_NTZ fixture (driver's regenerated shape)") {
    val dir = writeFixture(
      _.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType)))
    val df = spark.read.parquet(s"$dir/events.parquet")
    assert(df.schema("ts").dataType === TimestampNTZType)
    assert(load(dir) === expected)
  }

  test("events passes a plain TimestampType fixture through unchanged") {
    val dir = writeFixture(_.withColumn("ts", timestamp_micros(col("us"))))
    assert(load(dir) === expected)
  }

  test("all three encodings agree with the live driver fixture's dtype branch") {
    // the actual driver fixture must load through one of the pinned branches
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1L)
  }
}
