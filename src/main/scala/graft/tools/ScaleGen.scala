package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: scale an existing test-data sf directory UP by an integer
  * multiplier, for the time-vs-sf scaling curves in SCALE.md. The driver's
  * generated dirs stop at sf0.1; this replays sf0.1 `m` times with
  * disjoint key spaces so operator cost curves can be measured at sf0.3 /
  * sf1 equivalents.
  *
  * Replication rules (replica r of m, r = 0 is the original):
  *   - dimension tables (`region`, `nation`) copy once — like TPC-H, they
  *     do not grow with sf;
  *   - every fact/entity key is offset by `r * stride` with strides large
  *     enough that replica key ranges (and the +100000/+500000/+700000
  *     planted-id spaces the registered dedup queries add at query time)
  *     never collide;
  *   - `documents.text` gets a per-replica suffix on EVERY token (r>0), so
  *     replicas are never near-duplicates of each other: without this,
  *     each doc would gain m exact copies and the pair space would grow
  *     quadratically in m — an artifact of cloning, not a property of the
  *     operators being measured. Internal near-dup structure (what the
  *     queries plant per corpus) is preserved exactly;
  *   - `embeddings.embedding` is rotated by r positions — same norm and
  *     distribution, different direction, so replicas do not become
  *     planted cosine duplicates (cosine(v, rot(v)) ≈ 0 for random v).
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <outDir> <multiplier>
  */
object ScaleGen {

  /** Tables whose size is sf-invariant. */
  private val DimTables = Set("region", "nation")

  private val AllTables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Key columns to offset per table, with a fixed stride each (strides
    * are powers of ten comfortably above the sf0.1 max key AND above the
    * planted-id offsets used by registered queries). */
  private val KeyStrides: Map[String, Seq[(String, Long)]] = Map(
    "customer"   -> Seq("c_custkey" -> 1000000L),
    "supplier"   -> Seq("s_suppkey" -> 1000000L),
    "part"       -> Seq("p_partkey" -> 1000000L),
    "orders"     -> Seq("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L),
    "lineitem"   -> Seq("l_orderkey" -> 10000000L, "l_partkey" -> 1000000L,
                        "l_suppkey" -> 1000000L),
    "events"     -> Seq("event_id" -> 10000000L, "user_id" -> 1000000L),
    "documents"  -> Seq("doc_id" -> 10000000L),
    "embeddings" -> Seq("vec_id" -> 1000000L)
  )

  private def replicate(df: DataFrame, table: String, m: Int): DataFrame = {
    val replicas = (0 until m).map { r =>
      val keyed = KeyStrides.getOrElse(table, Nil).foldLeft(df) {
        case (d, (k, stride)) => d.withColumn(k, col(k) + lit(r * stride))
      }
      table match {
        case "documents" if r > 0 =>
          // suffix every token: replicas share zero word n-grams
          keyed.withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1_r$r"))
        case "embeddings" if r > 0 =>
          // rotate the vector by r mod its length (the fixture dim is 64,
          // so multipliers above 64 wrap); when the rotation wraps past a
          // full turn, apply a per-wrap-count deterministic ±1 sign mask
          // (xxhash64 of "dim:wraps" → flips ~half the dims) — a plain
          // whole-vector negation has period 2, so replica r+128 would be
          // an exact clone of replica r and replant the cosine-1 cloning
          // artifact at multipliers ≥ 129. Distinct hash masks per wrap
          // count keep every replica's DIRECTION distinct (expected
          // cosine ≈ 0 between wrap generations) for unbounded m, while
          // preserving the norm the ANN/semantic-dedup queries use.
          val rot = expr(s"""
            transform(
              concat(slice(embedding, $r % size(embedding) + 1,
                           size(embedding) - $r % size(embedding)),
                     slice(embedding, 1, $r % size(embedding))),
              (x, i) -> x * (CASE WHEN int($r / size(embedding)) = 0
                THEN cast(1.0 as float)
                ELSE cast(1 - 2 * pmod(xxhash64(concat(cast(i as string), ':',
                       cast(int($r / size(embedding)) as string))), 2) as float)
                END))""")
          keyed.withColumn("embedding", rot)
        case _ => keyed
      }
    }
    replicas.reduce(_.unionByName(_))
  }

  def scaleTable(spark: SparkSession, srcDir: String, outDir: String,
                 table: String, m: Int): Long = {
    val src = spark.read.parquet(s"$srcDir/$table.parquet")
    val out = if (DimTables.contains(table) || m == 1) src else replicate(src, table, m)
    out.write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    spark.read.parquet(s"$outDir/$table.parquet").count()
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, mult) = args
    val m = mult.toInt
    require(m >= 1, "multiplier must be >= 1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    // events.ts has shipped as TIMESTAMP(NANOS) or TIMESTAMP(MICROS)
    // across fixture generations; nanosAsLong makes the nanos variant
    // readable (as int64) and is a no-op for micros. The scaled copy
    // keeps the source encoding either way — Tables.events branches on
    // the dtype at read time, so both survive the round trip.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    AllTables.foreach { t =>
      val n = scaleTable(spark, srcDir, outDir, t, m)
      println(s"[scalegen] $t: $n rows")
    }
    spark.stop()
  }
}
