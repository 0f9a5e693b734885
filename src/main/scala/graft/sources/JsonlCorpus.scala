package graft.sources

import java.util.Base64

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Sharded-JSONL corpus exchange — the lingua-franca format at the
  * boundary of a training-data pipeline (docs go out to tokenizers and
  * trainers as compressed JSONL shards; partner corpora come in the same
  * way).
  *
  * What this adds over a bare `df.write.json`:
  *
  *   - **Deterministic sharding**: rows are placed by hash of a caller-
  *     chosen shard key, so the same corpus always produces the same
  *     shard contents — re-exports are diffable and resumable downstream
  *     (consumer N re-reads only shard N), independent of task
  *     scheduling. A `repartition` by key is one shuffle; shard count is
  *     the parallelism knob at 100 TB (4 GB/shard ⇒ ~25 k shards).
  *   - **A manifest** (`_graft_corpus_manifest.json`): schema + row
  *     count + shard key, so readers get the exact schema back (JSON
  *     re-inference widens/reorders types) and row counts are O(1)
  *     metadata, not a decompress-and-scan. Same pattern as
  *     [[graft.sinks.BucketedMergeTarget]]'s manifest.
  *   - **gzip per shard** (codec-splittability doesn't matter here: the
  *     shard IS the parallelism unit).
  *
  * Reference anchor: the reference exchanges table snapshots as SQL dumps
  * (`src/postgres/dump.rs`); a Spark pipeline's exchange format for
  * document corpora is sharded JSONL, re-expressed with the same
  * manifest-first discipline.
  */
object JsonlCorpus {

  private val ManifestName = "_graft_corpus_manifest.json"

  /** Write `df` as `nShards` gzip JSONL shards placed by `hash(shardKey)`,
    * plus the manifest. Returns the row count. The count is one source-
    * side `df.count()` (the DataFrameWriter API surfaces no written-row
    * count, and re-reading gzip shards to count them would pay a full
    * decompress-and-parse pass over the just-written corpus). */
  def write(df: DataFrame, path: String, nShards: Int,
            shardKey: Seq[String]): Long = {
    require(nShards > 0, "nShards must be positive")
    require(shardKey.nonEmpty, "shardKey must name at least one column")
    val spark = df.sparkSession
    val rows = df.count()
    df.repartition(nShards, shardKey.map(df.col): _*)
      .write.mode("overwrite").option("compression", "gzip").json(path)
    val p = new Path(path)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    val schemaB64 = Base64.getEncoder.encodeToString(df.schema.json.getBytes("UTF-8"))
    val keyJson = shardKey.map(k =>
      "\"" + Base64.getEncoder.encodeToString(k.getBytes("UTF-8")) + "\"")
      .mkString("[", ",", "]")
    val json = s"""{"rows":$rows,"nShards":$nShards,"schema":"$schemaB64","shardKey":$keyJson}"""
    val out = f.create(new Path(p, ManifestName), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    rows
  }

  private def manifest(spark: SparkSession, path: String): Option[(Long, Int, StructType)] = {
    val p = new Path(path, ManifestName)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(p)) return None
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    val rows = "\"rows\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
    val shards = "\"nShards\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt)
    val schema = "\"schema\":\"([A-Za-z0-9+/=]*)\"".r.findFirstMatchIn(txt)
      .map(m => DataType.fromJson(
        new String(Base64.getDecoder.decode(m.group(1)), "UTF-8")).asInstanceOf[StructType])
    for (r <- rows; s <- shards; sc <- schema) yield (r, s, sc)
  }

  /** Read a corpus back with its EXPORTED schema (no lossy re-inference —
    * a JSONL round trip without the manifest would widen ints, lose
    * struct field order, and type empty shards as nothing). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val (rows, _, schema) = manifest(spark, path).getOrElse(
      throw new IllegalStateException(s"no corpus manifest under $path"))
    // an empty export writes no .json.gz files at all — the unmatched
    // glob would throw, so serve the (schema-correct) empty frame
    if (rows == 0L)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).json(s"$path/*.json.gz")
  }

  /** Exported row count — manifest metadata, no scan. */
  def rowCount(spark: SparkSession, path: String): Option[Long] =
    manifest(spark, path).map(_._1)
}
