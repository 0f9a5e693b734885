package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev measurement behind `pairwiseCosineCandidatesAuto`'s plane-sizing
  * rule: times the all-pairs cosine candidate scan over an sf dir's
  * embeddings (plus planted 2x-scaled duplicates, the q_cosine_pairs
  * corpus) at a FIXED plane count vs the corpus-sized AUTO count, and
  * reports wall seconds, pair counts, and the planted-pair recall of
  * each — the evidence that the auto sizing pays ~linear pair work for
  * the same detected duplicates (SCALE.md "Similarity search").
  *
  * Usage: runMain graft.tools.PairSizing <sfDir> [fixedH] [targetBucket]
  */
object PairSizing {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val fixedH = if (args.length > 1) args(1).toInt else 8
    val target = if (args.length > 2) args(2).toInt else 256
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = e.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val planted = e.select((col("vec_id") + 10000000L).as("vec_id"),
      transform(col("embedding"), x => x.cast("double") * lit(2.0)).as("embedding"))
    val corpus = base.unionAll(planted)
    val nBase = base.count()

    def run(tag: String, pairs: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = pairs.select(col("id_a"), col("id_b")).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val plantedHits = rows.count(r => r.getLong(1) == r.getLong(0) + 10000000L)
      println(f"[pairsizing] $tag%-12s ${sec}%8.1f s  pairs=${rows.length}%9d  planted=$plantedHits/$nBase")
    }
    run(s"fixed h=$fixedH", Similarity.pairwiseCosineCandidates(corpus,
      "vec_id", "embedding", threshold = 0.99, hPlanes = fixedH,
      portable = true, maxBucket = 10000))
    run(s"auto t=$target", Similarity.pairwiseCosineCandidatesAuto(corpus,
      "vec_id", "embedding", threshold = 0.99, targetBucket = target,
      portable = true, maxBucket = 10000))
    spark.stop()
  }
}
