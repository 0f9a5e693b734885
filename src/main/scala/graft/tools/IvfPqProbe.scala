package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Operating-point probe for the PQ family: mean recall@20 across the
  * (m, k, residual?, nProbe) grid, over the standard 10-query harness
  * regime. Prints one line per point — the measurement that picks which
  * point q_ann_recall_ivfpq gates and SCALE.md records.
  *
  * Usage: runMain graft.tools.IvfPqProbe <sfDir>
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]").appName("ivfpq-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

    def mean(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.agg(avg("recall"), avg("n_cand")).head()
      (math.rint(r.getDouble(0) * 1000) / 1000, math.rint(r.getDouble(1)))
    }

    val dim = 64
    for (m <- Seq(8, 16); k <- Seq(16, 64, 256)) {
      val t0 = System.nanoTime()
      val books = Similarity.pqTrain(e, "embedding", m, k)
      val (rec, nc) = mean(Similarity.pqRecallAtK(e, queries, "vec_id", "embedding",
        "query_id", "qv", k = 20, books))
      val bytes = m * (if (k <= 16) 0.5 else 1.0)
      println(f"pq      m=$m%2d k=$k%3d  recall@20=$rec%.3f n_cand=$nc%.0f  ${dim * 4 / bytes}%.0fx  ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    val cents = Similarity.kmeansCentroids(e, "embedding", k = 8)
    for (m <- Seq(8, 16); k <- Seq(16, 64, 256); nProbe <- Seq(4, 8)) {
      val t0 = System.nanoTime()
      val books = Similarity.ivfPqTrain(e, "embedding", cents, m, k)
      val (rec, nc) = mean(Similarity.ivfPqRecallAtK(e, queries, "vec_id", "embedding",
        "query_id", "qv", k = 20, cents, books, nProbe))
      val bytes = 1 + m * (if (k <= 16) 0.5 else 1.0)
      println(f"ivfpq   m=$m%2d k=$k%3d p=$nProbe  recall@20=$rec%.3f n_cand=$nc%.0f  ${dim * 4 / bytes}%.0fx  ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    // refine stage: ADC shortlist + exact re-rank over the shortlist only
    for (m <- Seq(8, 16); k <- Seq(16, 64); refine <- Seq(50, 100, 200)) {
      val t0 = System.nanoTime()
      val books = Similarity.ivfPqTrain(e, "embedding", cents, m, k)
      val (rec, nc) = mean(Similarity.ivfPqRecallAtK(e, queries, "vec_id", "embedding",
        "query_id", "qv", k = 20, cents, books, nProbe = 8, refine = refine))
      val bytes = 1 + m * (if (k <= 16) 0.5 else 1.0)
      println(f"ivfpq+r m=$m%2d k=$k%3d r=$refine%3d  recall@20=$rec%.3f n_cand=$nc%.0f  ${dim * 4 / bytes}%.0fx  ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    // the SQL-replayable ANCHOR regime (what a gate can oracle): anchor-8
    // centroids, anchor residual codebooks from the first 16/64 vectors
    val anchorCents = e.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    for (m <- Seq(8); nBooks <- Seq(16, 64); nProbe <- Seq(4, 8); refine <- Seq(100, 200)) {
      val t0 = System.nanoTime()
      val books = Similarity.ivfPqAnchorBooks(e, "vec_id", "embedding",
        anchorCents, m, nBooks)
      val (rec, nc) = mean(Similarity.ivfPqRecallAtK(e, queries, "vec_id", "embedding",
        "query_id", "qv", k = 20, anchorCents, books, nProbe, refine))
      println(f"anchor  m=$m%2d k=$nBooks%3d p=$nProbe r=$refine%3d  recall@20=$rec%.3f n_cand=$nc%.0f  ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    // OPQ-lite (random orthonormal rotation, Ge '13 §4 baseline): the
    // same anchor chain run entirely in rotated space — L2 geometry is
    // unchanged, but the m contiguous PQ slices now each mix every
    // input dim, so per-subspace variance equalizes.
    val rot = Similarity.randomRotation(dim, seed = 42L)
    val eR = Similarity.withRotated(e, "embedding", rot, "__r")
      .select(col("vec_id"), col("__r").as("embedding"))
    val qR = Similarity.withRotated(queries, "qv", rot, "__r")
      .select(col("query_id"), col("__r").as("qv"))
    val anchorCentsR = eR.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Double](0).toArray)
    for (m <- Seq(8); nBooks <- Seq(16, 64); nProbe <- Seq(4, 8); refine <- Seq(100, 200)) {
      val t0 = System.nanoTime()
      val books = Similarity.ivfPqAnchorBooks(eR, "vec_id", "embedding",
        anchorCentsR, m, nBooks)
      val (rec, nc) = mean(Similarity.ivfPqRecallAtK(eR, qR, "vec_id", "embedding",
        "query_id", "qv", k = 20, anchorCentsR, books, nProbe, refine))
      println(f"opq-anc m=$m%2d k=$nBooks%3d p=$nProbe r=$refine%3d  recall@20=$rec%.3f n_cand=$nc%.0f  ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    // rotation under the TRAINED regime (kmeans cells + trained books)
    val centsR = Similarity.kmeansCentroids(eR, "embedding", k = 8)
    for (m <- Seq(8, 16); k <- Seq(16, 64); refine <- Seq(0, 200)) {
      val t0 = System.nanoTime()
      val books = Similarity.ivfPqTrain(eR, "embedding", centsR, m, k)
      val (rec, nc) = mean(Similarity.ivfPqRecallAtK(eR, qR, "vec_id", "embedding",
        "query_id", "qv", k = 20, centsR, books, nProbe = 8, refine = refine))
      val bytes = 1 + m * (if (k <= 16) 0.5 else 1.0)
      println(f"opq-ivf m=$m%2d k=$k%3d r=$refine%3d  recall@20=$rec%.3f n_cand=$nc%.0f  ${dim * 4 / bytes}%.0fx  ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
