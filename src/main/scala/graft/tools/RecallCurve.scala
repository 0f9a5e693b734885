package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Recall/cost curve sweep for the four ANN index/quantization families — the
  * measurement behind the gated high-recall operating point (round-7
  * verdict "What's missing #1/#2"): for each configuration, mean
  * recall@20 over the ten query vectors and the mean candidate count
  * paid for it.
  *
  *   - SRP-LSH: hPlanes × probeRadius grid (the two knobs of
  *     `lshBucketedTopK`);
  *   - IVF: nProbe 1..cells at anchor-seeded and kmeans centroids;
  *   - PQ: anchor codebooks at m = 8 (the gated regime) and
  *     kmeans-trained m = 8 / k = 16;
  *   - SQ8: per-vector int8 max-abs quantization (no knobs — one point:
  *     the 4x-compression recall floor).
  *
  * Output: one line per config —
  *   `family h/r|nProbe|m  mean_recall  mean_cand  (corpus n)`
  *
  * Usage: runMain graft.tools.RecallCurve [sfDir]
  */
object RecallCurve {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    println(s"corpus $sfDir: $n vectors")

    def report(tag: String, df: org.apache.spark.sql.DataFrame,
               candCol: String): Unit = {
      val r = df.agg(avg(col("recall")), avg(col(candCol))).head()
      println(f"$tag%-24s recall=${r.getDouble(0)}%.3f cand=${r.getDouble(1)}%.1f")
    }

    for (h <- Seq(3, 4, 6, 8); r <- 0 to math.min(3, h))
      report(s"srp h=$h r=$r",
        Similarity.annRecallAtK(e, queries, "vec_id", "embedding",
          "query_id", "qv", k = 20, hPlanes = h, portable = true,
          probeRadius = r), "n_bucket")

    val anchors = e.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    for (p <- 1 to 8)
      report(s"ivf anchor8 nProbe=$p",
        Similarity.ivfRecallAtK(e, queries, "vec_id", "embedding",
          "query_id", "qv", k = 20, anchors, nProbe = p), "n_cand")
    val km = Similarity.kmeansCentroids(e, "embedding", k = 8)
    for (p <- Seq(1, 2, 4, 8))
      report(s"ivf kmeans8 nProbe=$p",
        Similarity.ivfRecallAtK(e, queries, "vec_id", "embedding",
          "query_id", "qv", k = 20, km, nProbe = p), "n_cand")

    val m = 8
    val anchors16 = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val sub = anchors16.head.length / m
    val anchorBooks: Array[Array[Array[Double]]] = (0 until m).map { s =>
      anchors16.map(a => java.util.Arrays.copyOfRange(a, s * sub, (s + 1) * sub))
    }.toArray
    report(s"pq anchor16 m=$m",
      Similarity.pqRecallAtK(e, queries, "vec_id", "embedding",
        "query_id", "qv", k = 20, anchorBooks), "n_cand")
    val trained = Similarity.pqTrain(e, "embedding", m, k = 16)
    report(s"pq kmeans16 m=$m",
      Similarity.pqRecallAtK(e, queries, "vec_id", "embedding",
        "query_id", "qv", k = 20, trained), "n_cand")

    report("sq8 int8",
      Similarity.sq8RecallAtK(e, queries, "vec_id", "embedding",
        "query_id", "qv", k = 20), "n_cand")

    // IVF-residual PQ + exact refine — the gated q_ann_recall_ivfpq
    // operating point plus its knob neighborhood (tools/IvfPqProbe has
    // the full grid)
    val acents = e.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val abooks = Similarity.ivfPqAnchorBooks(e, "vec_id", "embedding",
      acents, m = 8, nBooks = 16)
    for (refine <- Seq(0, 100, 200))
      report(s"ivfpq anchor8/16 m=8 nProbe=4 refine=$refine",
        Similarity.ivfPqRecallAtK(e, queries, "vec_id", "embedding",
          "query_id", "qv", k = 20, acents, abooks, nProbe = 4, refine), "n_cand")

    spark.stop()
  }
}
