package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** One-off operating-point sweep for upgrading the q_ann_recall_ivfpq
  * gate: anchor regime (SQL-replayable) at deeper refine / wider books,
  * keeping nProbe=4 so row pruning stays demonstrated. */
object AnchorPointProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]").appName("anchor-point-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val anchorCents = e.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val trained = Similarity.kmeansCentroids(e, "embedding", k = 8)
    for (k <- Seq(16, 64); nProbe <- Seq(4, 5, 6); refine <- Seq(200)) {
      val books = Similarity.ivfPqTrain(e, "embedding", trained, m = 8, k)
      val r = Similarity.ivfPqRecallAtK(e, queries, "vec_id", "embedding",
        "query_id", "qv", k = 20, trained, books, nProbe, refine)
        .agg(avg("recall"), avg("n_cand")).head()
      println(f"trained m=8 k=$k%3d p=$nProbe r=$refine%3d  recall@20=${r.getDouble(0)}%.3f n_cand=${r.getDouble(1)}%.0f")
    }
    spark.stop()
  }
}
