package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Incremental SemDeDup: batches cleaned against the survivor store
  * must (a) degenerate to the one-shot operator when the whole corpus
  * arrives as one batch, (b) enforce store seniority across arrivals in
  * either direction, and (c) go inert on over-cap buckets. */
class IncrementalSemanticSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private val p = IncrementalSemantic.SrpParams(
    hPlanes = 4, threshold = 0.99, portable = true, maxBucket = 100)

  /** Near-one-hot direction per group g (32-dim): distinct groups sit
    * at cosine ≈ 0.02, far below any threshold, while exact
    * power-of-two scales of one group hit rounded cosine 1 in the same
    * SRP bucket (positive scales preserve every sign bit). */
  private def vec(g: Int, scale: Double): Array[Double] =
    Array.tabulate(32)(d => (if (d == g) 1.0 else 0.01) * scale)

  private def df(rows: Seq[(Long, Array[Double])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
  }

  private def store(): String =
    Files.createTempDirectory("semdinc").resolve("vecs").toString

  private def kept(verdict: DataFrame): Set[Long] =
    verdict.filter(col("kept")).select("vec_id")
      .collect().map(_.getLong(0)).toSet

  test("one-batch ingest degenerates to the one-shot operator") {
    // groups 0..9; members: original i, x2 copy i+100, x0.25 copy i+200
    val rows = (0L until 10L).flatMap { i =>
      Seq((i, vec(i.toInt, 1.0)), (i + 100, vec(i.toInt, 2.0)),
        (i + 200, vec(i.toInt, 0.25)))
    }
    val corpus = df(rows)
    val verdict = IncrementalSemantic.ingestBatch(
      corpus, "vec_id", "embedding", store(), 0L, p, nBuckets = 8)
    val oneShot = {
      val pairs = Similarity.pairwiseCosineCandidates(corpus, "vec_id",
        "embedding", threshold = p.threshold, hPlanes = p.hPlanes,
        portable = p.portable, maxBucket = p.maxBucket)
      val dropped = pairs.select(col("id_b")).distinct()
        .collect().map(_.getLong(0)).toSet
      rows.map(_._1).toSet -- dropped
    }
    assert(kept(verdict) === oneShot)
    // and the rule is visible: every group keeps exactly its original
    assert(kept(verdict) === (0L until 10L).toSet)
  }

  test("store seniority kills later arrivals; survivors-only store") {
    val st = store()
    // batch 0: originals 0..4
    val b0 = df((0L until 5L).map(i => (i, vec(i.toInt, 1.0))))
    val v0 = IncrementalSemantic.ingestBatch(b0, "vec_id", "embedding", st, 0L, p, 8)
    assert(kept(v0) === (0L until 5L).toSet)
    // batch 1: x2 copies of 0..2 (die via store), novel groups 20..21
    val b1 = df((0L until 3L).map(i => (i + 100, vec(i.toInt, 2.0))) ++
      Seq((20L, vec(20, 1.0)), (21L, vec(21, 1.0))))
    val v1 = IncrementalSemantic.ingestBatch(b1, "vec_id", "embedding", st, 1L, p, 8)
    assert(kept(v1) === Set(20L, 21L))
    // batch 2: a copy of a batch-1 DROPPED vector's group still dies —
    // its KEEPER (the batch-0 original) represents the group in the
    // store; and a copy of a batch-1 survivor dies too
    val b2 = df(Seq((300L, vec(1, 4.0)), (320L, vec(20, 0.5)),
      (30L, vec(30, 1.0))))
    val v2 = IncrementalSemantic.ingestBatch(b2, "vec_id", "embedding", st, 2L, p, 8)
    assert(kept(v2) === Set(30L))
  }

  test("driver-side queryBucket matches the executor expression bit-for-bit") {
    val s = spark
    import s.implicits._
    val vecs = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val pp = IncrementalSemantic.SrpParams(hPlanes = 7, threshold = 0.99)
    val dim = vecs.head._2.length
    val fromExpr = vecs.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "v")
      .select(col("vec_id"),
        Similarity.srpBucket(col("v"), pp.hPlanes, portable = true,
          Some(dim)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) =>
      assert(IncrementalSemantic.queryBucket(v, pp) === fromExpr(id), s"vec $id")
    }
  }

  test("over-cap buckets are inert for the batch") {
    val tight = p.copy(maxBucket = 3)
    val st = store()
    // 4 copies of group 7 in one bucket: population 4 > 3 -> no drops
    val b0 = df((0L until 4L).map(i => (i, vec(7, math.pow(2.0, i.toDouble)))))
    val v0 = IncrementalSemantic.ingestBatch(b0, "vec_id", "embedding", st, 0L, tight, 8)
    assert(kept(v0) === (0L until 4L).toSet)
    // next arrival: combined population 4 + 1 = 5 > 3 -> still inert,
    // the newcomer survives alongside its four stored duplicates
    val b1 = df(Seq((10L, vec(7, 0.5))))
    val v1 = IncrementalSemantic.ingestBatch(b1, "vec_id", "embedding", st, 1L, tight, 8)
    assert(kept(v1) === Set(10L))
  }
}
