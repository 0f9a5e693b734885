package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The LSH candidate memo's staleness contract is enforced by DATA
  * IDENTITY (round-4 advice): a corpus dir rewritten mid-session must
  * miss the memo and recompute over the new bytes — caller discipline
  * (invalidateLshCache) is a convenience, not a correctness requirement. */
class PipelineCacheSpec extends AnyFunSuite {

  private def spark: SparkSession = SparkTestSession.spark

  private def writeDocs(dir: String, texts: Seq[String]): Unit = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("a rewritten corpus dir misses the memo: results reflect the new files") {
    val dir = Files.createTempDirectory("lsh-identity").toString
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two three four five six seven eight nine ten eleven",
      "red green blue yellow purple orange brown black white gray")
    writeDocs(dir, texts)
    val first = SparkEntry.queries("q_minhash_pairs")(spark, dir).collect()
    // every doc gets a planted near-dup (+100000): with deterministic
    // hashing these texts provably produce pairs on ids 0..2
    assert(first.nonEmpty)
    val firstIds = first.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(firstIds.forall(id => (id % 100000) <= 2))

    // rewrite the SAME dir: IDENTICAL texts, doc_ids shifted +10 — the
    // hashes (hence the found pairs) are deterministic, so fresh results
    // MUST carry the shifted ids; stale memo results carry the old ones.
    // No invalidateLshCache call: identity enforcement is the point.
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t2, i) => (i.toLong + 10, t2) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val second = SparkEntry.queries("q_minhash_pairs")(spark, dir).collect()
    val secondIds = second.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(second.length == first.length)
    assert(secondIds.forall(id => (id % 100000) >= 10 && (id % 100000) <= 12),
      s"memo served stale candidates: ids $secondIds")
    graft.QueriesPipeline.invalidateLshCache(Some(dir))
  }
}
