package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BucketedStoreSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  test("co-bucketed anti-join plans with NO shuffle exchange on either side") {
    val s = spark
    import s.implicits._
    val source = (1 to 1000).filter(_ % 7 != 0).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val target = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    BucketedStore.saveBucketed(source, "bk_source", Seq("id"), 8)
    BucketedStore.saveBucketed(target, "bk_target", Seq("id"), 8)
    // force the sort-merge path: broadcast would mask the bucketing story
    // (a 100 TB reconcile side is never broadcastable)
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orphans = BucketedStore.orphanedKeysBucketed(s, "bk_source", "bk_target", Seq("id"))
      // correctness: exactly the deleted multiples of 7
      assert(orphans.count() == (1 to 1000).count(_ % 7 == 0))
      // scale contract: co-bucketed scans sort-merge with NO shuffle
      val plan = orphans.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")
      assert(plan.contains("SortMergeJoin") && plan.contains("LeftAnti"))
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"))
      // and the same join over plain (non-bucketed) frames DOES shuffle
      val plain = target.join(source.select("id"), Seq("id"), "left_anti")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS bk_source")
      s.sql("DROP TABLE IF EXISTS bk_target")
      ()
    }
  }
}
