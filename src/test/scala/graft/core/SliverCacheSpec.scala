package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the round-15 SliverCache accounting fixes (round-14 verdict #4b
  * + ADVICE #4):
  *   - occupancy reflects reality after an EXTERNAL cache clear
  *     (`catalog.clearCache()` unpersists entries behind the FIFO's
  *     back — the stale slots must not count against [[SliverCache.Cap]]);
  *   - re-registering the same logical plan MOVES the entry instead of
  *     occupying a second slot (Spark's CacheManager dedupes by plan, so
  *     evicting the older slot would silently uncache the newer one);
  *   - [[SliverCache.clear]] empties the FIFO and unpersists what is
  *     still cached.
  */
class SliverCacheSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  test("occupancy drops to zero after an external catalog.clearCache") {
    SliverCache.clear()
    import spark.implicits._
    // distinct row sets — same-cardinality frames with different column
    // names canonicalize to the SAME plan and would share one slot
    val a = SliverCache.computeOnce((1 to 10).toDF("a"))
    val b = SliverCache.computeOnce((1 to 20).toDF("b"))
    assert(a.storageLevel != StorageLevel.NONE)
    assert(SliverCache.liveCount == 2)
    spark.catalog.clearCache() // the harness-style clear, outside the FIFO
    assert(SliverCache.liveCount == 0,
      "externally-uncached entries must not occupy FIFO slots")
    val _ = b // keep the reference alive past the clear
  }

  test("same-plan re-registration shares one slot (move-to-back)") {
    SliverCache.clear()
    import spark.implicits._
    val base = (1 to 10).toDF("v").filter(col("v") > 2)
    val first = SliverCache.computeOnce(base)
    // identical logical plan, registered again (the v2/v3 documents-base
    // shape from ADVICE #4)
    val second = SliverCache.computeOnce((1 to 10).toDF("v").filter(col("v") > 2))
    assert(SliverCache.liveCount == 1,
      "CacheManager holds ONE entry for this plan — so must the FIFO")
    // the shared cache entry is still live (the re-registration must not
    // have evicted it through the stale older slot)
    assert(second.storageLevel != StorageLevel.NONE)
    assert(first.count() == 8 && second.count() == 8)
    SliverCache.clear()
  }

  test("clear() empties the FIFO and unpersists live entries") {
    SliverCache.clear()
    import spark.implicits._
    val a = SliverCache.computeOnce((1 to 5).toDF("x"))
    assert(SliverCache.liveCount == 1)
    SliverCache.clear()
    assert(SliverCache.liveCount == 0)
    assert(a.storageLevel == StorageLevel.NONE,
      "clear() must release what it registered")
  }

  test("Cap still bounds live slivers with dead slots pruned first") {
    SliverCache.clear()
    import spark.implicits._
    val frames = (0 until SliverCache.Cap + 2).map { i =>
      // distinct upper bounds → genuinely distinct plans (column names
      // alone canonicalize away)
      SliverCache.computeOnce((1 to 5 + i).toDF(s"c$i"))
    }
    assert(SliverCache.liveCount == SliverCache.Cap)
    // the two OLDEST were evicted; the newest Cap remain cached
    assert(frames.head.storageLevel == StorageLevel.NONE)
    assert(frames.last.storageLevel != StorageLevel.NONE)
    SliverCache.clear()
  }
}
