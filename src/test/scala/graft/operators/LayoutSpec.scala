package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Z-order layout: bit-interleave correctness and the property the
  * layout exists for — per-file bounds prune selective predicates on
  * BOTH dimensions, where a single-column sort prunes only its own. */
class LayoutSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  test("interleave is exact Morton bit-interleaving") {
    val s = spark
    import s.implicits._
    val rows = Seq((1, 0), (0, 1), (3, 5), (0xFFFF, 0xFFFF), (0, 0))
    val got = rows.toDF("a", "b")
      .select(Layout.interleave(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a-bit i → position 2i+1, b-bit i → position 2i
    assert(got == Seq(2L, 1L, 27L, 0xFFFFFFFFL, 0L))
  }

  /** Files whose [min_c, max_c] intersects [lo, hi] — what a scan's
    * min/max pruning keeps. */
  private def matching(path: String, c: String, lo: Double, hi: Double): Long = {
    val b = Layout.fileBounds(spark, path, Seq("a", "b"))
    b.filter(col(s"min_$c") <= hi && col(s"max_$c") >= lo).count()
  }

  test("z-order prunes both dimensions; single-column sort prunes only its own") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val df = Seq.fill(20000)((rnd.nextInt(100000), rnd.nextInt(100000)))
      .toDF("a", "b")
    val root = Files.createTempDirectory("layout")
    val byA = root.resolve("byA").toString
    val byZ = root.resolve("byZ").toString
    val nFiles = 16
    df.repartitionByRange(nFiles, col("a")).sortWithinPartitions("a")
      .write.parquet(byA)
    Layout.zorderWrite(df, "a", "b", byZ, nFiles)

    // same data in both layouts
    assert(spark.read.parquet(byZ).count() == 20000)
    assert(graft.operators.Checksum.tablesMatch(
      spark.read.parquet(byA), spark.read.parquet(byZ)))

    // narrow predicate on b (1/16 of the domain): the a-sorted layout
    // keeps every file (each spans b's whole domain); z-order keeps a
    // strip of the 4x4 curve grid
    val bAll = matching(byA, "b", 50000, 56250)
    val bZ = matching(byZ, "b", 50000, 56250)
    assert(bAll == nFiles.toLong, s"a-sorted layout should not prune b (kept $bAll)")
    assert(bZ * 2 <= nFiles, s"z-order kept $bZ of $nFiles files for a 1/16 b-slice")

    // narrow predicate on a: the a-sorted layout is near-perfect; z-order
    // must still prune to at most half the files
    val aSorted = matching(byA, "a", 50000, 56250)
    val aZ = matching(byZ, "a", 50000, 56250)
    assert(aSorted <= 3, s"a-sorted pruning regressed (kept $aSorted)")
    assert(aZ * 2 <= nFiles, s"z-order kept $aZ of $nFiles files for a 1/16 a-slice")

    // point-rectangle predicate on both: z-order beats the single-column
    // sort (which degenerates to its a-pruning alone)
    val bothA = Layout.fileBounds(spark, byA, Seq("a", "b"))
      .filter(col("min_a") <= 56250 && col("max_a") >= 50000 &&
              col("min_b") <= 56250 && col("max_b") >= 50000).count()
    val bothZ = Layout.fileBounds(spark, byZ, Seq("a", "b"))
      .filter(col("min_a") <= 56250 && col("max_a") >= 50000 &&
              col("min_b") <= 56250 && col("max_b") >= 50000).count()
    assert(bothZ <= bothA, s"rectangle predicate: z-order kept $bothZ, a-sort kept $bothA")
    assert(bothZ <= 2, s"z-order kept $bothZ files for a 1/256 rectangle")
  }

  test("constant column degrades to a clean 1-D order") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).map(i => (i, 7)).toDF("a", "b")
    val root = Files.createTempDirectory("layout-const").resolve("z").toString
    Layout.zorderWrite(df, "a", "b", root, 4)
    // b constant → zval ordered purely by a → near-perfect a pruning
    assert(matching(root, "a", 100, 200) <= 2)
    assert(spark.read.parquet(root).count() == 1000)
  }
}
