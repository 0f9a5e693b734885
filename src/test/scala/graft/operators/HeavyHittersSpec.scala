package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Misra–Gries summary + two-pass exact heavy hitters: the superset
  * guarantee under partial aggregation, exact agreement with the naive
  * full group-by, and the guarantee-boundary guard. */
class HeavyHittersSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  /** A Zipf-ish token stream with a planted head: term_i drawn with
    * weight 1/(i+1), plus `hot` occurrences of "hotx". Seeded. */
  private def stream(n: Int, vocab: Int, hot: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val weights = (0 until vocab).map(i => 1.0 / (i + 1))
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    val zipf = Seq.fill(n) {
      val u = rnd.nextDouble()
      s"t${cum.indexWhere(u <= _)}"
    }
    rnd.shuffle(zipf ++ Seq.fill(hot)("hotx"))
  }

  test("misra-gries candidates are a superset of every term above N/(k+1)") {
    val s = spark
    import s.implicits._
    for (seed <- 1L to 3L; parts <- Seq(1, 7)) {
      val toks = stream(n = 5000, vocab = 400, hot = 300, seed = seed)
      val n = toks.size
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val k = 32
      val cands = toks.toDF("token").repartition(parts)
        .agg(call_function("graft_misra_gries", col("token"), lit(k)).as("c"))
        .head().getSeq[String](0).toSet
      assert(cands.size <= k, s"seed=$seed parts=$parts: ${cands.size} > k")
      val mustHave = exact.collect { case (t, c) if c * (k + 1) > n => t }.toSet
      assert(mustHave.subsetOf(cands),
        s"seed=$seed parts=$parts: guarantee missed ${mustHave -- cands}")
    }
  }

  test("heavyTerms matches the naive exact group-by/having, any partitioning") {
    val s = spark
    import s.implicits._
    for (seed <- 10L to 12L) {
      val toks = stream(n = 4000, vocab = 300, hot = 250, seed = seed)
      val docsDf = toks.grouped(25).map(_.mkString(" ")).toSeq
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").repartition(5)
      val denom = 50L
      val got = HeavyHitters.heavyTerms(docsDf, col("text"), denom, k = 64)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val n = toks.size
      val want = toks.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * denom > n }.toMap
      assert(got == want, s"seed=$seed: got ${got.keySet}, want ${want.keySet}")
      assert(want.contains("hotx")) // non-vacuous: the planted head qualifies
    }
  }

  test("heavyTermsByGroup matches per-group naive exact, groups independent") {
    val s = spark
    import s.implicits._
    for (seed <- 20L to 21L) {
      // two groups with DIFFERENT planted heads and different sizes: a
      // term heavy in g0's small stream must not need g1's threshold
      val g0 = stream(n = 1500, vocab = 200, hot = 120, seed = seed)
      val g1 = stream(n = 4500, vocab = 250, hot = 0, seed = seed + 100)
      val docsDf = (g0.grouped(25).map(("g0", _)) ++ g1.grouped(25).map(("g1", _)))
        .zipWithIndex.map { case ((g, t), i) => (i.toLong, g, t.mkString(" ")) }
        .toSeq.toDF("doc_id", "lang", "text").repartition(4)
      val denom = 40L
      val got = HeavyHitters.heavyTermsByGroup(docsDf, "lang", col("text"), denom, k = 64)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      def naive(g: String, toks: Seq[String]) = {
        val n = toks.size
        toks.groupBy(identity).view.mapValues(_.size.toLong)
          .filter { case (_, c) => c * denom > n }
          .map { case (t, c) => (g, t, c) }.toSet
      }
      val want = naive("g0", g0) ++ naive("g1", g1)
      assert(got == want, s"seed=$seed: diff ${(got -- want) ++ (want -- got)}")
      assert(want.exists { case (g, t, _) => g == "g0" && t == "hotx" })
      assert(!want.exists { case (g, t, _) => g == "g1" && t == "hotx" })
    }
  }

  test("empty and null text yield an empty result with the contract schema") {
    val s = spark
    import s.implicits._
    val empty = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "   "))
      .toDF("doc_id", "text")
    val out = HeavyHitters.heavyTerms(empty, col("text"), denom = 10L, k = 16)
    assert(out.columns.toSeq == Seq("token", "n"))
    assert(out.count() == 0)
  }

  test("keySkew: hand-computed counts, shares, mean-load ratios; top-k cut is deterministic") {
    val s = spark
    import s.implicits._
    // a:3 b:2 c:1 → tot 6, nkeys 3; shares .5/.333333/.166667;
    // avg_ratio = count·3/6 → 1.5 / 1.0 / 0.5
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val out = HeavyHitters.keySkew(df, "k", k = 20).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", 3L, 0.5, 1.5), ("b", 2L, 0.333333, 1.0), ("c", 1L, 0.166667, 0.5)))
    // the k-cut breaks count ties by key ascending: with k=2 of {x:1,y:1,z:2}
    // the survivors must be z then x, never y
    val tied = Seq("x", "y", "z", "z").toDF("k")
    val cut = HeavyHitters.keySkew(tied, "k", k = 2).collect().map(_.getString(0))
    assert(cut.toSeq == Seq("z", "x"))
  }

  test("denom at or past the guarantee boundary is rejected") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyTerms(d, col("text"), denom = 17L, k = 16)
    }
    // denom == k is the last covered setting — must not throw
    HeavyHitters.heavyTerms(d, col("text"), denom = 16L, k = 16).collect()
  }
}
