package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Parity contract for the single-pass native quality-stats expression
  * (`graft_quality_stats`) against the composed regex columns it
  * replaced — field by field, on a corpus chosen to hit every edge the
  * byte-walk must replicate:
  *
  *  - Java-split boundary empties (leading/trailing non-space
  *    whitespace after Spark's space-only trim)
  *  - empty / whitespace-only / null documents
  *  - non-ASCII code points (all punct under the ASCII classes),
  *    multi-byte UTF-8, and case mappings that change code-point
  *    count (Turkish İ lowers to i + combining dot)
  *  - stopwords bounded by underscores and digits (word chars — no
  *    `\b` boundary), punctuation (boundary), and string edges
  *  - the corpus token-count metadata job vs the explode+filter+count
  *    it replaced
  */
class QualityStatsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    "the quick brown fox and the lazy dog",
    "  leading spaces and trailing  ",
    "\ttab lead and newline trail\n",
    "the_the the2 2the _the the_ (the) [the] the",
    "THE AND OF TO A IN IS IT the and of to a in is it",
    "",
    "   ",
    "\n\t",
    "one",
    "a",
    "é ñ ü — “puncts” and emoji 😀 here",
    "İstanbul İ DİYARBAKIR izmir",
    "punct!!! ratios??? 50% of $100, e.g. a.b.c",
    "multi  internal   runs\t\tand\n\nmixed ws",
    "digits 123 and is2 2is is_ _is is",
    "ß SS ss Straße STRASSE",
    "的是了在和 zh markers in the middle of it",
    "aitof toit ofa ofin inof a a a",
    "word",
    " the ",
    "\fthe",
    "it it it it it it it it it it"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) } ++ Seq((99L, null))

  private def df(s: SparkSession) = {
    import s.implicits._
    corpus.toDF("id", "text")
  }

  private def collectStats(s: SparkSession, statsCol: org.apache.spark.sql.Column) =
    df(s).select(col("id"),
        statsCol.getField("n_chars").as("c"),
        statsCol.getField("n_tokens").as("t"),
        statsCol.getField("n_punct").as("p"),
        statsCol.getField("n_stop").as("s"),
        statsCol.getField("n_words").as("w"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))))
      .toMap

  test("native struct equals the composed regex columns field-by-field") {
    val native = collectStats(spark, TextAnalysis.qualityStats(col("text")))
    val composed = collectStats(spark, TextAnalysis.qualityStatsComposed(col("text")))
    assert(native.keySet === composed.keySet)
    native.keys.toSeq.sorted.foreach { id =>
      assert(native(id) === composed(id), s"mismatch for doc $id")
    }
  }

  test("qualityComponents columns are unchanged by the native rewrite") {
    val comps = TextAnalysis.qualityComponents(col("text"))
    val nat = df(spark).select(col("id") +: comps.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // composed reference: rebuild the old formulas verbatim
    val lowered = lower(col("text"))
    val nChars = length(col("text"))
    val tokens = size(split(trim(col("text")), "\\s+"))
    val nPunct = length(col("text")) -
      length(regexp_replace(col("text"), "[^A-Za-z0-9\\s]", ""))
    val stop = Seq("the", "and", "of", "to", "a", "in", "is", "it")
      .map(w => TextAnalysis.countMatches(lowered, w)).reduce(_ + _)
    val ref = df(spark).select(col("id"),
        nChars.as("n_chars"), tokens.as("n_tokens"),
        round(nPunct.cast("double") / greatest(nChars, lit(1)), 6).as("punct_ratio"),
        round(stop.cast("double") / greatest(tokens, lit(1)), 6).as("stopword_ratio"),
        round(nChars.cast("double") / greatest(tokens, lit(1)), 6).as("mean_word_len"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(nat === ref)
  }

  test("corpusTokenCount equals explode+filter+count of Dedup.tokens") {
    val d = df(spark)
    val viaSum = TextAnalysis.corpusTokenCount(d, col("text"))
    val viaExplode = d.select(explode(Dedup.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0).count()
    assert(viaSum === viaExplode)
    // and on an empty frame the sum coalesces to 0
    assert(TextAnalysis.corpusTokenCount(d.filter(lit(false)), col("text")) === 0L)
  }

  test("repetitionRatios native == shuffled reference on the edge corpus") {
    val rep = Seq(
      (100L, "spam spam spam spam spam"),
      (101L, "a b a b a b a b c"),
      (102L, "looping text looping text looping text"),
      (103L, "\tboundary empties lead\n"),
      (104L, "x")
    )
    val d = (corpus ++ rep).toDF("id", "text")
    Seq(2, 3).foreach { n =>
      val nat = TextAnalysis.repetitionRatios(d, "id", col("text"), n)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val ref = TextAnalysis.repetitionRatiosShuffled(d, "id", col("text"), n)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(nat === ref, s"n=$n")
    }
  }

  test("graft_word_ngrams equals array_distinct over the declarative gram chain") {
    val rep = Seq(
      (200L, "spam spam spam spam spam"),
      (201L, "a b a b a b a b c"),
      (202L, "dup gram dup gram dup gram tail"),
      (203L, "\tboundary empties lead\n"),
      (204L, "x"),
      (205L, "one two"),
      (206L, "UPPER Case Mixed grams İstanbul Straße here we go")
    )
    val d = (corpus ++ rep).toDF("id", "text")
    Seq(2, 3, 8).foreach { n =>
      val nat = d.select(col("id"),
          call_function("graft_word_ngrams", col("text"), lit(n)).as("g"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getSeq[String](1).toList)).toMap
      val ref = d.select(col("id"),
          Dedup.ngramsOfTokens(Dedup.tokens(col("text")), n).as("g"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getSeq[String](1).toList)).toMap
      nat.keys.toSeq.sorted.foreach { id =>
        val expect = ref(id) match {
          case l: List[_] if l.isEmpty => null // native: <n words → null (explode-equal)
          case l => l
        }
        assert(nat(id) === expect, s"n=$n doc $id")
      }
    }
  }

  test("falls back to the composed twin on a session without the native fn") {
    val bare = spark.newSession()
    bare.sessionState.functionRegistry.dropFunction(
      FunctionIdentifier("graft_quality_stats"))
    val prior = SparkSession.getActiveSession
    SparkSession.setActiveSession(bare)
    try {
      val got = collectStats(bare, TextAnalysis.qualityStats(col("text")))
      val ref = collectStats(bare, TextAnalysis.qualityStatsComposed(col("text")))
      assert(got === ref)
    } finally prior.foreach(SparkSession.setActiveSession)
  }
}
