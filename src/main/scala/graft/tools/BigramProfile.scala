package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Scratch profiler for [[TextAnalysis.bigramSurprise]]'s stages — the
  * biggest shared residual of the gate/curation families (round-16).
  * Times each sub-lineage with the noop sink to locate whether the
  * vocabulary aggregation, the occurrence-stream cost join, or the
  * repeated explode dominates. Not part of the driver contract. */
object BigramProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def stage[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"[bigramprofile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val nTokens = stage("corpusTokenCount") {
      TextAnalysis.corpusTokenCount(docs, col("text"))
    }
    val toks = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("__w"))

    stage("explode tokens (scan+explode only)") {
      noop(toks.select(explode(col("__w")).as("tok")).filter(length(col("tok")) > 0))
    }
    val uni = toks.select(explode(col("__w")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("__c_t"))
    stage("uni vocab agg") { noop(uni) }
    println(s"[bigramprofile]   uni vocab rows: ${stage("uni count")(uni.count())}")

    val bigrams = toks.select(col("doc_id"),
      explode(filter(transform(col("__w"), (_, i) =>
        when(i >= 1, struct(element_at(col("__w"), i).as("prev"),
          element_at(col("__w"), i + 1).as("tok")))),
        x => x.isNotNull)).as("__bg"))
      .select(col("doc_id"), col("__bg.prev").as("prev"), col("__bg.tok").as("tok"))
    stage("bigram occurrence stream") { noop(bigrams) }

    val bcnt = bigrams.groupBy(col("prev"), col("tok"))
      .agg(count(lit(1)).as("__c_bt"))
    stage("bigram vocab agg") { noop(bcnt) }
    println(s"[bigramprofile]   bigram vocab rows: ${stage("bigram vocab count")(bcnt.count())}")

    val biCost = bcnt
      .join(uni.select(col("tok").as("prev"), col("__c_t").as("__c_prev")), Seq("prev"))
      .join(uni, Seq("tok"))
      .withColumn("__micro_bi",
        round(lit(-1e6) * log(
          lit(0.5) * (col("__c_bt").cast("double") / col("__c_prev")) +
            lit(0.5) * (col("__c_t").cast("double") / lit(nTokens.toDouble))))
          .cast("long"))
      .select(col("prev"), col("tok"), col("__micro_bi"))
    stage("biCost (vocab agg + 2 uni joins)") { noop(biCost) }

    stage("docBi (occurrence join + doc agg)") {
      noop(bigrams.join(biCost, Seq("prev", "tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("__n_bi"), sum(col("__micro_bi")).as("__sum_bi")))
    }
    stage("full bigramSurprise") {
      noop(TextAnalysis.bigramSurprise(docs, "doc_id", col("text"), nTokens))
    }

    // ---- candidate variants (round-16 #10 retest) ----------------------
    // (a) explicit broadcast of the cost side: if AQE was not already
    // broadcasting, this removes the occurrence-stream exchange
    stage("docBi variant: broadcast(biCost)") {
      noop(bigrams.join(broadcast(biCost), Seq("prev", "tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("__n_bi"), sum(col("__micro_bi")).as("__sum_bi")))
    }
    // (b) one shared exchange: partition the occurrence stream by
    // (prev,tok) once; the vocab agg runs exchange-free on it and the
    // cost join reuses the same exchange (shuffled-hash, no 60M-row sort)
    stage("docBi variant: shared exchange + SHJ") {
      val bigramsP = bigrams.repartition(col("prev"), col("tok"))
      val bcnt2 = bigramsP.groupBy(col("prev"), col("tok"))
        .agg(count(lit(1)).as("__c_bt"))
      val biCost2 = bcnt2
        .join(uni.select(col("tok").as("prev"), col("__c_t").as("__c_prev")), Seq("prev"))
        .join(uni, Seq("tok"))
        .withColumn("__micro_bi",
          round(lit(-1e6) * log(
            lit(0.5) * (col("__c_bt").cast("double") / col("__c_prev")) +
              lit(0.5) * (col("__c_t").cast("double") / lit(nTokens.toDouble))))
            .cast("long"))
        .select(col("prev"), col("tok"), col("__micro_bi"))
      noop(bigramsP.join(biCost2.hint("shuffle_hash"), Seq("prev", "tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("__n_bi"), sum(col("__micro_bi")).as("__sum_bi")))
    }
    // (c) full operator with broadcast cost side, for the end-to-end delta
    stage("full variant: broadcast cost side") {
      val biCostB = broadcast(biCost)
      val docBi = bigrams.join(biCostB, Seq("prev", "tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("__n_bi"), sum(col("__micro_bi")).as("__sum_bi"))
      val uniCost = uni.withColumn("__micro_uni",
        round(lit(1e6) * log(lit(nTokens.toDouble) / col("__c_t"))).cast("long"))
      val docFirst = toks
        .select(col("doc_id"), element_at(col("__w"), 1).as("tok"))
        .filter(length(col("tok")) > 0)
        .join(uniCost.select(col("tok"), col("__micro_uni")), Seq("tok"))
        .select(col("doc_id"), col("__micro_uni"))
      noop(docFirst.join(docBi, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (coalesce(col("__n_bi"), lit(0L)) + 1L).as("n_tokens"),
          (col("__micro_uni") + coalesce(col("__sum_bi"), lit(0L))).as("surprise_micro"))
        .withColumn("mean_surprise",
          round(col("surprise_micro").cast("double") / col("n_tokens") / lit(1e6), 6)))
    }
    spark.stop()
  }
}
