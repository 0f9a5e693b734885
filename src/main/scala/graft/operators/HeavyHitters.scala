package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy hitters without a vocabulary-sized shuffle.
  *
  * Pass 1 streams every token through the native Misra–Gries summary
  * ([[graft.functions.MisraGriesAgg]]) and counts N in the same
  * aggregation — partial buffers hold ≤ k counters each, so the shuffle
  * is (partitions × k) rows regardless of vocabulary size. The summary
  * is a guaranteed SUPERSET of every term with count > N/(k+1). Pass 2
  * recounts exactly, but only over rows matching the ≤ k candidates — an
  * `IN` filter the scan evaluates before any shuffle — then applies the
  * threshold. Result: exact counts for every term occurring in more than
  * 1/denom of all tokens, with neither pass ever shuffling the long-tail
  * vocabulary a naive `GROUP BY term HAVING count ≥ t` would
  * materialize.
  *
  * The threshold is the integer predicate `count · denom > N` — no
  * float `ceil(frac·N)` whose rounding could disagree across engines.
  * `denom < k+1` is required: above that the Misra–Gries guarantee
  * (superset of everything with count > N/(k+1)) no longer covers the
  * threshold and pass 2 could miss a qualifying term.
  */
object HeavyHitters {

  /** KEY-SKEW diagnosis — the planning tool for every salting/AQE
    * decision in this library: the top-k heaviest keys of `keyCol` with
    * each key's row count, share of all rows, and ratio to the mean
    * key load (`avg_ratio` ≈ 1 everywhere → uniform, safe to hash-join;
    * one key at avg_ratio ≫ partitions → that join/agg needs salting or
    * AQE skew handling, and this output names the literal keys to salt).
    *
    * Shape: one map-side-combinable count aggregation (shuffle carries
    * (key, count), never rows), a TakeOrdered top-k (no global sort),
    * and the two totals broadcast back over the k survivors — cost ∝
    * distinct keys, driver sees k rows. */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("key_count"))
    val tot = counts.agg(
      sum(col("key_count")).cast("double").as("__tot"),
      count(lit(1)).cast("double").as("__nkeys"))
    counts.orderBy(col("key_count").desc, col(keyCol).asc).limit(k)
      .crossJoin(broadcast(tot))
      .select(col(keyCol), col("key_count"),
        round(col("key_count").cast("double") / col("__tot"), 6).as("share"),
        round(col("key_count").cast("double") * col("__nkeys") / col("__tot"), 6)
          .as("avg_ratio"))
  }

  /** Exact (token, n) for every token with n · denom > N among the
    * non-empty tokens of `text` (N = total non-empty tokens). `docs` is
    * scanned twice; both scans project only the text column. */
  def heavyTerms(docs: DataFrame, text: Column, denom: Long,
                 k: Int = 256): DataFrame = {
    require(denom >= 1 && denom < k + 1,
      s"denom=$denom outside the Misra-Gries guarantee (need 1 <= denom < k+1 = ${k + 1})")
    val toks = docs
      .select(explode(Dedup.tokens(text)).as("token"))
      .filter(length(col("token")) > 0)
    val head = toks
      .agg(count(lit(1)).as("n"),
           call_function("graft_misra_gries", col("token"), lit(k)).as("cands"))
      .collect()(0) // driver-side metadata: one row, ≤ k short strings
    val total = head.getLong(0)
    val cands = head.getSeq[String](1)
    if (cands.isEmpty)
      return toks.sparkSession.createDataFrame(
        toks.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType()
          .add("token", "string", nullable = false).add("n", "long", nullable = false))
    toks.filter(col("token").isin(cands: _*))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") * lit(denom) > lit(total))
  }

  /** Per-group exact heavy hitters — `(group, token, n)` for every token
    * with `n · denom > N_group` within its group's token stream. Same
    * two-pass shape as [[heavyTerms]] but fully distributed end to end:
    * pass 1 aggregates one `(count, summary)` row PER GROUP (map-side
    * partial, ≤ k counters per buffer per group), pass 2 inner-joins the
    * token stream against the exploded candidate set — broadcastable at
    * (groups × k) rows no matter how large the corpus — and recounts
    * exactly. Nothing is collected to the driver, so group cardinality
    * can be arbitrary; the per-group guarantee is the same
    * `denom < k+1` bound, applied per group stream. */
  def heavyTermsByGroup(docs: DataFrame, groupCol: String, text: Column,
                        denom: Long, k: Int = 256): DataFrame = {
    require(denom >= 1 && denom < k + 1,
      s"denom=$denom outside the Misra-Gries guarantee (need 1 <= denom < k+1 = ${k + 1})")
    val toks = docs
      .select(col(groupCol).as("grp"), explode(Dedup.tokens(text)).as("token"))
      .filter(length(col("token")) > 0)
    val summary = toks.groupBy(col("grp"))
      .agg(count(lit(1)).as("__n"),
           call_function("graft_misra_gries", col("token"), lit(k)).as("__cands"))
    val cands = summary.select(col("grp"), col("__n"),
      explode(col("__cands")).as("token"))
    toks.join(broadcast(cands), Seq("grp", "token"))
      .groupBy(col("grp"), col("token"))
      .agg(count(lit(1)).as("n"), max(col("__n")).as("__n"))
      .filter(col("n") * lit(denom) > col("__n"))
      .select(col("grp").as(groupCol), col("token"), col("n"))
  }
}
