package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis — ordered stage progression per user: a user is "at
  * stage i" when an event of stage i's type occurred AT OR AFTER their
  * first qualifying event of stage i−1 (the classic product-analytics
  * funnel; the reference engine has nothing like it).
  *
  * Shape: one filtered aggregation per stage, each keyed by user — the
  * stage-i frame carries (user, m_0..m_i first-qualifying timestamps) and
  * joins the next stage's events on user only, with the ordering
  * constraint as a conditional `min(when(ts >= m_i, ts))` aggregate, so
  * non-advancing users stay (null next-stage time) without a second
  * pass. All joins and aggregations shuffle on the user key; per-stage
  * cost is one pass over that stage's events, never events². The final
  * count is a single-row aggregate unpivoted to (stage, n_users).
  */
object Funnel {

  /** Per-user first-qualifying timestamp per stage: columns
    * (userCol, m0 .. m{n-1}), where m_i is null if the user never
    * reached stage i in order. */
  def stageTimes(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    var acc = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("m0"))
    for ((st, i) <- stages.tail.zipWithIndex) {
      val prev = s"m$i"
      val carried = col(userCol) +: (0 to i).map(j => col(s"m$j"))
      acc = acc
        .join(events.filter(col(typeCol) === st)
          .select(col(userCol), col(tsCol).as("__t")), Seq(userCol), "left")
        .groupBy(carried: _*)
        .agg(min(when(col("__t") >= col(prev), col("__t"))).as(s"m${i + 1}"))
    }
    acc
  }

  /** The funnel report: (stage, n_users) — how many users reached each
    * stage in order. Stage rows come out in funnel order via the
    * stage_idx column. */
  def counts(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    val times = stageTimes(events, userCol, tsCol, typeCol, stages)
    val aggs = stages.indices.map(i => count(col(s"m$i")).as(s"n$i"))
    val totals = times.agg(aggs.head, aggs.tail: _*)
    val rows: Column = array(stages.indices.map(i =>
      struct(lit(i).as("stage_idx"), lit(stages(i)).as("stage"),
        col(s"n$i").as("n_users"))): _*)
    totals.select(explode(rows).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.n_users"))
  }

  /** Cohort retention: users are cohorted by their first active day; for
    * each (cohort, day_offset) the count of distinct users active that
    * many days after their cohort day. Two hash aggregations and one
    * user-keyed join — the first-day frame is (user, date), a sliver, so
    * at scale it broadcast-joins back onto the event scan; the distinct
    * collapses each user to one row per (cohort, offset) before the
    * final count, keyed by (cohort, offset) — a handful of groups. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val e = events.select(col(userCol), to_date(col(tsCol)).as("__d"))
    val first = e.groupBy(col(userCol)).agg(min(col("__d")).as("cohort"))
    e.join(first, Seq(userCol))
      .select(col("cohort"), datediff(col("__d"), col("cohort")).as("day_offset"),
        col(userCol))
      .distinct()
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
