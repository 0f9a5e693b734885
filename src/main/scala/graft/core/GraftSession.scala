package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's extensions and scale-oriented
  * defaults. On a real cluster the same settings apply with a cluster
  * master and a shuffle-partition count sized to executors × cores;
  * nothing else changes — the whole library is master-agnostic.
  */
object GraftSession {

  /** Builder pre-loaded with graft extensions + recommended confs:
    * AQE on (runtime re-planning: coalesced partitions, skew-join
    * splitting, dynamic join selection), UTC session time, and an
    * explicit shuffle-partition count (NEVER leave the 200 default: size
    * it so a partition of your largest shuffle fits in executor memory). */
  def builder(shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")

  /** Local session for tools/tests. */
  def local(cores: Int): SparkSession = {
    val s = builder(shufflePartitions = cores)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
