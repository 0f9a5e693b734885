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
    * it so a partition of your largest shuffle fits in executor memory).
    *
    * `spark.sql.codegen.cache.maxEntries` is raised from its 100-entry
    * default: a session running a whole query registry (the bench suite
    * is 145 queries × several whole-stage/projection classes each)
    * churns the generated-class cache, and every regenerated class is a
    * NEW class to the JVM — its JIT profile restarts from the
    * interpreter. Measured at the 100× rung: the first pass after cache
    * churn ran 13× its compiled floor with ~28 cores busy in THIS JVM
    * (q1_agg 75.6 s wall / 2,130 CPU-s vs a 5.9 s floor) — re-executing
    * cold generated code, not I/O. 4096 entries keep every class of a
    * registry-sized workload resident (generated classes are KB-scale;
    * the cache is static/JVM-wide, so set it before the first session). */
  def builder(shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
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
