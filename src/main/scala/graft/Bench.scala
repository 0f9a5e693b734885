package graft

import java.nio.file.{Files, Paths}


/** Benchmark main — runs every registered query on
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON line with per-query seconds.
  *
  * Harness rules (round-1 verdict "What's wrong #5"):
  *   - full materialization: each result is written to the `noop` sink,
  *     so every operator in the plan actually executes (a bare `count()`
  *     lets Catalyst prune unused projections — e.g. JSON construction);
  *   - failures are loud: a crashing query records `"failed"` and the
  *     process exits nonzero, instead of masquerading as a fast run;
  *   - the JSON line goes to stdout AND `SPARK_GRAFT_BENCH_OUT` (default
  *     `bench_out.json`), so an sbt-`[info]`-prefixed stdout can't lose it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = graft.core.GraftSession.local(cpus.toInt)

    // Untimed warmup: JIT + whole-stage-codegen compilation + parquet
    // reader init otherwise land entirely on the alphabetically-first
    // query and distort its number.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    // optional comma-separated subset for focused profiling
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failed ::= name
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec.toString else "\"failed\"")
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if !v.startsWith("\"") => v.toDouble }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failed.size}}"""
    println(line)
    Files.writeString(Paths.get(outPath), line + "\n")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
