package graft.tools

/** Dev tool: time one registered query (full materialization, like the
  * bench's noop sink) against a data dir — for focused before/after
  * measurements at ScaleGen rungs without a whole bench run.
  * Usage: runMain graft.tools.RunOne <queryName> [sfDir] [repeats] */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val repeats = if (args.length > 2) args(2).toInt else 1
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    for (i <- 1 to repeats) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).collect().length
      println(f"[runone] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    spark.stop()
  }
}
