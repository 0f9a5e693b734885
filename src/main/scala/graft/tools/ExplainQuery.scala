package graft.tools

/** Dev tool: print the executed plan of one registered query.
  * Usage: runMain graft.tools.ExplainQuery <queryName> [sfDir] */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.core.GraftSession.local(8)
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect() // force AQE final plan
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
