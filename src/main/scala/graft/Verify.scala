package graft
import java.nio.file.{Files, Paths}

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Run one registered query and write its result into `outDir/name`.
    * A crash must leave a LOUD artifact, not an absence: the exception
    * text is written as a one-row parquet in the query's output slot, so
    * the driver's DuckDB compare records a hard mismatch (err row)
    * instead of silently omitting the query — mirrors the reference's
    * verify-as-failure stance (database-replicator
    * src/commands/verify.rs:321-332). Returns true on success. */
  def dumpQuery(spark: SparkSession, sfDir: String, outDir: String,
                name: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      true
    } catch { case NonFatal(e) =>
      // NonFatal only: an OutOfMemoryError/StackOverflowError means the
      // JVM can no longer be trusted to produce valid artifacts for the
      // REMAINING queries — let it abort the whole run (the nonzero exit
      // signals loudly) instead of continuing on a corrupted heap.
      System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
      try {
        import spark.implicits._
        Seq(s"$name CRASHED: ${Option(e.getMessage).getOrElse(e.toString).take(1000)}")
          .toDF("_query_crashed")
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case NonFatal(e2) =>
        System.err.println(s"[verify] $name error-artifact write failed: ${e2.getMessage}")
      }
      false
    }
  def main(args: Array[String]): Unit = {
    // trailing args (optional) restrict the dump to those queries —
    // dev-loop convenience; the driver always passes exactly two args
    val (sfDir, outDir, only) = args.toList match {
      case sf :: out :: rest => (sf, out, rest.toSet)
      case _ => sys.error("usage: Verify <sfDir> <outDir> [query ...]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.local(cpus.toInt)
    new java.io.File(outDir).mkdirs()
    // Log the fixture schemas up front: when the driver regenerates a
    // parquet fixture with a different physical type, the cause is
    // diagnosable from this artifact alone (one line per table).
    for (f <- Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
         if f.getName.endsWith(".parquet")) {
      val t = f.getName.stripSuffix(".parquet")
      val schema =
        try spark.read.parquet(f.getPath).schema.simpleString
        catch { case e: Throwable => s"UNREADABLE: ${e.getMessage}" }
      System.err.println(s"[verify] fixture $t: $schema")
    }
    var failed = List.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        if (!dumpQuery(spark, sfDir, outDir, name, fn)) failed ::= name
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(
        s"[verify] ${failed.size} quer${if (failed.size == 1) "y" else "ies"} crashed: ${failed.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
