package graft.snapshot

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Checkpoint, ReplicationFilter, TableRules}
import graft.operators.Checksum

/** The snapshot (init) job — reference `src/commands/init.rs:225-631`
  * re-expressed as a Spark batch pipeline:
  *
  *   discover tables → apply ReplicationFilter (table pruning, the
  *   cheapest optimization there is) → per table: read → apply
  *   TableRules (schema-only / predicate / time-window, all pushed into
  *   the scan) → write target → mark checkpoint → save atomically.
  *
  * Resume: a re-run with the same (source, target, filter) fingerprint
  * skips completed tables (`src/checkpoint.rs:53-163`); any identity
  * change invalidates the checkpoint and starts clean.
  *
  * Source/target are parquet directories here (the sandbox has no live
  * databases); swapping the read/write for `spark.read.jdbc` /
  * [[graft.sinks.JdbcUpsertWriter]] changes nothing structural — tables
  * stream independently and each table's copy is one narrow
  * scan→filter→write job, embarrassingly parallel across a cluster.
  */
object SnapshotJob {

  final case class TableResult(table: String, rows: Long, skipped: Boolean)
  final case class Report(database: String, tables: Seq[TableResult],
                          checkpoint: Checkpoint) {
    def copied: Seq[String] = tables.filterNot(_.skipped).map(_.table)
    def skipped: Seq[String] = tables.filter(_.skipped).map(_.table)
  }

  /** Tables of a parquet "database" directory (stand-in for the JDBC
    * catalog listing — same contract: names, deterministically ordered). */
  def discoverTables(sourceDir: String): Seq[String] =
    Files.list(Paths.get(sourceDir)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .toSeq.sorted

  def run(spark: SparkSession,
          database: String,
          sourceDir: String,
          targetDir: String,
          filter: ReplicationFilter = ReplicationFilter(),
          rules: TableRules = TableRules(),
          checkpointPath: Option[Path] = None,
          verify: Boolean = false): Report = {

    var cp = checkpointPath match {
      case Some(p) => Checkpoint.resume(p, sourceDir, targetDir, filter, rules)
      case None    => Checkpoint.fresh(sourceDir, targetDir, filter, rules)
    }

    val tables = discoverTables(sourceDir)
      .filter(t => filter.shouldReplicateTable(database, t))

    val results = tables.map { table =>
      if (cp.completed.contains(table))
        TableResult(table, 0L, skipped = true)
      else {
        val src = spark.read.parquet(s"$sourceDir/$table.parquet")
        val transformed = rules.apply(s"$database.$table", src)
        transformed.write.mode("overwrite").parquet(s"$targetDir/$table.parquet")
        val written = spark.read.parquet(s"$targetDir/$table.parquet")
        if (verify && !Checksum.tablesMatch(transformed, written))
          throw new IllegalStateException(s"verify failed for $table")
        val rows = written.count()
        cp = cp.markCompleted(table)
        checkpointPath.foreach(cp.save)
        TableResult(table, rows, skipped = false)
      }
    }
    Report(database, results, cp)
  }

  /** The verify command (`src/commands/verify.rs:70-343`): per-table
    * count+checksum compare between two table directories, `parallelism`
    * tables in flight (the reference uses `buffer_unordered(4)`) — each
    * compare is two independent Spark jobs, so concurrent submission
    * keeps the cluster busy across small tables. */
  def verifyDirs(spark: SparkSession, sourceDir: String, targetDir: String,
                 tables: Seq[String], parallelism: Int = 4): Map[String, Boolean] = {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = tables.map { t =>
        Future {
          val s = spark.read.parquet(s"$sourceDir/$t.parquet")
          val g = spark.read.parquet(s"$targetDir/$t.parquet")
          t -> Checksum.tablesMatch(s, g)
        }
      }
      Await.result(Future.sequence(fs), Duration.Inf).toMap
    } finally pool.shutdown()
  }

  /** Schema-only tables land as empty frames with full schema — make
    * that observable for tests. */
  def targetTable(spark: SparkSession, targetDir: String, table: String): DataFrame =
    spark.read.parquet(s"$targetDir/$table.parquet")
}
