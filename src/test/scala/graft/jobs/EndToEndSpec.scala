package graft.jobs

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.{ReplicationFilter, TableRules}
import graft.snapshot.SnapshotJob

/** Integration: snapshot the ENTIRE sf0.001 testdata set (every table
  * the driver ships) into a fresh target and verify every copy with the
  * checksum compare — the reference's `init` + `verify` workflow
  * end-to-end. `events` is excluded: its parquet carries TIMESTAMP(NANOS)
  * which Spark 4 cannot read raw (see Tables.events for the conversion
  * path exercised by the sync-cycle queries). */
class EndToEndSpec extends AnyFunSuite {

  test("snapshot + verify of the full sf0.001 dataset") {
    val s = SparkTestSession.spark
    val src = "/root/testdata/sf0.001"
    val tgt = Files.createTempDirectory("e2e-tgt").toString
    val cp = Files.createTempDirectory("e2e-cp").resolve("cp.json")

    val filter = ReplicationFilter(excludeTables = Set("db.events"))
    val report = SnapshotJob.run(s, "db", src, tgt, filter, TableRules(),
      checkpointPath = Some(cp), verify = true)

    val expected = Seq("customer", "documents", "embeddings", "lineitem",
      "nation", "orders", "part", "region", "supplier")
    assert(report.copied.sorted == expected)
    assert(report.tables.filterNot(_.skipped).map(_.rows).sum > 0)

    val verdicts = SnapshotJob.verifyDirs(s, src, tgt, expected)
    assert(verdicts.values.forall(identity), s"mismatches: $verdicts")

    // resume is a no-op copy
    val again = SnapshotJob.run(s, "db", src, tgt, filter, TableRules(),
      checkpointPath = Some(cp))
    assert(again.copied.isEmpty && again.skipped.sorted == expected)
  }
}
