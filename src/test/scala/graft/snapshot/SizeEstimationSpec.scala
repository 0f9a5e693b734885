package graft.snapshot

import org.scalatest.funsuite.AnyFunSuite

import graft.MockJdbc
import graft.core.ReplicationFilter

/** A5 size estimation / ETA preflight — pinned to
  * `src/migration/estimation.rs` (SQL, 20 GB/h math, format_bytes /
  * format_duration fixtures from the reference's own tests). */
class SizeEstimationSpec extends AnyFunSuite {

  test("SQL is the reference's, with identifier quoting (estimation.rs:89-92,158-163)") {
    assert(SizeEstimation.databaseSizeSql == "SELECT pg_database_size(?::text)")
    assert(SizeEstimation.tableSizeSql("public", "users") ==
      """SELECT pg_total_relation_size('"public"."users"'::regclass)""")
    // mixed-case names resolve (unquoted would lower-case and miss), and a
    // hostile name cannot break out of the literal
    assert(SizeEstimation.tableSizeSql("public", "MyTable") ==
      """SELECT pg_total_relation_size('"public"."MyTable"'::regclass)""")
    assert(SizeEstimation.tableSizeSql("public", "it's_data") ==
      """SELECT pg_total_relation_size('"public"."it''s_data"'::regclass)""")
  }

  test("format_bytes fixtures (estimation.rs:313-321)") {
    import SizeEstimation.formatBytes
    assert(formatBytes(0L) == "0.0 B")
    assert(formatBytes(500L) == "500.0 B")
    assert(formatBytes(1024L) == "1.0 KB")
    assert(formatBytes(1536L) == "1.5 KB")
    assert(formatBytes(1048576L) == "1.0 MB")
    assert(formatBytes(1073741824L) == "1.0 GB")
    assert(formatBytes(16106127360L) == "15.0 GB")
    assert(formatBytes(1099511627776L) == "1.0 TB")
  }

  test("ETA: 20 GB/hour, duration buckets (estimation.rs:225-231,291-306)") {
    // 20 GB → exactly one hour
    val twentyGb = 20L * 1024 * 1024 * 1024
    assert(SizeEstimation.estimateDurationSeconds(twentyGb) == 3600L)
    assert(SizeEstimation.estimateDurationSeconds(twentyGb * 48) == 3600L * 48)
    import SizeEstimation.formatDuration
    assert(formatDuration(45) == "~45 seconds")
    assert(formatDuration(1800) == "~30.0 minutes")
    assert(formatDuration(9000) == "~2.5 hours")
    assert(formatDuration(259200) == "~3.0 days")
  }

  test("estimate: unfiltered uses pg_database_size; filtered sums filtered tables") {
    val key = "est"; MockJdbc.reset(key)
    MockJdbc.setQueryHandler(key, {
      case sql if sql.startsWith("SELECT pg_database_size") =>
        Seq(Seq(Long.box(40L * 1024 * 1024 * 1024))) // 40 GB → 2 h
      case sql if sql.contains("pg_tables") =>
        Seq(Seq("public", "big", Long.box(0L)),
            Seq("public", "skipme", Long.box(0L)),
            Seq("audit", "log", Long.box(0L)))
      case sql if sql.contains("\"public\".\"big\"") => Seq(Seq(Long.box(3000L)))
      case sql if sql.contains("\"audit\".\"log\"")  => Seq(Seq(Long.box(500L)))
      case sql => throw new IllegalStateException(s"unexpected sql: $sql")
    })

    val unfiltered = SizeEstimation.estimate(
      _ => MockJdbc.connection(key), Seq("appdb"), ReplicationFilter())
    assert(unfiltered.head.sizeBytes == 40L * 1024 * 1024 * 1024)
    assert(unfiltered.head.sizeHuman == "40.0 GB")
    assert(unfiltered.head.estimatedSeconds == 7200L)
    assert(unfiltered.head.durationHuman == "~2.0 hours")

    // exclude filter active → per-table pg_total_relation_size, skipme skipped,
    // non-public schema matched as "schema.table" (estimation.rs:139-147)
    val filtered = SizeEstimation.estimate(
      _ => MockJdbc.connection(key), Seq("appdb"),
      ReplicationFilter(excludeTables = Set("appdb.skipme")))
    assert(filtered.head.sizeBytes == 3500L)
  }
}
