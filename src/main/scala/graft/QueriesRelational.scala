package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Checksum, Reconcile}
import graft.streaming.{IncrementalSync, SyncCycle}
import graft.types.TaggedJson

/** Relational / replication-semantics queries (SURVEY.md §2.1–§2.10),
  * each with a DuckDB oracle. Shared determinism rules in SparkEntry.
  */
object QueriesRelational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val dec = DecimalType(18, 2)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S6/S15 full scan: the snapshot copy path reads whole tables.
    "q_full_scan" -> ((s, dir) => t(s, dir, "region")),

    // P1 column projection — pruned at the parquet scan (ReadSchema).
    "q_projection" -> ((s, dir) =>
      t(s, dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")),

    // P4 row predicate (user SQL), pushed down to the scan.
    "q_predicate" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 &&
          col("l_shipdate") < lit("1999-01-01 00:00:00").cast(TimestampType))
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    // P5 time-window predicate, anchored to max(ts) so the oracle is
    // deterministic (the production rule uses NOW(), table_rules.rs:158-166).
    // Plan shape: one ts-only pruned scan for the max, broadcast as a
    // 1-row frame into a second single-pass filter — no scalar-subquery
    // re-evaluation, no third scan.
    "q_time_window" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val mx = ev.agg(max(col("ts")).as("__mx"))
      ev.join(broadcast(mx))
        .filter(col("ts") >= col("__mx") - expr("INTERVAL 7 DAY"))
        .select("event_id", "event_type", "value")
    }),

    // P6 schema-only rule: DDL copied, data skipped (empty result, full schema).
    "q_schema_only" -> ((s, dir) =>
      t(s, dir, "orders").select("o_orderkey", "o_orderstatus").limit(0)),

    // A1/A2/A3: count, exact count-distinct (uniqueness check
    // sqlite/converter.rs:278-297), max watermark.
    "q_count_stats" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("l_orderkey")).as("n_orders"),
        max(col("l_orderkey")).as("max_key"))),

    // T1 incremental change scan: rows past the watermark + new high-water
    // mark (xmin/reader.rs:122-163). Fixed watermark for the oracle; one
    // scan, one aggregation (count + max together — no eager double read).
    "q_incremental_scan" -> ((s, dir) =>
      IncrementalSync.readChanges(Tables.events(s, dir), "event_id", 5000L)
        .agg(
          count(lit(1)).as("n_changes"),
          max(col("event_id")).as("new_watermark"))),

    // J1/J2 anti-join reconciliation: customers with no orders in the
    // recent window = orphaned target rows (the date filter makes the
    // fixture non-vacuous: >0 orphans at every sf); PKs text-cast on both
    // sides (reconciler.rs:469-475).
    "q_anti_join" -> ((s, dir) =>
      Reconcile.orphanedKeys(
        source = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast(TimestampType))
          .select(col("o_custkey").as("c_custkey")),
        target = t(s, dir, "customer"),
        pkCols = Seq("c_custkey"))),

    // Semi-join (EXISTS): parts that ever shipped. The lineitem side is
    // reduced to DISTINCT keys first (a fraction of the fact table) and
    // broadcast — the semi-join then runs broadcast-side with no shuffle
    // of the big table. At scales where the key set outgrows broadcast,
    // drop the hint and Spark falls back to a shuffled semi-join.
    "q_semi_join" -> ((s, dir) => {
      val keys = t(s, dir, "lineitem").select(col("l_partkey")).distinct()
      t(s, dir, "part")
        .join(broadcast(keys), col("p_partkey") === col("l_partkey"), "left_semi")
        .select("p_partkey", "p_name")
    }),

    // J4-style multi-join + aggregation: revenue per nation. nation/region
    // are broadcast (small dims); the orders⋈customer shuffle is keyed once.
    "q_join_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          // exact decimal sum, then DOUBLE on both sides → bit-identical
          // canonical value for the driver's hash (see q1_agg note)
          sum(col("o_totalprice").cast(dec)).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // TPC-H Q5-shape 5-way join: local-supplier revenue per nation.
    // nation broadcasts; customer⋈orders⋈lineitem shuffle on their keys;
    // supplier (small) broadcasts into the lineitem side. Decimal-exact
    // revenue → DOUBLE canonical (see q1_agg note).
    "q_supplier_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val rev = (col("l_extendedprice").cast(dec) *
        (lit(1).cast(dec) - col("l_discount").cast(dec))).cast(DecimalType(18, 4))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(rev).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Salted skew join through the gate: the salting machinery (row salt
    // on the big side, salt-replicated small side, join on key+salt) is
    // pure implementation detail — the oracle sees only the plain join
    // semantics it must be equivalent to. saltFactor 4 exercises real
    // replication; the aggregate keeps the gated result compact.
    "q_skew_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_partkey", "l_quantity")
      val part = t(s, dir, "part").select("p_partkey", "p_brand")
        .withColumnRenamed("p_partkey", "l_partkey")
      graft.operators.Skew.saltedJoin(li, part, Seq("l_partkey"), saltFactor = 4)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(dec)).cast(DoubleType).as("sum_qty"))
    }),

    // The skew CLOSED LOOP (round-8 verdict #7): the salted plan is
    // chosen FROM the diagnosis, not hand-configured — keySkew reports
    // the join key's heaviest keys, saltFactorFromSkew sizes S so the
    // hottest key's share spreads to ≤ one fair partition load at the
    // session's shuffle parallelism (S = 1 ⇒ salting off), and the
    // join runs salted at that S. The oracle sees only the plain join
    // semantics — the equivalence holds for EVERY S by the salt-
    // invariance property, so the data-dependent S never leaks into
    // correctness.
    "q_skew_join_auto" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_partkey", "l_quantity")
      val report = graft.operators.HeavyHitters.keySkew(li, "l_partkey", k = 20)
      val saltF = graft.operators.Skew.saltFactorFromSkew(report,
        partitions = s.sessionState.conf.numShufflePartitions)
      val part = t(s, dir, "part").select("p_partkey", "p_brand")
        .withColumnRenamed("p_partkey", "l_partkey")
      graft.operators.Skew.saltedJoin(li, part, Seq("l_partkey"), saltF)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(dec)).cast(DoubleType).as("sum_qty"))
    }),

    // CO-LOCATED join through the gate: both sides written once as
    // bucketed + in-bucket-sorted catalog tables on the join key, then
    // joined — the SMJ plans with no Exchange on either side (the plan
    // property PlanSpec pins); the oracle only sees the plain join the
    // layout must be transparent to. Scratch tables are per-query and
    // dropped after materialization.
    "q_colocated_join" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
      s.sql("DROP TABLE IF EXISTS graft_co_orders")
      s.sql("DROP TABLE IF EXISTS graft_co_lineitem")
      // Bucket count sized from the INPUT BYTES (round-15 verdict #1:
      // this was a hardcoded 32 "= the session's core count" — a
      // local[32] literal that quadrupled per-bucket file overhead at
      // sf0.1, 1.53 → 3.44 s driver-measured, while the rung win came
      // from parallelism, not from 32 specifically). Same rule as
      // [[QueriesPipeline.scratchBuckets]]: ~4 MiB of the larger join
      // side per bucket, floored at the historical 8, capped at session
      // parallelism — sf0.1's ~10 MB lineitem stays at 8 (the r14
      // shape), the 100× rung's ~1 GB reaches the cap and the
      // exchange-free join stops idling ¾ of the cores.
      val nb = QueriesPipeline.scratchBuckets(s, dir, "lineitem")
      graft.operators.Colocate.writeBucketed(o, "graft_co_orders", nb,
        Seq("o_orderkey"))
      graft.operators.Colocate.writeBucketed(l, "graft_co_lineitem", nb,
        Seq("o_orderkey"))
      val out = s.table("graft_co_orders")
        .join(s.table("graft_co_lineitem"), "o_orderkey")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(dec)).cast(DoubleType).as("sum_qty"))
        .localCheckpoint(true) // materialize before the scratch tables go
      s.sql("DROP TABLE IF EXISTS graft_co_orders")
      s.sql("DROP TABLE IF EXISTS graft_co_lineitem")
      out
    }),

    // Grouping-sets rollup (beyond the reference — pipeline analytics):
    // per (lang, source) doc counts with subtotal and grand-total rows.
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "documents")
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))),

    // W1 row_number over a total order (checksum.rs:82). Since only
    // rn <= 50 survives, take the top-50 FIRST (TakeOrderedAndProject:
    // per-partition top-k + merge, no shuffle-to-one-partition), then
    // number the 50 survivors via range-partition + per-partition offsets
    // (IdExtraction.rowNumberIds) — no partition-less global window, so
    // the plan is warning-free AND the same numbering scales to frames
    // where k isn't tiny.
    "q_rownumber" -> ((s, dir) =>
      graft.types.IdExtraction.rowNumberIds(
          t(s, dir, "part")
            .select(col("p_partkey"))
            .orderBy(col("p_partkey"))
            .limit(50),
          Seq(col("p_partkey")))
        .select(col("p_partkey"), col("__rid").cast("int").as("rn"))),

    // O1/S11/S16 keyset pagination: one page of the batched reader.
    "q_keyset_page" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") > 1000)
        .orderBy(col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")),

    // Top-k with deterministic tiebreak — executed as per-partition
    // top-k + merge (TakeOrderedAndProject), not a full sort.
    "q_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_totalprice")),

    // A4 ordered table checksum (verify path, checksum.rs:33-111).
    "q_checksum" -> ((s, dir) =>
      Checksum.orderedChecksum(t(s, dir, "nation"))),

    // A4 scalable variant: order-insensitive sum-of-hashes — not
    // oracle-expressible (xxhash64 is Spark-specific) → oracle checks
    // the row_count column only via q_checksum; bench uses this one.
    // (kept out of the oracle map)

    // T7 `_latest` materialization: newest event per user
    // (sync_sqlite.rs:166-202) — max_by aggregation, not a window.
    "q_latest_dedup" -> ((s, dir) =>
      IncrementalSync.latestByKey(
        Tables.events(s, dir).select("user_id", "event_id", "event_type", "value"),
        keyCols = Seq("user_id"), cursorCol = "event_id")
        .select("user_id", "event_id", "event_type", "value")),

    // K2/§1.3 JSONB-model encode: (id, tagged-JSON data, _source_type).
    "q_jsonb_encode" -> ((s, dir) =>
      TaggedJson.toJsonbModel(t(s, dir, "nation"), col("n_nationkey"), "sqlite")),

    // S18–S19/§1.3 Mongo document pipeline: ObjectId `_id` dispatch
    // (hex extraction, converter.rs:236-250) + whole-document encoding
    // with the reference's `_type` tags (document_to_json). The `_id` is
    // provably non-null → the id extraction plans as a pure narrow map
    // (no row-number shuffle). Reader surface itself is mock-pinned in
    // MongoCatalogSpec (no live Mongo in the sandbox).
    "q_mongo_ingest" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val oid = coalesce(lpad(col("c_custkey").cast(StringType), 24, "0"), lit(""))
      val docs = c.select(
        struct(oid.as("$oid")).as("_id"),
        col("c_name"), col("c_nationkey"))
      graft.jsonb.MongoIngest.toDocuments(docs)
    }),

    // The query side of the JSONB document model: path extraction out of
    // a JSON column + aggregation (what the reference's GIN index on
    // `data` exists to serve). ONE typed from_json parse per row with an
    // explicit schema — get_json_object re-runs a path engine per call and
    // measured 13× slower than its table-mates (round-2 verdict #4).
    "q_json_extract" -> ((s, dir) => {
      val k = from_json(col("props"), StructType(Seq(StructField("k", LongType))))
        .getField("k")
      Tables.events(s, dir)
        .select(col("event_type"), k.as("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"),
          count(when(col("k") >= 80, 1)).as("n_high"))
    }),

    // VariantType twin of q_json_extract (survey §1.3): Spark 4's VARIANT
    // parses the JSON once into a binary-encoded value and path-extracts
    // from that — the engine-native answer to the reference's JSONB+GIN
    // model (shredded storage rather than per-query path engines). Same
    // aggregation, same oracle; SCALE.md records the measured from_json
    // vs variant cost.
    "q_json_variant" -> ((s, dir) => {
      val k = variant_get(parse_json(col("props")), "$.k", "long")
      Tables.events(s, dir)
        .select(col("event_type"), k.as("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"),
          count(when(col("k") >= 80, 1)).as("n_high"))
    }),

    // T1–T5 full sync cycle end-to-end: a stale target (rows at/below the
    // watermark, plus planted orphan rows whose keys no longer exist in
    // the source) is driven through one incremental-upsert + delete-
    // reconciliation cycle — the merged target must equal the source
    // EXACTLY, which is precisely what the oracle checks.
    "q_sync_cycle" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("event_id", "user_id", "event_type", "value")
      val watermark = 5000L
      val target0 = ev.filter(col("event_id") <= watermark)
        .unionByName(ev.filter(col("event_id") % 100 === 0)
          .withColumn("event_id", col("event_id") + 10000000))
      val (merged, _) = SyncCycle.runCycle(ev, target0, "event_id",
        Seq("event_id"), watermark, reconcile = true)
      merged
    }),

    // P7 config fingerprint semantics: order-insensitive SHA-256 over the
    // distinct source set (filters.rs:81-108 uses sorted components).
    "q_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").agg(
        sha2(to_binary(array_join(sort_array(collect_set(col("source"))), ","),
                       lit("utf-8")), 256).as("fp"),
        count_distinct(col("source")).as("n_sources")))
  )

  val oracleSql: Map[String, String] = Map(
    "q_full_scan" -> "SELECT * FROM region",

    "q_projection" -> "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",

    "q_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'""".stripMargin,

    "q_time_window" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE ts >= (SELECT max(ts) - INTERVAL 7 DAY FROM events)""".stripMargin,

    "q_schema_only" -> "SELECT o_orderkey, o_orderstatus FROM orders WHERE 1=0",

    "q_count_stats" ->
      """SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders,
        | max(l_orderkey) AS max_key FROM lineitem""".stripMargin,

    "q_incremental_scan" ->
      """SELECT count(*) AS n_changes, max(event_id) AS new_watermark
        |FROM events WHERE event_id > 5000""".stripMargin,

    "q_anti_join" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')""".stripMargin,

    "q_semi_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin,

    "q_join_agg" ->
      """SELECT n_name,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q_supplier_join" ->
      """SELECT n_name,
        | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q_skew_join" ->
      """SELECT p_brand, count(*) AS n_items,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,

    // identical plain-join semantics: the diagnosis-derived salt factor
    // must be invisible to the result
    "q_skew_join_auto" ->
      """SELECT p_brand, count(*) AS n_items,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,

    "q_colocated_join" ->
      """SELECT o_custkey, count(*) AS n_items,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_custkey""".stripMargin,

    "q_rollup" ->
      """SELECT lang, source, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin,

    "q_rownumber" ->
      """SELECT p_partkey, rn FROM (
        | SELECT p_partkey, row_number() OVER (ORDER BY p_partkey) AS rn FROM part)
        |WHERE rn <= 50""".stripMargin,

    "q_keyset_page" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey > 1000 ORDER BY o_orderkey LIMIT 100""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q_checksum" ->
      """SELECT CASE WHEN count(*) = 0 THEN 'empty'
        |  ELSE md5(string_agg(row_data, '' ORDER BY row_data)) END AS checksum,
        | count(*) AS row_count
        |FROM (SELECT concat_ws('|',
        |   coalesce(CAST(n_nationkey AS VARCHAR), ''),
        |   coalesce(n_name, ''),
        |   coalesce(CAST(n_regionkey AS VARCHAR), '')) AS row_data FROM nation)""".stripMargin,

    "q_latest_dedup" ->
      """SELECT user_id, event_id, event_type, value FROM (
        | SELECT user_id, event_id, event_type, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,

    "q_jsonb_encode" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS id,
        | '{"n_nationkey":' || CAST(n_nationkey AS VARCHAR) ||
        | ',"n_name":"' || n_name ||
        | '","n_regionkey":' || CAST(n_regionkey AS VARCHAR) || '}' AS data,
        | 'sqlite' AS _source_type
        |FROM nation""".stripMargin,

    "q_mongo_ingest" ->
      """SELECT lpad(CAST(c_custkey AS VARCHAR), 24, '0') AS id,
        | '{"_id":{"_type":"objectid","$oid":"' || lpad(CAST(c_custkey AS VARCHAR), 24, '0') ||
        | '"},"c_name":"' || c_name || '","c_nationkey":' || CAST(c_nationkey AS VARCHAR) || '}' AS data,
        | 'mongodb' AS _source_type
        |FROM customer""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        | count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 80 THEN 1 END) AS n_high
        |FROM events GROUP BY event_type""".stripMargin,

    // identical result to q_json_extract — only the Spark-side parse
    // representation differs (VARIANT vs typed struct)
    "q_json_variant" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        | count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 80 THEN 1 END) AS n_high
        |FROM events GROUP BY event_type""".stripMargin,

    "q_sync_cycle" ->
      "SELECT event_id, user_id, event_type, value FROM events",

    "q_fingerprint" ->
      """SELECT sha256(string_agg(source, ',' ORDER BY source)) AS fp,
        | count(*) AS n_sources
        |FROM (SELECT DISTINCT source FROM documents)""".stripMargin
  )
}
