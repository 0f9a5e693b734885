package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, In, InSet, Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, TableScan}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sinks.BucketedMergeTarget
import graft.sinks.BucketedMergeTarget.Manifest

/** SQL façade over [[BucketedMergeTarget]] stores — round-4 verdict #8.
  *
  * Read:  `spark.read.format("graft-store").load(storeDir)`, or plain SQL
  * via `CREATE TEMPORARY VIEW sigs USING `graft-store` OPTIONS (path …)`.
  * Write: `df.write.format("graft-store").option("pk", "id")
  * .option("cursor", "batch_id").mode("append").save(storeDir)` — a
  * [[BucketedMergeTarget.merge]] (idempotent latest-wins upsert), never a
  * blind file dump.
  *
  * DESIGN — resolve to the native scan, don't hand-roll a reader: the
  * relation itself is only a manifest snapshot; [[GraftStoreRewrite]]
  * (injected by `GraftExtensions`) replaces it at optimization time with
  * a parquet scan over exactly the bucket directories the query's
  * bucket-key predicates can touch — the same manifest pruning
  * [[BucketedMergeTarget.readMatching]] does for the incremental
  * operators, now observable in any SQL plan. Everything downstream of
  * the rewrite is stock Spark: the vectorized parquet reader, remaining
  * predicates pushed into the scan (`PushedFilters`), column pruning,
  * whole-stage codegen. A hand-written DSv2 `PartitionReader` would have
  * to re-implement all four, row-at-a-time.
  *
  * The manifest is pinned at relation-creation time: a view reads one
  * committed version for its lifetime (snapshot isolation — re-`load` to
  * see later commits). The reference exposes replicated tables to SQL
  * through PG itself (`src/jsonb/writer.rs` writes ordinary tables);
  * this is the Spark-native equivalent for the store the incremental
  * operators maintain.
  */
class GraftStoreProvider extends RelationProvider
    with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-store"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-store: a path is required — .load(<storeDir>) / OPTIONS (path '<storeDir>')"))

  private def parseCols(s: String): Seq[String] =
    s.split(',').toSeq.map(_.trim).filter(_.nonEmpty)

  /** `spark.readStream.format("graft-store")`: follow the store as a
    * changed-bucket upsert feed (see [[GraftStoreStreamSource]]). The
    * schema is the store's committed schema — the store must exist when
    * the stream starts (a follower follows something), unless the caller
    * supplies one explicitly via `.schema(...)`. Option
    * `maxBucketsPerTrigger` bounds each micro-batch's bucket count
    * (`maxFilesPerTrigger` discipline — large catch-up deltas walk
    * through as a series of bounded batches). */
  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val p = path(parameters)
    val s = schema.orElse(
      BucketedMergeTarget.currentManifest(sqlContext.sparkSession, p).map(_.schema))
      .getOrElse(throw new IllegalStateException(
        s"graft-store source: no committed manifest under $p — seed the store " +
          "first, or pass an explicit .schema(...)"))
    // opt-in delete fidelity: the feed grows a boolean tombstone marker
    val withTomb =
      if (tombstonesOn(parameters) &&
          !s.fieldNames.contains(GraftStoreStreamSource.DeletedCol))
        s.add(GraftStoreStreamSource.DeletedCol,
          org.apache.spark.sql.types.BooleanType, nullable = false)
      else s
    (s"graft-store[$p]", withTomb)
  }

  private def tombstonesOn(parameters: Map[String, String]): Boolean =
    parameters.get("tombstones").exists(_.toBoolean)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val p = path(parameters)
    new GraftStoreStreamSource(sqlContext.sparkSession, p,
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      parameters.get("maxBucketsPerTrigger").map(_.toInt),
      tombstones = tombstonesOn(parameters))
  }

  /** `df.writeStream.format("graft-store")`: every micro-batch lands as
    * ONE merge commit. The EPOCH id is the cursor (unless option
    * `cursor` names a data column), so a replayed epoch — Spark's
    * at-least-once unit — overwrites itself: latest-wins per key makes
    * the store exactly-once. Append and Update modes are upserts by PK;
    * Complete is refused (it would mean replacing the store per epoch —
    * use replaceAll batch-side if that is really wanted). */
  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    import org.apache.spark.sql.streaming.OutputMode
    require(outputMode == OutputMode.Append() || outputMode == OutputMode.Update(),
      s"graft-store sink: $outputMode is not supported — Append/Update are upserts " +
        "by PK; Complete would replace the store every epoch")
    val p = path(parameters)
    val pkOpt = parameters.get("pk").map(parseCols)
    val cursorOpt = parameters.get("cursor")
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        val spark = data.sparkSession
        // the incoming frame wraps the micro-batch's ALREADY-EXECUTED
        // plan; re-planning it (withColumn → write) would re-analyze a
        // streaming logical plan and fail. Rebuild a plain batch frame
        // from the executed rows — the standard V1-sink discipline.
        val schema = data.schema
        val rdd = data.queryExecution.toRdd.mapPartitions { it =>
          val conv = CatalystTypeConverters.createToScalaConverter(schema)
          it.map(ir => conv(ir.copy()).asInstanceOf[Row])
        }
        val batch = spark.createDataFrame(rdd, schema)
        val existing = BucketedMergeTarget.currentManifest(spark, p)
        val pk = pkOpt.orElse(existing.map(_.pkCols).filter(_.nonEmpty))
          .getOrElse(throw new IllegalArgumentException(
            "graft-store sink: option 'pk' is required on the first epoch"))
        val nBuckets = existing.map(_.nBuckets)
          .orElse(parameters.get("buckets").map(_.toInt))
          .getOrElse(BucketedMergeTarget.DefaultBuckets)
        val bucketCols = existing.map(_.bucketCols).filter(_.nonEmpty)
          .orElse(parameters.get("bucketCols").map(parseCols)).getOrElse(Nil)
        // option 'tombstoneCol': rows flagged true are DELETES (pk-only);
        // the rest upsert. Both land in ONE applyBatch commit, so an
        // epoch is atomic whether or not it carries deletes — the pair
        // for the source's `tombstones` mode. Without the option the
        // upsert-only merge path is byte-for-byte what it always was.
        import org.apache.spark.sql.functions.{coalesce, lit, col => fcol}
        parameters.get("tombstoneCol") match {
          case Some(tc) =>
            val flag = coalesce(fcol(tc), lit(false))
            val upserts = batch.filter(!flag).drop(tc)
            val deletes = batch.filter(flag).select(pk.map(fcol): _*)
            cursorOpt match {
              case Some(c) =>
                BucketedMergeTarget.applyBatch(upserts, deletes, p, pk, c,
                  nBuckets, bucketCols)
              case None =>
                BucketedMergeTarget.applyBatch(
                  upserts.withColumn("_graft_epoch", lit(batchId)),
                  deletes, p, pk, "_graft_epoch", nBuckets, bucketCols)
            }
          case None =>
            cursorOpt match {
              case Some(c) => // a data column carries the version ordering
                BucketedMergeTarget.merge(batch, p, pk, c, nBuckets, bucketCols)
              case None =>
                BucketedMergeTarget.merge(
                  batch.withColumn("_graft_epoch", lit(batchId)),
                  p, pk, "_graft_epoch", nBuckets, bucketCols)
            }
        }
        ()
      }
      override def toString: String = s"GraftStoreSink($p)"
    }
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val p = path(parameters)
    val m = BucketedMergeTarget.currentManifest(spark, p).getOrElse(
      throw new IllegalStateException(s"graft-store: no committed manifest under $p"))
    GraftStoreRelation(spark, p, m)
  }

  /** `df.write.format("graft-store")`: a merge commit. Required options:
    * `pk` (comma-separated), `cursor`. Optional: `buckets` (bucket count,
    * first write only), `bucketCols` (probe-key subset of the PK).
    * Append = merge the batch; Overwrite is refused (a store's history is
    * its crash-safety — use DdlGen-level tooling to drop a store);
    * ErrorIfExists/Ignore follow their contract against an existing
    * manifest. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val p = path(parameters)
    val existing = BucketedMergeTarget.currentManifest(spark, p)
    val skip = mode match {
      case SaveMode.Append => false
      case SaveMode.ErrorIfExists =>
        if (existing.isDefined) throw new IllegalStateException(
          s"graft-store: $p already has a committed manifest (mode ErrorIfExists)")
        false
      case SaveMode.Ignore => existing.isDefined
      case SaveMode.Overwrite => throw new IllegalArgumentException(
        "graft-store: Overwrite is not supported — merges are incremental by design")
    }
    // option parsing/validation stays INSIDE the write branch: a skipped
    // save (Ignore against an existing store) is a no-op and must not
    // fail on options the skipped write would have needed
    val nBuckets = existing.map(_.nBuckets).orElse(parameters.get("buckets").map(_.toInt))
    val bucketCols = existing.map(_.bucketCols).filter(_.nonEmpty)
      .orElse(parameters.get("bucketCols")
        .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty)))
      .getOrElse(Nil)
    // pk defaults to what the store records (merge() verifies a given one
    // against the manifest — a mismatched re-specification fails loudly)
    val pkOpt = parameters.get("pk")
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .orElse(existing.map(_.pkCols).filter(_.nonEmpty))
    if (!skip) {
      val pk = pkOpt.getOrElse(throw new IllegalArgumentException(
        "graft-store write: option 'pk' (comma-separated primary key) is required " +
          "on first write (later writes default to the store's recorded key)"))
      val cursor = parameters.getOrElse("cursor", throw new IllegalArgumentException(
        "graft-store write: option 'cursor' (monotone version column) is required"))
      BucketedMergeTarget.merge(data, p, pk, cursor,
        nBuckets.getOrElse(BucketedMergeTarget.DefaultBuckets), bucketCols)
    }
    BucketedMergeTarget.currentManifest(spark, p) match {
      case Some(m) => GraftStoreRelation(spark, p, m)
      case None =>
        // a legitimately-EMPTY first batch (e.g. a CDC tick with no
        // changes) commits nothing — return an empty relation with the
        // batch's schema instead of failing a successful no-op save
        val b64 = java.util.Base64.getEncoder
          .encodeToString(data.schema.json.getBytes("UTF-8"))
        GraftStoreRelation(spark, p,
          Manifest(0L, nBuckets.getOrElse(BucketedMergeTarget.DefaultBuckets),
            Map.empty, b64, Map.empty, bucketCols, pkOpt.getOrElse(Nil)))
    }
  }
}

/** One committed store version. Carries only the manifest snapshot; the
  * optimizer rule turns it into the pruned parquet plan. [[buildScan]]
  * is the extension-less fallback (full manifest read, correct but
  * unpruned). */
final case class GraftStoreRelation(spark: SparkSession, path: String,
                                    manifest: Manifest)
    extends BaseRelation with TableScan {
  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = manifest.schema

  override def buildScan(): RDD[Row] =
    BucketedMergeTarget.readBuckets(spark, path, manifest, manifest.buckets.keySet)
      .drop(BucketedMergeTarget.BucketCol)
      .select(manifest.schema.fieldNames.toIndexedSeq.map(col): _*)
      .rdd

  override def toString: String =
    s"GraftStore($path, v${manifest.version}, ${manifest.buckets.size}/${manifest.nBuckets} buckets)"
}

/** Replaces every [[GraftStoreRelation]] with a native parquet plan over
  * the manifest-pruned bucket directories.
  *
  * Pruning rule: for a conjunctive filter directly above the relation,
  * each bucket column's candidate values are read from `col = lit` /
  * `col IN (lits)` conjuncts; if EVERY bucket column is constrained, the
  * candidate tuples' buckets (same Murmur3 the writer used —
  * [[BucketedMergeTarget.localBucketOf]]) are the only directories
  * listed. Any unconstrained bucket column, non-literal comparison, or a
  * candidate cross-product over [[GraftStoreRewrite.MaxProbeTuples]]
  * falls back to all owned buckets — pruning is an optimization, never a
  * semantics change, and the original filter always stays in the plan
  * (it becomes the parquet scan's `PushedFilters`). */
final case class GraftStoreRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import GraftStoreRewrite.MaxProbeTuples

  private def store(l: LogicalRelation): Option[GraftStoreRelation] =
    l.relation match {
      case r: GraftStoreRelation => Some(r)
      case _ => None
    }

  /** Walk a Project* chain down to a graft-store relation, composing the
    * attribute→store-column mapping through each level's pass-through
    * aliases. A non-Project node (or a projection that computes rather
    * than renames) ends the walk — for computed columns only that
    * attribute drops out of the map, so pruning on it falls back while
    * renamed columns keep pruning. */
  private def chainToStore(plan: LogicalPlan)
      : Option[(Map[org.apache.spark.sql.catalyst.expressions.ExprId, String],
                LogicalRelation, GraftStoreRelation)] = plan match {
    case l: LogicalRelation =>
      store(l).map(r => (l.output.map(a => a.exprId -> a.name).toMap, l, r))
    case p: Project =>
      chainToStore(p.child).map { case (inner, l, r) =>
        val outer = p.projectList.collect {
          case a: AttributeReference if inner.contains(a.exprId) =>
            a.exprId -> inner(a.exprId)
          case al @ Alias(c: AttributeReference, _) if inner.contains(c.exprId) =>
            al.exprId -> inner(c.exprId)
        }.toMap
        (outer, l, r)
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // a filter over any Project* chain down to the relation (view
    // re-aliasing, stacked sub-selects) prunes: the filter's attributes
    // map through the chain's aliases back to store column names, and
    // the relation is replaced IN PLACE so the chain above it stands.
    case f @ Filter(cond, child) if chainToStore(child).isDefined =>
      val (names, l, r) = chainToStore(child).get
      val rewritten = rewrite(l, r, prunedBuckets(cond, names, r.manifest))
      f.copy(child = child.transformUp {
        case ll: LogicalRelation if ll eq l => rewritten
      })
    case l: LogicalRelation if store(l).isDefined =>
      rewrite(l, store(l).get, store(l).get.manifest.buckets.keySet)
  }

  /** Literal candidate values for store column `name` among the
    * conjuncts; `names` maps attribute ids to the store column they
    * carry (internal Catalyst literals converted back to external, as
    * the driver-side bucket hash expects). None = unconstrained. Any
    * single conjunct's set is sound alone: matching rows satisfy every
    * conjunct, so the first usable one bounds the bucket set from
    * above. */
  private def candidates(conj: Seq[Expression],
                         names: Map[org.apache.spark.sql.catalyst.expressions.ExprId, String],
                         name: String): Option[Seq[(Any, DataType)]] = {
    val res = spark.sessionState.conf.resolver
    def carries(a: AttributeReference): Boolean =
      names.get(a.exprId).exists(res(_, name))
    def ext(v: Any, dt: DataType): (Any, DataType) =
      (CatalystTypeConverters.createToScalaConverter(dt)(v), dt)
    conj.iterator.map {
      case EqualTo(a: AttributeReference, Literal(v, dt)) if carries(a) && v != null =>
        Some(Seq(ext(v, dt)))
      case EqualTo(Literal(v, dt), a: AttributeReference) if carries(a) && v != null =>
        Some(Seq(ext(v, dt)))
      case In(a: AttributeReference, elems) if carries(a) &&
          elems.nonEmpty && elems.forall(e => e.isInstanceOf[Literal] &&
            e.asInstanceOf[Literal].value != null) =>
        Some(elems.map { case Literal(v, dt) => ext(v, dt) })
      case InSet(a: AttributeReference, vs) if carries(a) && !vs.contains(null) =>
        Some(vs.toSeq.map(v => ext(v, a.dataType)))
      case _ => None
    }.collectFirst { case Some(vals) => vals }
  }

  private def prunedBuckets(cond: Expression,
                            names: Map[org.apache.spark.sql.catalyst.expressions.ExprId, String],
                            m: Manifest): Set[Int] = {
    val all = m.buckets.keySet
    if (m.bucketCols.isEmpty) return all
    val conj = splitConjunctivePredicates(cond)
    val perCol = m.bucketCols.map(candidates(conj, names, _))
    if (perCol.exists(_.isEmpty)) return all
    val sets = perCol.map(_.get)
    if (sets.map(_.size.toLong).product > MaxProbeTuples) return all
    val tuples = sets.foldLeft(Seq(Seq.empty[(Any, DataType)])) {
      (acc, s) => acc.flatMap(t => s.map(t :+ _))
    }
    tuples.map(t => BucketedMergeTarget.localBucketOf(t, m.nBuckets)).toSet
      .intersect(all)
  }

  /** The pruned parquet plan, output-aliased to the relation's attribute
    * ids so the parent plan rebinds without change. */
  private def rewrite(l: LogicalRelation, r: GraftStoreRelation,
                      buckets: Set[Int]): LogicalPlan = {
    val df = BucketedMergeTarget.readBuckets(r.spark, r.path, r.manifest, buckets)
      .drop(BucketedMergeTarget.BucketCol)
      .select(r.manifest.schema.fieldNames.toIndexedSeq.map(col): _*)
    val newPlan = df.queryExecution.analyzed
    val res = spark.sessionState.conf.resolver
    val out: Seq[NamedExpression] = l.output.map { old =>
      val n = newPlan.output.find(a => res(a.name, old.name)).getOrElse(
        throw new IllegalStateException(
          s"graft-store: column '${old.name}' missing from rewritten scan"))
      Alias(n, old.name)(exprId = old.exprId, qualifier = old.qualifier)
    }
    Project(out, newPlan)
  }
}

object GraftStoreRewrite {
  /** Probe cross-products larger than this read all buckets instead —
    * at that point a pruned union of most of the store no longer beats
    * one listed scan. */
  val MaxProbeTuples = 1024L
}
