package graft.sharing.catalog

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScanBuilder, ParquetTable}

import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sharing._
import graft.sharing.fs.SignedHttpFileSystem

/** DSv2 table over a shared Delta table (reference
  * src/datasource/table.rs:144-218). Read-only batch scans;
  * `versionAsOf` pins every server query to a past version (SQL
  * `VERSION AS OF` routes here through GraftCatalog). */
final class GraftTable(client: DeltaSharingClient, ref: TableRef,
    metadata: Metadata, profilePath: Option[String] = None,
    versionAsOf: Option[Long] = None)
  extends Table with SupportsRead {

  private val fullSchema: StructType =
    DeltaSchema.fromSchemaString(metadata.schemaString)

  override def name(): String =
    versionAsOf.fold(ref.toString)(v => s"$ref@v$v")
  override def schema(): StructType = fullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def partitioning(): Array[Transform] =
    metadata.partitionColumns.map(c => Expressions.identity(c)).toArray

  override def properties(): util.Map[String, String] =
    (metadata.configuration ++
      metadata.version.map("delta.version" -> _) ++
      metadata.size.map(s => "delta.sizeInBytes" -> s.toString) ++
      metadata.numFiles.map(n => "delta.numFiles" -> n.toString)).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(client, ref, metadata, fullSchema, options,
      profilePath, versionAsOf)
}

/** Pushdown negotiation (reference src/datasource/table.rs:174-213):
  *
  *  - filters: recorded and reported fully-residual (the reference's
  *    Inexact semantics, table.rs:207 — Spark keeps every filter above
  *    the scan, so best-effort server pruning can never drop rows);
  *  - columns: delegated (vectorized reader prunes parquet columns);
  *  - limit: forwarded as `limitHint`, reported PARTIAL (`pushLimit`
  *    returns false) so Spark keeps the global limit, mirroring
  *    table.rs:127-137 + scan.rs:80.
  *
  * The server `query` POST is deferred to `build()`, AFTER Spark has
  * pushed filters, limit, and columns — so the single request carries
  * BOTH `jsonPredicateHints` and `limitHint` (pushing filters eagerly
  * would fire the POST before `pushLimit` runs, and the limit hint would
  * never reach the server). The recorded filters are then replayed into
  * Spark's own ParquetScanBuilder, which still prunes hive-style
  * partition directories locally and pushes data filters into the
  * parquet reader — trustworthy local pruning on top of the hint.
  *
  * The scan itself IS Spark's ParquetScan over `graftshare://` paths that
  * embed the signed URLs (+ hive-style partition-value segments), so
  * execution gets whole-stage codegen, vectorized decode, and
  * one-or-more splits per file — not the reference's single-partition
  * scan (scan.rs:77).
  */
final class GraftScanBuilder(client: DeltaSharingClient, ref: TableRef,
    metadata: Metadata, fullSchema: StructType,
    options: CaseInsensitiveStringMap, profilePath: Option[String] = None,
    versionAsOf: Option[Long] = None)
  extends ScanBuilder
  with SupportsPushDownCatalystFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownLimit {

  private val spark = SparkSession.active
  private var requiredSchema: Option[StructType] = None
  private var catalystFilters: Seq[Expression] = Seq.empty
  private var limitHint: Option[Long] = None
  private var delegate: Option[ParquetScanBuilder] = None
  /** (encoded path, raw partitionValues) for every planned file, and the
    * scan options of the current plan — kept so `build()` can hand
    * GraftScan a rebuild closure for runtime (DPP) file pruning. */
  private var plannedFiles: Seq[(String, Map[String, String])] = Seq.empty
  private var plannedOpts: Option[CaseInsensitiveStringMap] = None
  private var partCols: Seq[String] = metadata.partitionColumns

  /** The hint JSON most recently sent to the server (for tests/explain). */
  @volatile var sentPredicateHints: Option[String] = None

  /** Delegating parquet builder over the given encoded paths, with the
    * recorded column/filter pushdowns replayed. */
  private def builderFor(paths: Seq[String],
      optsWithBase: CaseInsensitiveStringMap): ParquetScanBuilder = {
    val table = ParquetTable(ref.toString, spark, optsWithBase, paths,
      Some(fullSchema), classOf[ParquetFileFormat])
    val b = table.newScanBuilder(optsWithBase).asInstanceOf[ParquetScanBuilder]
    requiredSchema.foreach(b.pruneColumns)
    if (catalystFilters.nonEmpty) b.pushFilters(catalystFilters)
    b
  }

  /** Fire the (single) query POST with all accumulated hints, then build
    * the delegating parquet scan builder and replay recorded pushdowns. */
  private def freshDelegate(): ParquetScanBuilder = {
    SignedHttpFileSystem.register(spark.sparkContext.hadoopConfiguration)
    // translate ONCE; wire hint and stats pruning derive from the same
    // Seq[Op] so they can never drift apart
    val hintOps = catalystFilters.flatMap(
      PredicateHints.fromCatalyst(_, fullSchema))
    val hints = PredicateHints.toHintJson(hintOps)
    sentPredicateHints = hints
    val (_, meta, rawFiles) =
      client.getTableData(ref, hints, limitHint, versionAsOf)
    // driver-side stats skipping on the same predicate AST the hint
    // carries (files the server listed anyway but whose min/max envelope
    // excludes every filter) — the residual FilterExec still re-filters
    val files = StatsPruning.prune(rawFiles, hintOps)
    partCols = meta.partitionColumns
    val uid = java.util.UUID.randomUUID().toString.take(12)
    plannedFiles = files.map { f =>
      SignedHttpFileSystem.encode(f.url, f.size,
        partCols.map(pc => pc -> f.partitionValues.getOrElse(pc, "")), uid,
        refresh = profilePath.map(pp => SignedHttpFileSystem.RefreshSpec(
          pp, ref.share, ref.schema, ref.name, f.id, versionAsOf))) ->
        f.partitionValues
    }
    // common synthetic base so hive-style k=v segments become partitions
    val optsWithBase = {
      val m = new java.util.HashMap[String, String](options)
      m.put("basePath", SignedHttpFileSystem.basePath(uid))
      new CaseInsensitiveStringMap(m)
    }
    plannedOpts = Some(optsWithBase)
    val b = builderFor(plannedFiles.map(_._1), optsWithBase)
    delegate = Some(b)
    b
  }

  /** Inexact pushdown: record the filters for the hint, return ALL of
    * them as residuals. No server round-trip yet. */
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    catalystFilters = filters
    delegate = None
    filters
  }

  override def pushedFilters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    delegate.map(_.pushedFilters).getOrElse(Array.empty)

  override def pruneColumns(schema: StructType): Unit = {
    requiredSchema = Some(schema)
    delegate.foreach(_.pruneColumns(schema))
  }

  /** PARTIAL limit: hint only; Spark keeps the global limit. */
  override def pushLimit(limit: Int): Boolean = {
    limitHint = Some(limit.toLong)
    delegate = None
    false
  }

  /** Build the delegate scan, wrapped for runtime (DPP) file pruning
    * when the table is partitioned — see [[GraftScan]]. */
  override def build(): Scan = {
    val b = delegate.getOrElse(freshDelegate())
    val inner = b.build()
    if (partCols.isEmpty) inner
    else {
      val types = partCols.flatMap(c =>
        fullSchema.fields.find(_.name.equalsIgnoreCase(c))
          .map(f => c -> f.dataType))
      new GraftScan(inner, plannedFiles, types,
        paths => builderFor(paths, plannedOpts.get).build())
    }
  }
}
