package graft.sharing

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.sharing.fs.SignedHttpFileSystem

/** Connection-string entry point:
  * `GraftSharing.read(spark, "<profile-path>#<share>.<schema>.<table>")`
  * (reference src/datasource/table.rs:93-103).
  *
  * Execution model (SURVEY §3.2, Spark-first):
  *  - driver: REST file listing (with optional predicate/limit hints);
  *  - each file becomes a self-contained `graftshare://` path — Spark
  *    plans one or more file partitions per file (NOT the reference's
  *    all-files-in-one-partition scan, src/datasource/scan.rs:77);
  *  - executors: Spark's vectorized parquet reader over HTTP Range
  *    reads; projection/filter pushdown reach the parquet scan natively;
  *  - partition values (strings outside the files) become constant
  *    columns cast to the schema type per partition-value group, empty
  *    string ⇒ NULL (src/datasource/scan.rs:191-229) — Catalyst folds
  *    the per-group union back into parallel scans.
  */
object GraftSharing {

  /** Parse `<profile>#<share>.<schema>.<table>`. */
  def parseConnection(connStr: String): (String, TableRef) =
    connStr.split("#") match {
      case Array(profilePath, fqn) => (profilePath, TableRef.parse(fqn))
      case _ => throw DeltaSharingException.parseSecurable(
        "connection string must be <profile-path>#<share>.<schema>.<table>")
    }

  def read(spark: SparkSession, connStr: String): DataFrame = {
    val (profilePath, table) = parseConnection(connStr)
    readTable(spark, new DeltaSharingClient(Profile.fromPath(profilePath)), table)
  }

  /** Read a shared table; `filters` become best-effort server hints (the
    * caller must still apply them — Inexact semantics) and `limitHint` is
    * forwarded but not enforced. `versionAsOf` pins the read to a past
    * table version (Delta Sharing time travel — the snapshot the server
    * reconstructs from its change log). */
  def readTable(spark: SparkSession, client: DeltaSharingClient,
      table: TableRef, filters: Seq[Filter] = Seq.empty,
      limitHint: Option[Long] = None,
      versionAsOf: Option[Long] = None): DataFrame = {
    val schemaForHints = DeltaSchema.fromSchemaString(
      client.getTableMetadata(table, versionAsOf)._2.schemaString)
    // translate ONCE; the wire hint and the stats pruning below derive
    // from the same Seq[Op] so they can never drift apart
    val ops = filters.flatMap(f => PredicateHints.fromFilter(f, schemaForHints))
    val (protocol, metadata, files) = client.getTableData(table,
      PredicateHints.toHintJson(ops), limitHint, versionAsOf)
    if (protocol.minReaderVersion > 1)
      throw DeltaSharingException.other(
        s"unsupported minReaderVersion ${protocol.minReaderVersion}")
    val schema = DeltaSchema.fromSchemaString(metadata.schemaString)
    // Driver-side file skipping on per-file stats (SURVEY §4 improvement
    // over the reference, which parses stats and ignores them): drop
    // files whose min/max envelope provably excludes every pushed
    // filter BEFORE any partition is planned. Purely an optimization —
    // the engine-side residual filter still runs either way.
    dataFrameForFiles(spark, schema, metadata.partitionColumns,
      StatsPruning.prune(files, ops))
  }

  /** Read the change data feed between versions as a DataFrame with
    * `_change_type` / `_commit_version` / `_commit_timestamp` metadata
    * columns alongside the data — CDC-consumer shape. Each (type,
    * version) group scans its files in parallel; Catalyst folds the
    * per-group union back into concurrent scans. */
  def readChanges(spark: SparkSession, client: DeltaSharingClient,
      table: TableRef, startingVersion: Long,
      endingVersion: Option[Long] = None): DataFrame = {
    val (_, metadata, changes) =
      client.getTableChanges(table, startingVersion, endingVersion)
    val schema = DeltaSchema.fromSchemaString(metadata.schemaString)
    val groups = changes.groupBy(c => (c.changeType, c.version, c.timestamp))
    val parts = groups.toSeq.sortBy(g => (g._1._2, g._1._1)).map {
      case ((changeType, version, ts), groupChanges) =>
        dataFrameForFiles(spark, schema, metadata.partitionColumns,
          groupChanges.map(_.file))
          .withColumn("_change_type", lit(changeType))
          .withColumn("_commit_version", lit(version))
          .withColumn("_commit_timestamp", lit(ts.orNull).cast("long"))
    }
    if (parts.isEmpty)
      throw DeltaSharingException.other(
        s"no changes for $table in [$startingVersion, ${endingVersion.getOrElse("∞")}]")
    parts.reduce(_ unionAll _)
  }

  /** Tail the change data feed as a STREAM: each micro-batch covers the
    * newly committed versions `(cursor, latest]`, with the same
    * `_change_type`/`_commit_version`/`_commit_timestamp` columns as
    * [[readChanges]]. Offsets are table versions, checkpoint-recoverable;
    * files are scanned by Spark's vectorized parquet reader (see
    * [[graft.sharing.streaming.GraftCdfStreamProvider]]). */
  def readChangesStream(spark: SparkSession, profilePath: String,
      table: TableRef, startingVersion: Long): DataFrame =
    spark.readStream
      .format("graft-sharing-cdf")
      .option("path", s"$profilePath#${table.share}.${table.schema}.${table.name}")
      .option("startingVersion", startingVersion.toString)
      .load()

  /** Reconstruct a table snapshot by folding a change feed onto a base:
    * per commit version (ascending), added rows union in and removed
    * rows fall out (multiset semantics — `exceptAll`, so duplicate rows
    * are removed once per removal, matching file-level CDF). Only the
    * version LIST is collected to the driver (commit metadata, not
    * data); each fold step stays a distributed union/anti-join. */
  def applyChanges(base: DataFrame, changes: DataFrame): DataFrame = {
    val dataCols = base.columns.toSeq
    val versions = changes.select("_commit_version").distinct()
      .collect().map(_.getLong(0)).sorted
    versions.foldLeft(base) { (acc, v) =>
      val cv = changes.filter(col("_commit_version") === v)
      val added = cv.filter(col("_change_type") === "add")
        .select(dataCols.map(col): _*)
      val removed = cv.filter(col("_change_type") === "remove")
        .select(dataCols.map(col): _*)
      acc.unionAll(added).exceptAll(removed)
    }
  }

  /** Build the DataFrame for a listed file set. */
  def dataFrameForFiles(spark: SparkSession, schema: StructType,
      partitionColumns: Seq[String], files: Seq[FileAction]): DataFrame = {
    SignedHttpFileSystem.register(spark.sparkContext.hadoopConfiguration)
    val partSet = partitionColumns.toSet
    val dataSchema = StructType(schema.fields.filterNot(f => partSet(f.name)))

    if (files.isEmpty) {
      import scala.jdk.CollectionConverters._
      return spark.createDataFrame(Seq.empty[org.apache.spark.sql.Row].asJava, schema)
    }

    def pathOf(f: FileAction): String =
      SignedHttpFileSystem.encode(f.url, f.size)

    // One scan per distinct partition-value combination; the constant
    // partition columns are appended with the typed cast (empty ⇒ NULL,
    // matching reference deserialize_partition_values, scan.rs:191-229).
    val groups = files.groupBy(_.partitionValues).toSeq
    val parts = groups.map { case (pv, groupFiles) =>
      var df = spark.read.schema(dataSchema)
        .parquet(groupFiles.map(pathOf): _*)
      partitionColumns.foreach { pc =>
        val fieldType = schema(pc).dataType
        val raw = pv.getOrElse(pc, "")
        val value =
          if (raw.isEmpty) lit(null).cast(fieldType)
          else lit(raw).cast(fieldType)
        df = df.withColumn(pc, value)
      }
      df.select(schema.fieldNames.map(col).toSeq: _*)
    }
    parts.reduce(_ unionAll _)
  }
}
