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
      endingVersion: Option[Long] = None): DataFrame =
    changesFrame(spark, table,
      client.getTableChanges(table, startingVersion, endingVersion),
      s"[$startingVersion, ${endingVersion.getOrElse("∞")}]")

  /** [[readChanges]] with the start bound given as an ISO-8601
    * timestamp (protocol `startingTimestamp`): the server resolves it
    * to the earliest version committed at or after it. */
  def readChangesByTimestamp(spark: SparkSession,
      client: DeltaSharingClient, table: TableRef,
      startingTimestamp: String,
      endingVersion: Option[Long] = None): DataFrame =
    changesFrame(spark, table,
      client.getTableChangesByTimestamp(table, startingTimestamp,
        endingVersion),
      s"[$startingTimestamp, ${endingVersion.getOrElse("∞")}]")

  private def changesFrame(spark: SparkSession, table: TableRef,
      fetched: (Protocol, Metadata, Seq[Actions.ChangeAction]),
      boundsForError: String): DataFrame = {
    val (_, metadata, changes) = fetched
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
        s"no changes for $table in $boundsForError")
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

  /** Reconstruct a table snapshot by applying a change feed onto a base:
    * per commit version (ascending), added rows union in and removed
    * rows fall out (multiset semantics: duplicate rows are removed once
    * per removal, matching file-level CDF).
    *
    * CONSTANT plan depth, independent of the version count. The naive
    * per-version `unionAll`/`exceptAll` fold (kept below as
    * [[applyChangesFold]], the semantic oracle) builds an O(#versions)
    * plan — at hundreds of commits the analyzer/lineage cost alone
    * becomes a driver-side bottleneck. Instead, note that per distinct
    * row value the fold is the queue recursion
    * `c_v = max(c_{v-1} + adds_v − removes_v, 0)`, whose closed form
    * over per-version deltas δ with prefix sums S is
    * `c_final = S_n + max(base_count, −min_k S_k)`. One aggregation
    * keyed on row identity + `_commit_version`, one `array_sort` over
    * the (tiny) per-row version list, and a null-safe full-outer join
    * against base counts compute exactly that — a fixed number of
    * shuffles at any history length, all distributed on row identity. */
  def applyChanges(base: DataFrame, changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val dataCols = base.columns.toSeq
    // (row value, version) → net delta, then per row value the
    // version-ascending delta list (array_sort orders structs by their
    // first field, `v` — unique per row after the two-key groupBy)
    val perRow = changes
      .filter(col("_change_type").isin("add", "remove"))
      .select(dataCols.map(col) :+ col("_commit_version").as("_v") :+
        when(col("_change_type") === "add", 1L).otherwise(-1L).as("_d"): _*)
      .groupBy((dataCols :+ "_v").map(col): _*)
      .agg(sum(col("_d")).as("_delta"))
      .groupBy(dataCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("_v").as("v"),
        col("_delta").as("d")))).as("_ds"))
    val baseCounts = base.groupBy(dataCols.map(col): _*)
      .agg(count(lit(1)).as("_b"))
    // null-safe join: CDF rows with NULL data columns must line up with
    // equal base rows, exactly as exceptAll treats NULL = NULL
    val joinCond = dataCols.map(c => baseCounts(c) <=> perRow(c))
      .reduce(_ && _)
    baseCounts.join(perRow, joinCond, "full_outer")
      .select(
        dataCols.map(c => coalesce(baseCounts(c), perRow(c)).as(c)) ++ Seq(
          coalesce(col("_b"), lit(0L)).as("_b"),
          coalesce(col("_ds"),
            array().cast("array<struct<v:bigint,d:bigint>>")).as("_ds")): _*)
      // running (prefix sum, running min) over the version-ordered
      // deltas; including S_0 = 0 in the min is harmless since the base
      // count is never negative
      .withColumn("_acc",
        aggregate(col("_ds"), struct(lit(0L).as("s"), lit(0L).as("m")),
          (acc, x) => {
            val s2 = acc.getField("s") + x.getField("d")
            struct(s2.as("s"), least(acc.getField("m"), s2).as("m"))
          }))
      .withColumn("_n",
        col("_acc.s") + greatest(col("_b"), -col("_acc.m")))
      .filter(col("_n") > 0)
      .withColumn("_i", explode(sequence(lit(1L), col("_n"))))
      .select(dataCols.map(col): _*)
  }

  /** The per-version `unionAll`/`exceptAll` fold — the readable semantic
    * statement of [[applyChanges]], kept as its test oracle. O(#versions)
    * plan depth: do not use on long histories. */
  private[sharing] def applyChangesFold(base: DataFrame,
      changes: DataFrame): DataFrame = {
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
