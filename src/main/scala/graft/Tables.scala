package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central loaders for the driver-generated TPC-H-ish tables
  * (see /root/repo/TESTDATA.md). Every operator in the engine reads
  * through here so that scan-level concerns (vectorized parquet read,
  * column pruning, filter pushdown) stay uniform.
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * loaders keep the access path declarative (`spark.read.parquet`) so
  * Catalyst drives pushdown identically at any scale.
  */
object Tables {
  /** All driver-generated tables. `documents`/`embeddings` are present at
    * every scale factor alongside the TPC-H-ish set even though
    * TESTDATA.md lists only the latter — they back the LLM-pipeline
    * operators (dedup, similarity, text analysis). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else normalizeTimestamps(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Canonicalize every timestamp column to µs `TimestampType` (LTZ).
    *
    * The driver's generator has flipped timestamp physical types across
    * rounds — TIMESTAMP(NANOS), µs `isAdjustedToUTC=false` (⇒ Spark 4
    * infers TIMESTAMP_NTZ), and LTZ — and not only on `events.ts`: the
    * current testdata stores `l_shipdate`/`o_orderdate` as NTZ too. The
    * gate tolerates NTZ under the pinned-UTC session, but any
    * `Row.getTimestamp` accessor or LTZ-assuming operator breaks on the
    * `LocalDateTime` it collects. Casting NTZ→LTZ under a UTC session
    * preserves the wall-clock values the DuckDB oracle sees, so every
    * operator and spec is immune to the next generator flip. */
  def normalizeTimestamps(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ntz = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    ntz.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  /** The events parquet additionally needs the nanos escape hatch:
    * TIMESTAMP(NANOS) is read as long (Spark 4's parquet reader otherwise
    * rejects it) and converted with integer arithmetic (`div`, not `/`:
    * double division of an int64 epoch-nanos loses precision). The
    * streaming surface requires the LTZ result (`withWatermark` rejects
    * NTZ event time). */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val tsFixed = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
    normalizeTimestamps(tsFixed)
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** [[documents]] spread to the session's parallelism — for queries
    * whose pre-shuffle corpus projection is CPU-bound (token/shingle
    * explodes, fingerprint hashing, n-gram fan-outs, replace chains).
    * The test corpus is a single parquet split, so without the spread
    * everything before the first aggregation shuffle runs on ONE core
    * (the simhashPairs rule, generalized after the mm_phash_dedup
    * bisect). At 100 TB scans have thousands of splits and the
    * repartition is simply the standard decode-cost >> shuffle-cost
    * trade; row content and results are unchanged either way. */
  def documentsPar(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)

  /** Register all tables as temp views so `spark.sql` 3-part-free SQL works. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
