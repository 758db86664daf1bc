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
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The driver-generated events parquet has carried `ts` as
    * TIMESTAMP(NANOS) in some rounds and as µs `isAdjustedToUTC=false`
    * (⇒ Spark infers TIMESTAMP_NTZ) in others. Normalize every variant to
    * a µs TimestampType (LTZ) column: the streaming surface requires it
    * (`withWatermark` rejects NTZ event time), and the session timezone
    * is pinned UTC so the NTZ→LTZ cast preserves the wall-clock values
    * the DuckDB oracle sees. Nanos are read as long (Spark 4's parquet
    * reader otherwise rejects them) and converted with integer
    * arithmetic (`div`, not `/`: double division of an int64 epoch-nanos
    * loses precision). */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
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

  /** Register all tables as temp views so `spark.sql` 3-part-free SQL works. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
