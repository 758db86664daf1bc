package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All capability is declared as `QueryDef`s in `graft.operators.*` (one
  * per SURVEY §2 row / LLM-pipeline op) and aggregated here into the
  * `queries` / `oracleSql` maps the driver grades.
  */
object SparkEntry {

  /** Every verifiable unit of engine capability. */
  def allDefs: Seq[QueryDef] =
    CoreQueries.defs ++ AsofJoin.defs ++ RangeJoin.defs ++ SkewJoin.defs ++
      BucketedJoin.defs ++ BloomJoin.defs ++ Dedup.defs ++ Similarity.defs ++
      TextAnalysis.defs ++ Multimodal.defs ++ StreamingOps.defs ++
      Graph.defs ++ Sampling.defs ++ Layout.defs ++ SeriesOps.defs ++
      ModelEval.defs ++ Curation.defs ++ Itemsets.defs ++ Retrieval.defs ++
      PlannerStats.defs ++ Inference.defs ++ SpatialOps.defs ++
      ConnectorQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (sketches, LSH, streaming internals) → driver records rows-only. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
