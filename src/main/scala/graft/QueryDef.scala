package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of engine capability.
  *
  * @param name   stable key; becomes the `queries` / `oracleSql` map key
  * @param build  Spark-side implementation (sfDir = parquet table dir)
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables; None → the driver records a weaker rows-only
  *               check (used for ops SQL can't express, e.g. sketches)
  *
  * Cross-engine determinism rules used throughout:
  *  - every float aggregate is `round(x, 4)` on BOTH sides (double sums
  *    are order-dependent in the last ulps; 4 decimals absorbs that)
  *  - DuckDB `sum(BIGINT)` returns HUGEINT and `year()` returns BIGINT;
  *    oracles cast back to the Spark result type explicitly
  *  - any LIMIT is preceded by a total order (unique tiebreak column)
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
