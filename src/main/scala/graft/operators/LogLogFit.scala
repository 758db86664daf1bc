package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** THE single source of the log-log OLS used by the power-law-style
  * fits (graph_degree_powerlaw's degree exponent, text_heaps_law's
  * vocabulary-growth exponent): both engines render their aggregate and
  * slope from here, so the determinism-critical rounding schedule —
  * 6dp-rounded ln inputs, 6dp-rounded cross-products, EXACT decimal
  * sums (shuffle-order-free), one closed-form double slope — cannot
  * drift apart between queries or engines. Callers `round(slope, 4) + 0`
  * on output: the `+ 0` normalizes IEEE negative zero, which a flat
  * curve produces and which stringifies differently across engines
  * under the hash gate.
  */
object LogLogFit {

  /** DuckDB aggregate subquery over a relation `pts(lx, ly)` whose
    * columns are already 6dp-rounded logs. */
  def aggSql(pts: String): String =
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS m,
       |      CAST(SUM(CAST(lx AS DECIMAL(18,6))) AS DOUBLE) AS sx,
       |      CAST(SUM(CAST(ly AS DECIMAL(18,6))) AS DOUBLE) AS sy,
       |      CAST(SUM(CAST(round(lx * ly, 6) AS DECIMAL(18,6)))
       |        AS DOUBLE) AS sxy,
       |      CAST(SUM(CAST(round(lx * lx, 6) AS DECIMAL(18,6)))
       |        AS DOUBLE) AS sxx
       |    FROM $pts""".stripMargin

  /** DuckDB closed-form slope over [[aggSql]]'s output columns. */
  val slopeSql: String = "(m * sxy - sx * sy) / (m * sxx - sx * sx)"

  /** Spark aggregate over a frame with 6dp-rounded (lx, ly) — the exact
    * mirror of [[aggSql]]. */
  def fit(pts: DataFrame): DataFrame = pts.agg(
    count(lit(1)).cast("bigint").as("m"),
    sum(col("lx").cast("decimal(18,6)")).cast("double").as("sx"),
    sum(col("ly").cast("decimal(18,6)")).cast("double").as("sy"),
    sum(round(col("lx") * col("ly"), 6).cast("decimal(18,6)"))
      .cast("double").as("sxy"),
    sum(round(col("lx") * col("lx"), 6).cast("decimal(18,6)"))
      .cast("double").as("sxx"))

  /** Spark closed-form slope over [[fit]]'s output columns. */
  def slope: Column =
    (col("m") * col("sxy") - col("sx") * col("sy")) /
      (col("m") * col("sxx") - col("sx") * col("sx"))
}
