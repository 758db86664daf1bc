package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for the headline queries — the
  * plan-shape audit trail (pushdown, broadcast, partial aggregation,
  * codegen spans). Run: `sbt "runMain graft.PlanAudit" > PLANS.md`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the bench set IS the audit set (single-sourced so a query added to
    // one can't silently miss the other), plus the connector scans whose
    // pushdown evidence only shows through the sharing path
    val audit = (Bench.headline ++
      Seq("connector_filter_pushdown", "connector_partition_values"))
      // optional arg: comma-separated name filter (local iteration)
      .filter(n => args.headOption.forall(_.split(',').contains(n)))
    val qs = SparkEntry.queries
    audit.foreach { name =>
      println(s"\n## $name\n")
      println("```")
      println(qs(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("```")
    }
    graft.operators.ConnectorQueries.stopAll()
    spark.stop()
    sys.exit(0) // embedded-server threads must not pin the JVM
  }
}
