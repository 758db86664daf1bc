package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (sort-merge-bucket) joins: pre-partition both fact tables on
  * the join key at WRITE time so the join needs no shuffle at READ time.
  *
  * At 100 TB this is the difference between re-shuffling petabytes on
  * every join and a mapper-side merge: `bucketBy(n, key)` fixes each
  * row's bucket by hash(key) % n; two tables bucketed the same way are
  * co-partitioned, so Catalyst plans a SortMergeJoin with ZERO Exchange
  * (the spec asserts exactly that). The price is paid once at ingest —
  * the standard layout for fact tables joined daily on the same key.
  */
object BucketedJoin {

  private val staged = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Stage bucketed copies of lineitem + orders once per sfDir (ingest
    * step; saveAsTable because bucket metadata lives in the catalog).
    * Stale warehouse directories from previous JVMs (in-memory catalog,
    * persistent location) are dropped before writing. */
  def stageBucketed(spark: SparkSession, sfDir: String, buckets: Int = 8): Unit =
    staged.getOrElseUpdate(sfDir, {
      // name-UUID of the path: collision-free, hex-only (a raw hashCode
      // can collide across sfDirs or go negative in the identifier)
      val suffix = java.util.UUID.nameUUIDFromBytes(sfDir.getBytes("UTF-8"))
        .toString.replace("-", "").take(12)
      def stage(table: String, df: org.apache.spark.sql.DataFrame,
          key: String): Unit = {
        spark.sql(s"DROP TABLE IF EXISTS $table")
        val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        df.write.bucketBy(buckets, key).sortBy(key)
          .mode("overwrite").saveAsTable(table)
      }
      stage(s"li_bucketed_$suffix", Tables.lineitem(spark, sfDir), "l_orderkey")
      stage(s"ord_bucketed_$suffix", Tables.orders(spark, sfDir), "o_orderkey")
      suffix
    })

  def bucketedTables(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    stageBucketed(spark, sfDir)
    val suffix = staged(sfDir)
    (spark.table(s"li_bucketed_$suffix"), spark.table(s"ord_bucketed_$suffix"))
  }

  def defs: Seq[QueryDef] = Seq(
    // Shuffle-free rollup over the bucketed join. The oracle is the
    // plain join over the raw parquet — bucketing must be invisible in
    // the result; BucketedJoinSpec asserts it is visible in the plan
    // (no Exchange below the join).
    QueryDef.sql(
      "q_join_bucketed",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val (li, ord) = bucketedTables(s, d)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("total_price"))
        .orderBy("o_orderpriority")
    }
  )
}
