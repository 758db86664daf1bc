package graft.sharing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll

import graft.SparkTestBase
import graft.operators.Scd2
import graft.sharing.server.LocalSharingServer

/** Checkpoint recovery + micro-batch-boundary independence for the
  * streaming SCD2 dimension pipeline (connector_cdf_scd2's shape, on
  * the realistic durable topology: the dimension is materialized as
  * one parquet snapshot PER APPLIED COMMIT VERSION, so a replayed
  * micro-batch after a crash skips versions it already applied —
  * the idempotence that makes foreachBatch exactly-once here). */
class Scd2RecoverySpec extends SparkTestBase with BeforeAndAfterAll {

  private val server = new LocalSharingServer()
  private var profilePath: String = _
  private var dir: String = _

  private val table = TableRef("sh", "sc", "sup_cdf")

  private def parquetIn(sub: String) = server.listParquet(s"$dir/$sub").head

  private def base: DataFrame =
    graft.Tables.supplier(spark, sf0001)
      .select("s_suppkey", "s_name", "s_acctbal")

  /** Register sup_cdf at `version` with the commits staged so far. */
  private def register(version: Long,
      commits: Seq[(Long, String, String)]): Unit =
    server.addTable("sh", "sc", server.TableDef(
      "sup_cdf", DeltaSchema.toSchemaString(base.schema),
      partitionColumns = Seq.empty,
      // file-level current state is irrelevant to the feed consumer
      // under test; serve the base file
      files = Seq(server.ServedFile(parquetIn("base"), Map.empty)),
      version = version,
      changes = commits.map { case (v, typ, sub) =>
        server.ChangeEntry(v, typ,
          server.ServedFile(parquetIn(sub), Map.empty),
          1700000000000L + v * 1000)
      }))

  override def beforeAll(): Unit = {
    dir = java.nio.file.Files.createTempDirectory("graft-scd2").toString
    val is5 = col("s_suppkey") % 5 === 0
    val is7 = col("s_suppkey") % 7 === 0
    base.coalesce(1).write.mode("overwrite").parquet(s"$dir/base")
    base.filter(is5).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/rm2")
    base.filter(is5).withColumn("s_acctbal", col("s_acctbal") + 100.0)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/ad2")
    base.filter(is7)
      .withColumn("s_acctbal",
        when(is5, col("s_acctbal") + 100.0).otherwise(col("s_acctbal")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/rm3")
    base.filter(is7)
      .withColumn("s_acctbal",
        when(is5, col("s_acctbal") + 200.0)
          .otherwise(col("s_acctbal") + 100.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/ad3")
    register(2L, Seq((2L, "remove", "rm2"), (2L, "add", "ad2")))
    server.start()
    profilePath = server.writeProfile()
  }
  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  /** Latest materialized dimension snapshot (v1 = the base with open
    * intervals when nothing has been applied yet). */
  private def latestDim(dimRoot: String): (Long, DataFrame) = {
    val vs = Option(new java.io.File(dimRoot).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.startsWith("v")).map(_.drop(1).toLong)
    if (vs.isEmpty)
      (1L, base.withColumn("valid_from", lit(1L))
        .withColumn("valid_to", lit(Scd2.Open)))
    else {
      val v = vs.max
      (v, spark.read.parquet(s"$dimRoot/v$v"))
    }
  }

  /** Run the SCD2 stream to completion against the checkpoint; each
    * applied commit rewrites the NEXT versioned snapshot (replayed
    * versions are skipped — the idempotence under test). */
  private def runScd2(checkpoint: String, dimRoot: String): Unit = {
    val q = GraftSharing
      .readChangesStream(spark, profilePath, table, startingVersion = 2L)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.select(col("s_suppkey"), col("s_name"),
          col("s_acctbal"), col("_change_type"), col("_commit_version"))
          .localCheckpoint(eager = true)
        val versions = b.select("_commit_version").distinct()
          .collect().map(_.getLong(0)).sorted
        versions.foreach { v =>
          val (cur, dim) = latestDim(dimRoot)
          if (v > cur) {
            Scd2.applyCommit(dim,
                b.filter(col("_commit_version") === v), v, "s_suppkey")
              .write.mode("overwrite").parquet(s"$dimRoot/v$v")
          }
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("scd2 recovers from its checkpoint; recovery equals one-shot replay") {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-scd2-ckpt").toString
    val dimRoot = java.nio.file.Files
      .createTempDirectory("graft-scd2-dim").toString + "/dim"

    // phase 1: only v2 committed
    runScd2(ckpt, dimRoot)
    val (v2v, afterV2) = latestDim(dimRoot)
    assert(v2v == 2L)
    val n5 = base.filter(col("s_suppkey") % 5 === 0).count()
    assert(afterV2.filter(col("valid_from") === 2L).count() == n5,
      "v2 must open exactly one generation per repriced key")
    assert(afterV2.filter(col("valid_to") === 2L).count() == n5,
      "v2 must close exactly the repriced keys' base generations")

    // restart with no new commits: nothing re-applied
    runScd2(ckpt, dimRoot)
    assert(latestDim(dimRoot)._1 == 2L,
      "an empty restart advanced the dimension")

    // v3 commits; restart from the SAME checkpoint
    register(3L, Seq((2L, "remove", "rm2"), (2L, "add", "ad2"),
      (3L, "remove", "rm3"), (3L, "add", "ad3")))
    runScd2(ckpt, dimRoot)
    val (v3v, fin) = latestDim(dimRoot)
    assert(v3v == 3L)
    // every key's intervals partition [1, Open) without overlap
    val bad = fin.groupBy("s_suppkey")
      .agg(count(lit(1)).as("n"),
        sum(when(col("valid_to") === Scd2.Open, 1).otherwise(0)).as("open"))
      .filter(col("open") =!= 1)
    assert(bad.count() == 0, "keys without exactly one open interval")
    assert(fin.filter(col("valid_from") === 2L && col("valid_to") === 2L)
      .count() == 0, "degenerate [2,2) interval — v2 was re-applied")

    // batch-boundary parity: a FRESH one-shot run over the full history
    // (one AvailableNow trigger spanning v2+v3) lands on the same dim
    val ckpt2 = java.nio.file.Files
      .createTempDirectory("graft-scd2-ckpt2").toString
    val dim2 = java.nio.file.Files
      .createTempDirectory("graft-scd2-dim2").toString + "/dim"
    runScd2(ckpt2, dim2)
    val oneShot = latestDim(dim2)._2
    assert(fin.exceptAll(oneShot).count() == 0 &&
      oneShot.exceptAll(fin).count() == 0,
      "recovered two-phase dimension differs from the one-shot replay")
  }
}
