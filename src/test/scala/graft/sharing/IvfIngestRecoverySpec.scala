package graft.sharing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll

import graft.SparkTestBase
import graft.operators.Similarity
import graft.sharing.server.LocalSharingServer

/** Checkpoint recovery of the incremental ANN-index pipeline
  * (connector_ivf_ingest's topology, r13 verdict ask #5): CDF stream →
  * per-version cell assignment of new vectors → append into the
  * cell-partitioned index directory.
  *
  * The production invariants under test (the CurationRecoverySpec
  * pattern):
  *  1. a restart from the checkpoint with no new commits appends
  *     nothing (no duplicate index rows);
  *  2. after a new server commit, ONLY the new version's vectors are
  *     appended — already-ingested versions are not re-assigned;
  *  3. the two-phase (checkpointed, interrupted) index is
  *     ROW-IDENTICAL to a from-scratch build over the current corpus —
  *     append ≡ rebuild, the invariant the gated query's parity_ok
  *     certifies through the serve path.
  */
class IvfIngestRecoverySpec extends SparkTestBase with BeforeAndAfterAll {

  private val server = new LocalSharingServer()
  private var profilePath: String = _
  private var dir: String = _

  private val table = TableRef("sh", "sc", "emb_cdf")

  private def parquetIn(sub: String) = server.listParquet(s"$dir/$sub").head

  private def embSrc: DataFrame =
    graft.Tables.embeddings(spark, sf0001).select("vec_id", "embedding")

  private def registerVersions(version: Long, slices: Seq[(Long, String)]): Unit =
    server.addTable("sh", "sc", server.TableDef(
      "emb_cdf", DeltaSchema.toSchemaString(embSrc.schema),
      partitionColumns = Seq.empty,
      files = (Seq("base") ++ slices.map(_._2))
        .map(s => server.ServedFile(parquetIn(s), Map.empty)),
      version = version,
      changes = slices.map { case (v, s) =>
        server.ChangeEntry(v, "add", server.ServedFile(parquetIn(s), Map.empty),
          1700000000000L + v * 1000)
      }))

  override def beforeAll(): Unit = {
    dir = java.nio.file.Files.createTempDirectory("graft-ivf-ingest").toString
    embSrc.filter(col("vec_id") % 5 =!= 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/base")
    embSrc.filter(col("vec_id") % 10 === 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/v2")
    embSrc.filter(col("vec_id") % 10 === 5)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/v3")
    registerVersions(2L, Seq((2L, "v2")))
    server.start()
    profilePath = server.writeProfile()
  }
  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  /** Run the ingest stream to completion against the checkpoint,
    * appending each commit's cell assignments to `idxDir`. */
  private def runIngest(checkpoint: String, idxDir: String): Unit = {
    val q = GraftSharing
      .readChangesStream(spark, profilePath, table, startingVersion = 2L)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val adds = batch.filter(col("_change_type") === "add")
          .select(col("vec_id"), col("embedding"), col("_commit_version"))
          .localCheckpoint(eager = true)
        val versions = adds.select("_commit_version").distinct()
          .collect().map(_.getLong(0)).sorted
        versions.foreach { v =>
          Similarity.ivfAssignments(
              adds.filter(col("_commit_version") === v)
                .select("vec_id", "embedding"),
              numCells = 32, dim = 64)
            .write.partitionBy("cell").mode("append").parquet(idxDir)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("index ingestion recovers from its checkpoint without re-appending") {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ivf-ckpt").toString
    val idx = java.nio.file.Files
      .createTempDirectory("graft-ivf-idx-out").toString + "/index"
    // initial build from the v1 snapshot
    Similarity.ivfAssignments(spark.read.parquet(s"$dir/base"),
        numCells = 32, dim = 64)
      .write.partitionBy("cell").mode("overwrite").parquet(idx)
    val baseN = spark.read.parquet(idx).count()

    // phase 1: only v2 exists
    runIngest(ckpt, idx)
    val afterV2 = spark.read.parquet(idx)
    val v2N = afterV2.count()
    assert(v2N > baseN, "phase 1 appended nothing — fixture degenerate")
    assert(afterV2.select("vec_id").distinct().count() == v2N,
      "duplicate index rows after phase 1")

    // restart with no new commits: nothing re-appended
    runIngest(ckpt, idx)
    assert(spark.read.parquet(idx).count() == v2N,
      "an empty restart re-ingested already-processed versions")

    // the server commits v3; restart from the SAME checkpoint
    registerVersions(3L, Seq((2L, "v2"), (3L, "v3")))
    runIngest(ckpt, idx)
    val fin = spark.read.parquet(idx)
    assert(fin.select("vec_id").distinct().count() == fin.count(),
      "duplicate index rows after recovery")

    // append ≡ rebuild: the maintained index must be ROW-IDENTICAL to a
    // from-scratch build over the full corpus (cell assignment is
    // per-vector and corpus-independent)
    val scratch = Similarity.ivfAssignments(embSrc, numCells = 32, dim = 64)
    val finT = fin.select(col("vec_id"), col("cell").cast("int").as("cell"))
    val scrT = scratch.select(col("vec_id"), col("cell").cast("int").as("cell"))
    assert(finT.exceptAll(scrT).count() == 0 &&
      scrT.exceptAll(finT).count() == 0,
      "maintained index differs from a from-scratch rebuild")
  }
}
