package graft.sharing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll

import graft.SparkTestBase
import graft.operators.Curation
import graft.sharing.server.LocalSharingServer

/** Checkpoint recovery of the incremental-curation pipeline
  * (connector_incremental_curation's topology, r12 verdict ask #2):
  * CDF stream → per-version quality filter + incremental dedup →
  * append the accepted docs to a materialized corpus directory.
  *
  * The production invariants under test:
  *  1. a restart from the checkpoint with no new commits is a no-op;
  *  2. after a new server commit, ONLY the new version flows through —
  *     already-curated versions are not re-curated (no duplicate
  *     corpus rows) — and the new arrivals are deduped against a
  *     corpus that already contains earlier accepted docs;
  *  3. the two-phase (checkpointed, interrupted) run lands on the
  *     IDENTICAL final corpus as a fresh one-shot run over the full
  *     history — batch/stream parity for the whole composition.
  */
class CurationRecoverySpec extends SparkTestBase with BeforeAndAfterAll {

  private val server = new LocalSharingServer()
  private var profilePath: String = _
  private var dir: String = _

  private val table = TableRef("sh", "sc", "docs_cdf")

  private def parquetIn(sub: String) = server.listParquet(s"$dir/$sub").head

  private def docsSrc: DataFrame =
    graft.Tables.documents(spark, sf0001).select("doc_id", "text", "n_chars")

  /** Register docs_cdf at `version` with adds for every (v, slice). */
  private def registerVersions(version: Long, slices: Seq[(Long, String)]): Unit =
    server.addTable("sh", "sc", server.TableDef(
      "docs_cdf", DeltaSchema.toSchemaString(docsSrc.schema),
      partitionColumns = Seq.empty,
      files = (Seq("base") ++ slices.map(_._2))
        .map(s => server.ServedFile(parquetIn(s), Map.empty)),
      version = version,
      changes = slices.map { case (v, s) =>
        server.ChangeEntry(v, "add", server.ServedFile(parquetIn(s), Map.empty),
          1700000000000L + v * 1000)
      }))

  override def beforeAll(): Unit = {
    dir = java.nio.file.Files.createTempDirectory("graft-curation").toString
    docsSrc.filter(col("doc_id") % 5 =!= 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/base")
    docsSrc.filter(col("doc_id") % 10 === 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/v2")
    docsSrc.filter(col("doc_id") % 10 === 5)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/v3")
    registerVersions(2L, Seq((2L, "v2")))
    server.start()
    profilePath = server.writeProfile()
  }
  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  /** The corpus materialized so far: the v1 base plus everything the
    * pipeline has appended to `corpusDir` (empty on the first run). */
  private def corpusSoFar(corpusDir: String): DataFrame = {
    val appended =
      try spark.read.parquet(corpusDir)
      catch { case _: Exception => null }
    val base = spark.read.parquet(s"$dir/base")
    if (appended == null) base else base.unionByName(appended)
  }

  /** Run the curation stream to completion against the checkpoint,
    * appending accepted docs to corpusDir (the realistic append-only
    * exactly-once topology). */
  private def runCuration(checkpoint: String, corpusDir: String): Unit = {
    val q = GraftSharing
      .readChangesStream(spark, profilePath, table, startingVersion = 2L)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val adds = batch.filter(col("_change_type") === "add")
          .select(col("doc_id"), col("text"), col("n_chars"),
            col("_commit_version"))
          .localCheckpoint(eager = true)
        val versions = adds.select("_commit_version").distinct()
          .collect().map(_.getLong(0)).sorted
        versions.foreach { v =>
          val arrivals = adds.filter(col("_commit_version") === v)
            .drop("_commit_version")
          Curation.curateArrivals(corpusSoFar(corpusDir), arrivals)
            .write.mode("append").parquet(corpusDir)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("curation recovers from its checkpoint without re-curating") {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-curation-ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-curation-out").toString + "/corpus"

    // phase 1: only v2 exists
    runCuration(ckpt, out)
    val afterV2 = spark.read.parquet(out)
    val v2Accepted = afterV2.count()
    assert(v2Accepted > 0, "phase 1 accepted nothing — fixture degenerate")
    assert(afterV2.filter(col("doc_id") % 10 === 5).count() == 0,
      "v3 docs cannot exist before the v3 commit")
    assert(afterV2.select("doc_id").distinct().count() == v2Accepted,
      "duplicate corpus rows after phase 1")

    // restart with no new commits: a no-op batch, nothing re-appended
    runCuration(ckpt, out)
    assert(spark.read.parquet(out).count() == v2Accepted,
      "an empty restart re-curated already-processed versions")

    // the server commits v3; restart from the SAME checkpoint
    registerVersions(3L, Seq((2L, "v2"), (3L, "v3")))
    runCuration(ckpt, out)
    val fin = spark.read.parquet(out)
    assert(fin.filter(col("doc_id") % 10 === 0).count() == v2Accepted,
      "v2 was re-curated after recovery")
    assert(fin.select("doc_id").distinct().count() == fin.count(),
      "duplicate corpus rows after recovery")

    // batch/stream parity: a FRESH one-shot run over the full history
    // (one AvailableNow trigger spanning v2+v3) must land on the
    // identical final corpus
    val ckpt2 = java.nio.file.Files
      .createTempDirectory("graft-curation-ckpt2").toString
    val out2 = java.nio.file.Files
      .createTempDirectory("graft-curation-out2").toString + "/corpus"
    runCuration(ckpt2, out2)
    val oneShot = spark.read.parquet(out2)
    assert(fin.select("doc_id").exceptAll(oneShot.select("doc_id")).count() == 0
      && oneShot.select("doc_id").exceptAll(fin.select("doc_id")).count() == 0,
      "recovered two-phase corpus differs from the one-shot replay")
  }
}
