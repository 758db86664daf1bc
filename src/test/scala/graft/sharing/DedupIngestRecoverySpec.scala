package graft.sharing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll

import graft.SparkTestBase
import graft.operators.Dedup
import graft.sharing.server.LocalSharingServer

/** Checkpoint recovery of the incremental LSH-dedup pipeline
  * (connector_dedup_ingest's topology): CDF stream → per-version probe
  * of the persisted band-bucket index → verdict write → kept-only
  * append.
  *
  * Invariants (the IvfIngestRecoverySpec pattern):
  *  1. a restart from the checkpoint with no new commits appends
  *     nothing (no duplicate verdicts or index rows);
  *  2. after a new server commit, ONLY the new version's arrivals are
  *     screened — already-processed versions are not re-screened;
  *  3. the two-phase (checkpointed, interrupted) verdicts are
  *     ROW-IDENTICAL to a from-scratch sequential batch replay
  *     (Dedup.incrementalDedup per version) — the invariant the gated
  *     query's parity_ok certifies.
  */
class DedupIngestRecoverySpec extends SparkTestBase with BeforeAndAfterAll {

  private val server = new LocalSharingServer()
  private var profilePath: String = _
  private var dir: String = _

  private val table = TableRef("sh", "sc", "docs_cdf")

  private def parquetIn(sub: String) = server.listParquet(s"$dir/$sub").head

  private def docsSrc: DataFrame =
    graft.Tables.documents(spark, sf0001).select("doc_id", "text")

  private def registerVersions(version: Long,
      slices: Seq[(Long, String)]): Unit =
    server.addTable("sh", "sc", server.TableDef(
      "docs_cdf", DeltaSchema.toSchemaString(docsSrc.schema),
      partitionColumns = Seq.empty,
      files = (Seq("base") ++ slices.map(_._2))
        .map(s => server.ServedFile(parquetIn(s), Map.empty)),
      version = version,
      changes = slices.map { case (v, s) =>
        server.ChangeEntry(v, "add",
          server.ServedFile(parquetIn(s), Map.empty),
          1700000000000L + v * 1000)
      }))

  override def beforeAll(): Unit = {
    dir = java.nio.file.Files
      .createTempDirectory("graft-dedup-ingest-spec").toString
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

  /** Run the ingest stream to completion against the checkpoint,
    * driving the SAME per-commit handler the gated query uses. */
  private def runIngest(checkpoint: String, bandsDir: String,
      setsDir: String, outDir: String): Unit = {
    val q = GraftSharing
      .readChangesStream(spark, profilePath, table, startingVersion = 2L)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val adds = batch.filter(col("_change_type") === "add")
          .select(col("doc_id"), col("text"), col("_commit_version"))
          .localCheckpoint(eager = true)
        val versions = adds.select("_commit_version").distinct()
          .collect().map(_.getLong(0)).sorted
        versions.foreach { v =>
          Dedup.dedupIngestCommit(spark,
            adds.filter(col("_commit_version") === v)
              .select("doc_id", "text"),
            v, bandsDir, setsDir, outDir)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("dedup ingestion recovers from its checkpoint without re-screening") {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-dedup-ckpt").toString
    val root = java.nio.file.Files
      .createTempDirectory("graft-dedup-idx-out").toString
    val (bandsDir, setsDir, outDir) =
      (s"$root/bands", s"$root/sets", s"$root/verdicts")
    Dedup.buildDedupIndex(spark.read.parquet(s"$dir/base"),
      bandsDir, setsDir)
    val baseSets = spark.read.parquet(setsDir).count()

    // phase 1: only v2 exists
    runIngest(ckpt, bandsDir, setsDir, outDir)
    val v2Verdicts = spark.read.parquet(outDir)
    val v2N = v2Verdicts.count()
    assert(v2N > 0, "phase 1 screened nothing — fixture degenerate")
    assert(v2Verdicts.select("version").distinct().count() == 1)
    val v2Kept = v2Verdicts.filter(col("kept") === 1).count()
    assert(spark.read.parquet(setsDir).count() == baseSets + v2Kept,
      "index sets != base + kept arrivals after phase 1")

    // restart with no new commits: nothing re-screened or re-appended
    runIngest(ckpt, bandsDir, setsDir, outDir)
    assert(spark.read.parquet(outDir).count() == v2N,
      "an empty restart re-screened already-processed versions")
    assert(spark.read.parquet(setsDir).count() == baseSets + v2Kept,
      "an empty restart re-appended index rows")

    // the server commits v3; restart from the SAME checkpoint
    registerVersions(3L, Seq((2L, "v2"), (3L, "v3")))
    runIngest(ckpt, bandsDir, setsDir, outDir)
    val fin = spark.read.parquet(outDir)
    assert(fin.select("doc_id").distinct().count() == fin.count(),
      "duplicate verdicts after recovery")
    val sets = spark.read.parquet(setsDir)
    assert(sets.select("doc_id").distinct().count() == sets.count(),
      "duplicate index rows after recovery")

    // interrupted ingest ≡ from-scratch sequential batch replay
    val full = docsSrc
    val r2 = Dedup.incrementalDedup(
      full.filter(col("doc_id") % 5 =!= 0 || col("doc_id") % 10 === 0),
      "doc_id", "text", col("doc_id") % 10 === 0)
      .withColumn("version", lit(2L))
    val kept2 = r2.filter(col("kept") === 1).select("doc_id")
    val r3 = Dedup.incrementalDedup(
      full.filter(col("doc_id") % 5 =!= 0 || col("doc_id") % 10 === 5)
        .unionByName(full.filter(col("doc_id") % 10 === 0)
          .join(kept2, "doc_id")),
      "doc_id", "text", col("doc_id") % 10 === 5)
      .withColumn("version", lit(3L))
    val cols = Seq("doc_id", "n_dups", "dup_of", "best_jaccard", "kept",
      "version")
    val served = fin.select(cols.map(col): _*)
    val replay = r2.unionByName(r3).select(cols.map(col): _*)
    assert(served.exceptAll(replay).count() == 0 &&
      replay.exceptAll(served).count() == 0,
      "recovered verdicts differ from the sequential batch replay")
  }
}
