package graft.sharing

import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll

import graft.SparkTestBase
import graft.sharing.server.LocalSharingServer

/** Catalog-first discovery + 3-part-name SQL (reference
  * src/catalog/mod.rs:46-220, examples/catalog_list.rs), plus DSv2
  * pushdown behavior through the GraftScanBuilder. */
class CatalogSpec extends SparkTestBase with BeforeAndAfterAll {

  private val server = new LocalSharingServer()

  override def beforeAll(): Unit = {
    def schemaOf(t: String) =
      DeltaSchema.toSchemaString(spark.read.parquet(s"$sf0001/$t.parquet").schema)
    server.addParquetTable("share1", "sales", "lineitem",
      s"$sf0001/lineitem.parquet", schemaOf("lineitem"))
    server.addParquetTable("share1", "sales", "orders",
      s"$sf0001/orders.parquet", schemaOf("orders"))
    server.addParquetTable("share1", "geo", "nation",
      s"$sf0001/nation.parquet", schemaOf("nation"))
    // versioned table for SQL time travel: v1 = full nation, v2 replaced
    // it with the n_nationkey<10 slice (current snapshot)
    val nation = spark.read.parquet(s"$sf0001/nation.parquet")
    val histDir = java.nio.file.Files
      .createTempDirectory("graft-cat-hist").toString
    nation.filter(col("n_nationkey") < 10).coalesce(1)
      .write.mode("overwrite").parquet(histDir)
    val slice = server.listParquet(histDir)
      .map(f => server.ServedFile(f, Map.empty))
    val base = server.listParquet(s"$sf0001/nation.parquet")
      .map(f => server.ServedFile(f, Map.empty))
    // complete history: v1 (2023-07-22) added the full nation, v2
    // (2023-11-14) replaced it with the slice — TIMESTAMP AS OF needs
    // the v1 commit recorded to distinguish "between commits" from
    // "before the log's horizon"
    server.addTable("share1", "geo", server.TableDef(
      "nation_hist", schemaOf("nation"), Seq.empty, files = slice,
      version = 2,
      changes = base.map(f => server.ChangeEntry(1, "add", f, 1690000000000L)) ++
        slice.map(f => server.ChangeEntry(2, "add", f)) ++
        base.map(f => server.ChangeEntry(2, "remove", f))))
    server.start()
    spark.conf.set("spark.sql.catalog.share1",
      "graft.sharing.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.share1.profile.json", server.profileJson)
  }
  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  test("SHOW NAMESPACES lists shared schemas") {
    val ns = spark.sql("SHOW NAMESPACES IN share1").collect().map(_.getString(0))
    assert(ns.toSet == Set("sales", "geo"))
  }

  test("SHOW TABLES lists shared tables") {
    val ts = spark.sql("SHOW TABLES IN share1.sales").collect().map(_.getString(1))
    assert(ts.toSet == Set("lineitem", "orders"))
  }

  test("3-part-name SQL query end-to-end") {
    val n = spark.sql(
      "SELECT count(*) FROM share1.sales.lineitem WHERE l_quantity < 10")
      .collect()(0).getLong(0)
    val expected = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_quantity") < 10).count()
    assert(n == expected)
  }

  test("joins across shared tables by name") {
    val df = spark.sql(
      """SELECT o_orderpriority, count(*) AS n
        |FROM share1.sales.lineitem l JOIN share1.sales.orders o
        |  ON l.l_orderkey = o.o_orderkey
        |GROUP BY o_orderpriority""".stripMargin)
    assert(df.collect().map(_.getLong(1)).sum == 6000)
  }

  test("filter reaches the parquet scan and the server gets the hint") {
    server.lastPredicateHints = None
    val df = spark.sql(
      "SELECT l_orderkey FROM share1.sales.lineitem WHERE l_quantity < 7.0")
    val plan = df.queryExecution.executedPlan.toString
    df.collect()
    // data filter pushed into the parquet scan (row-group skipping)
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"))
    // hint arrived at the sharing server
    assert(server.lastPredicateHints.exists(h =>
      h.contains("\"op\":\"lessThan\"") && h.contains("l_quantity")))
  }

  test("limit is forwarded as a hint but enforced by Spark (partial)") {
    server.lastLimitHint = None
    val rows = spark.sql(
      "SELECT l_orderkey FROM share1.sales.lineitem LIMIT 13").collect()
    assert(rows.length == 13)
    assert(server.lastLimitHint.contains("13"))
  }

  test("filter+limit: predicate hint sent, limit correctly NOT pushed") {
    // With Inexact filter semantics a FilterExec stays above the scan, so
    // Spark must not push the limit through it: a server that trimmed the
    // file list to ~9 pre-filter rows could starve the post-filter limit.
    // The query POST is still deferred to build(), so when a limit IS
    // pushable (no residual filter, see previous test) it reaches the
    // server even though Spark pushes filters first.
    server.lastPredicateHints = None
    server.lastLimitHint = None
    val rows = spark.sql(
      "SELECT l_orderkey FROM share1.sales.lineitem WHERE l_quantity < 30 LIMIT 9")
      .collect()
    assert(rows.length == 9)
    assert(server.lastLimitHint.isEmpty)
    assert(server.lastPredicateHints.exists(_.contains("l_quantity")))
  }

  test("projection pruning reaches the scan (ReadSchema)") {
    val df = spark.sql("SELECT l_orderkey FROM share1.sales.lineitem")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && plan.contains("l_orderkey"))
    assert(!plan.contains("l_extendedprice"))
  }

  test("small shared table auto-broadcasts (stats reach the planner)") {
    // the reference reports NO statistics (table.rs:215-217 returns
    // None) so its host engine can never pick a broadcast join; our
    // delegated ParquetScan reports file-size stats from the signed
    // paths, and Catalyst broadcasts the tiny nation side unprompted
    val plan = spark.sql(
      """SELECT n_name, count(*) AS n
        |FROM share1.sales.orders o JOIN share1.geo.nation nt
        |  ON o.o_orderkey % 25 = nt.n_nationkey
        |GROUP BY n_name""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast join for the tiny shared side:\n$plan")
  }

  test("VERSION AS OF pins the snapshot; plain read sees the current one") {
    val nationRows = spark.read.parquet(s"$sf0001/nation.parquet").count()
    val current = spark.sql(
      "SELECT count(*) FROM share1.geo.nation_hist").collect()(0).getLong(0)
    val atV1 = spark.sql(
      "SELECT count(*) FROM share1.geo.nation_hist VERSION AS OF 1")
      .collect()(0).getLong(0)
    assert(current == 10)
    assert(atV1 == nationRows)
  }

  test("VERSION AS OF a future version fails with the protocol error") {
    val e = intercept[Exception](spark.sql(
      "SELECT count(*) FROM share1.geo.nation_hist VERSION AS OF 99").collect())
    assert(e.getMessage.contains("newer than table version"))
  }

  test("TIMESTAMP AS OF resolves latest-at-or-before via the version endpoint") {
    // nation_hist history: v1 (2023-07-22) = full nation; v2
    // (2023-11-14T22:13:20Z, the fixture default) replaced it with the
    // <10 slice. Between the commits pins v1; after the last pins the
    // current version; before the log's horizon is a hard error, never a
    // silent rewind to a snapshot that did not exist at that time.
    val nationRows = spark.read.parquet(s"$sf0001/nation.parquet").count()
    val betweenCommits = spark.sql(
      """SELECT count(*) FROM share1.geo.nation_hist
        |TIMESTAMP AS OF '2023-09-01 00:00:00'""".stripMargin)
      .collect()(0).getLong(0)
    val afterCommit = spark.sql(
      """SELECT count(*) FROM share1.geo.nation_hist
        |TIMESTAMP AS OF '2024-01-01 00:00:00'""".stripMargin)
      .collect()(0).getLong(0)
    assert(betweenCommits == nationRows)
    assert(afterCommit == 10)
    val e = intercept[Exception](spark.sql(
      """SELECT count(*) FROM share1.geo.nation_hist
        |TIMESTAMP AS OF '2023-01-01 00:00:00'""".stripMargin).collect())
    assert(e.getMessage.contains("predates the earliest recorded version"))
  }

  test("unknown table raises a proper analysis error (no silent None)") {
    val e = intercept[Exception](
      spark.sql("SELECT * FROM share1.sales.nope").collect())
    assert(e.getMessage.toUpperCase.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.contains("nope"))
  }

  test("catalog is read-only") {
    intercept[Exception](
      spark.sql("DROP TABLE share1.sales.lineitem"))
  }

  test("partition values become partition columns pruned by Catalyst") {
    // customer split into two files, c_nationkey only in partitionValues
    val dir = java.nio.file.Files.createTempDirectory("graft-cat-part").toString
    val src = graft.Tables.customer(spark, sf0001)
    src.filter(col("c_nationkey") === 0).drop("c_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/g0")
    src.filter(col("c_nationkey") === 1).drop("c_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/g1")
    import scala.jdk.CollectionConverters._
    def parquetIn(sub: String) = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$dir/$sub")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).next()

    server.addTable("share1", "sales", server.TableDef(
      "customer_part", DeltaSchema.toSchemaString(src.schema),
      partitionColumns = Seq("c_nationkey"),
      files = Seq(
        server.ServedFile(parquetIn("g0"), Map("c_nationkey" -> "0")),
        server.ServedFile(parquetIn("g1"), Map("c_nationkey" -> "1")))))

    val df = spark.sql(
      "SELECT c_custkey, c_nationkey FROM share1.sales.customer_part WHERE c_nationkey = 1")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(1) == 1))
    assert(rows.length == src.filter(col("c_nationkey") === 1).count())
    // Catalyst prunes the other file: partition filters appear in the scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("c_nationkey"))
  }

  test("expired URL is refreshed per-task via the RefreshSpec in the path") {
    // TTL shorter than the plan→execute gap; the profile-path catalog
    // embeds a RefreshSpec, so the read recovers by re-listing.
    val shortServer = new LocalSharingServer(urlTtl = java.time.Duration.ofMillis(300))
    val schema = spark.read.parquet(s"$sf0001/region.parquet").schema
    shortServer.addParquetTable("sh", "sc", "region",
      s"$sf0001/region.parquet", DeltaSchema.toSchemaString(schema))
    shortServer.start()
    try {
      val profilePath = shortServer.writeProfile()
      spark.conf.set("spark.sql.catalog.shortcat",
        "graft.sharing.catalog.GraftCatalog")
      spark.conf.set("spark.sql.catalog.shortcat.profile", profilePath)
      spark.conf.set("spark.sql.catalog.shortcat.share", "sh")
      val df = spark.sql("SELECT count(*) AS n FROM shortcat.sc.region")
      Thread.sleep(600) // the planned URLs are now expired
      assert(df.collect()(0).getLong(0) == 5)
    } finally shortServer.stop()
  }

  private def graftCatalog(name: String) =
    spark.sessionState.catalogManager.catalog(name)
      .asInstanceOf[graft.sharing.catalog.GraftCatalog]

  test("invalidateTable evicts version-pinned cache entries too") {
    import org.apache.spark.sql.connector.catalog.Identifier
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    val full = DeltaSchema.toSchemaString(src.schema)
    val files = server.listParquet(s"$sf0001/nation.parquet")
      .map(f => server.ServedFile(f, Map.empty))
    server.addTable("share1", "geo", server.TableDef(
      "nation_inval", full, Seq.empty, files = files, version = 3))
    val cat = graftCatalog("share1")
    val ident = Identifier.of(Array("geo"), "nation_inval")
    val nCols = cat.loadTable(ident, "2").schema().fieldNames.length
    // server-side schema evolves; the @v2 entry still serves the cache
    val truncated = DeltaSchema.toSchemaString(
      org.apache.spark.sql.types.StructType(src.schema.fields.drop(1)))
    server.addTable("share1", "geo", server.TableDef(
      "nation_inval", truncated, Seq.empty, files = files, version = 3))
    assert(cat.loadTable(ident, "2").schema().fieldNames.length == nCols)
    // invalidate must evict the PINNED key as well, not just the base one
    cat.invalidateTable(ident)
    assert(cat.loadTable(ident, "2").schema().fieldNames.length == nCols - 1)
  }

  test("metadata cache is LRU-bounded: eldest entry evicted and re-fetched") {
    import org.apache.spark.sql.connector.catalog.Identifier
    import scala.jdk.CollectionConverters._
    val cat = new graft.sharing.catalog.GraftCatalog
    cat.initialize("lru", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("profile.json" -> server.profileJson, "share" -> "share1",
        "metadataCacheSize" -> "2").asJava))
    val li = Identifier.of(Array("sales"), "lineitem")
    val nSchemaCols = cat.loadTable(li).schema().fieldNames.length
    cat.loadTable(Identifier.of(Array("sales"), "orders"))
    cat.loadTable(Identifier.of(Array("geo"), "nation")) // evicts lineitem
    assert(cat.metadataCacheSize == 2)
    // prove lineitem was truly evicted: evolve its server-side schema —
    // a cached entry would keep serving the old one, a re-fetch sees it
    val src = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val truncated = DeltaSchema.toSchemaString(
      org.apache.spark.sql.types.StructType(src.schema.fields.drop(1)))
    server.addParquetTable("share1", "sales", "lineitem",
      s"$sf0001/lineitem.parquet", truncated)
    try {
      assert(cat.loadTable(li).schema().fieldNames.length == nSchemaCols - 1)
      assert(cat.metadataCacheSize == 2)
    } finally
      // restore the original schema for the other tests in this suite
      server.addParquetTable("share1", "sales", "lineitem",
        s"$sf0001/lineitem.parquet", DeltaSchema.toSchemaString(src.schema))
    // malformed knob fails loudly
    val bad = new graft.sharing.catalog.GraftCatalog
    intercept[DeltaSharingException](bad.initialize("bad",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        Map("profile.json" -> server.profileJson,
          "metadataCacheSize" -> "-5").asJava)))
  }

  test("tableExists: missing table is false; unreachable server propagates") {
    import org.apache.spark.sql.connector.catalog.Identifier
    val cat = graftCatalog("share1")
    assert(!cat.tableExists(Identifier.of(Array("sales"), "nope")))
    assert(cat.tableExists(Identifier.of(Array("sales"), "lineitem")))
    // an outage must NOT read as "table does not exist" — callers would
    // silently drop real tables
    import scala.jdk.CollectionConverters._
    val dead = new graft.sharing.catalog.GraftCatalog
    dead.initialize("dead", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("profile.json" ->
        """{"shareCredentialsVersion":1,"endpoint":"http://127.0.0.1:9/delta-sharing","bearerToken":"t"}""")
        .asJava))
    intercept[DeltaSharingException](
      dead.tableExists(Identifier.of(Array("sales"), "lineitem")))
  }

  test("maxResults catalog option pages the listings without losing rows") {
    spark.conf.set("spark.sql.catalog.share1paged",
      "graft.sharing.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.share1paged.profile.json", server.profileJson)
    spark.conf.set("spark.sql.catalog.share1paged.share", "share1")
    spark.conf.set("spark.sql.catalog.share1paged.maxResults", "1")
    // page size 1 → the pagination loop must stitch all tables back
    val ts = spark.sql("SHOW TABLES IN share1paged.sales")
      .collect().map(_.getString(1))
    assert(Set("lineitem", "orders").subsetOf(ts.toSet))
    // malformed knob fails loudly at first use, not silently unpaged
    import scala.jdk.CollectionConverters._
    val bad = new graft.sharing.catalog.GraftCatalog
    intercept[DeltaSharingException](bad.initialize("bad",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        Map("profile.json" -> server.profileJson, "maxResults" -> "zero").asJava)))
  }

  test("DataFrameReader format entry point") {
    val profilePath = server.writeProfile()
    val df = spark.read.format("graft-sharing")
      .load(s"$profilePath#share1.geo.nation")
    assert(df.count() == 25)
    assert(df.schema.fieldNames.contains("n_name"))
  }
}
