package graft.sharing

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sharing.server.LocalSharingServer

/** OAuth client-credentials profiles (shareCredentialsVersion 2, public
  * Delta Sharing protocol) end to end: token fetch, caching, refresh on
  * server-side revocation (401 → one transparent re-auth), and the
  * profile-parsing error surface. The reference supports only v1
  * bearer profiles (src/profile.rs:30-96) — this is engine surface
  * beyond it. */
class OAuthSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val server = new LocalSharingServer(
    oauthClient = Some(("svc-graft", "s3cr3t")))

  override def beforeAll(): Unit = {
    server.addParquetTable("oshare", "main", "nation",
      "/root/testdata/sf0.001/nation.parquet",
      DeltaSchema.toSchemaString(
        graft.SparkTestBase.session.read
          .parquet("/root/testdata/sf0.001/nation.parquet").schema))
    server.start()
  }
  override def afterAll(): Unit = server.stop()

  private def v2Client(): DeltaSharingClient =
    new DeltaSharingClient(Profile.fromJson(server.profileJsonV2))

  test("v2 profile parses; v1 surface rejects oauth-only fields") {
    val p = Profile.fromJson(server.profileJsonV2)
    assert(p.shareCredentialsVersion == 2)
    assert(p.oauth.exists(_.clientId == "svc-graft"))
    // no static authorization for oauth profiles
    assertThrows[DeltaSharingException](p.authorization)
    // secrets never leak through toString
    assert(!p.toString.contains("s3cr3t"))
    assert(!p.oauth.get.toString.contains("s3cr3t"))
  }

  test("malformed v2 profiles fail with typed errors") {
    val base = s"""{"shareCredentialsVersion":2,"endpoint":"${server.endpoint}""""
    assertThrows[DeltaSharingException](Profile.fromJson(base + "}"))
    assertThrows[DeltaSharingException](Profile.fromJson(
      base + ""","type":"persistent_oauth"}"""))
    assertThrows[DeltaSharingException](Profile.fromJson(
      base + ""","type":"oauth_client_credentials","clientId":"x"}"""))
    assertThrows[DeltaSharingException](Profile.fromJson(
      """{"shareCredentialsVersion":3,"endpoint":"http://x"}"""))
  }

  test("client authenticates via the token endpoint and caches the token") {
    val c = v2Client()
    assert(c.listShares().map(_.name) == Seq("oshare"))
    val issuedAfterFirst = server.tokensIssued
    assert(issuedAfterFirst >= 1)
    // several more calls ride the cached token — no new issuance
    c.listSchemas("oshare")
    c.listAllTables("oshare")
    assert(server.tokensIssued == issuedAfterFirst)
  }

  test("server-side revocation triggers one transparent re-auth") {
    val c = v2Client()
    c.listShares()
    val before = server.tokensIssued
    // the client still believes its cached token is fresh; the server
    // has revoked it — the 401 must invalidate + refresh + succeed
    server.expireIssuedTokens()
    assert(c.listAllTables("oshare").map(_.name) == Seq("nation"))
    assert(server.tokensIssued == before + 1)
  }

  test("wrong client secret is a typed client error, not a retry loop") {
    val bad = Profile.fromJson(server.profileJsonV2
      .replace("s3cr3t", "wrong"))
    val c = new DeltaSharingClient(bad)
    val e = intercept[DeltaSharingException](c.listShares())
    assert(e.getMessage.contains("OAuth token request failed"))
  }
}
