package graft.sharing

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference securable/profile tests
  * (src/securable.rs:275-314, src/profile.rs:358-496). */
class ModelSpec extends AnyFunSuite {

  test("table FQN parses share.schema.table") {
    assert(TableRef.parse("s.sc.t") == TableRef("s", "sc", "t"))
    assert(TableRef.parse("s.sc.t").toString == "s.sc.t")
  }

  test("table FQN rejects wrong arity") {
    val e = intercept[DeltaSharingException](TableRef.parse("only.two"))
    assert(e.kind == "PARSE_SECURABLE_ERROR")
    intercept[DeltaSharingException](TableRef.parse("a.b.c.d"))
  }

  test("profile parses v1 bearer") {
    val p = Profile.fromJson(
      """{"shareCredentialsVersion":1,"endpoint":"https://example.com/ds/",
        |"bearerToken":"tok"}""".stripMargin)
    assert(p.shareCredentialsVersion == 1)
    assert(p.bearerToken == "tok")
    assert(p.authorization == "Bearer tok")
  }

  test("profile rejects unsupported version") {
    val e = intercept[DeltaSharingException](Profile.fromJson(
      """{"shareCredentialsVersion":3,"endpoint":"https://x.com","bearerToken":"t"}"""))
    assert(e.getMessage.contains("Unsupported share credentials version"))
    // v2 is supported but REQUIRES the oauth type discriminator
    val e2 = intercept[DeltaSharingException](Profile.fromJson(
      """{"shareCredentialsVersion":2,"endpoint":"https://x.com","bearerToken":"t"}"""))
    assert(e2.getMessage.contains("type is missing"))
  }

  test("profile rejects missing bearer token") {
    val e = intercept[DeltaSharingException](Profile.fromJson(
      """{"shareCredentialsVersion":1,"endpoint":"https://x.com"}"""))
    assert(e.getMessage.contains("Bearer token is missing"))
  }

  test("profile rejects malformed endpoint") {
    val e = intercept[DeltaSharingException](Profile.fromJson(
      """{"shareCredentialsVersion":1,"endpoint":"not a url","bearerToken":"t"}"""))
    assert(e.getMessage.contains("endpoint"))
  }

  test("profile rejects malformed json and missing file") {
    intercept[DeltaSharingException](Profile.fromJson("{nope"))
    intercept[DeltaSharingException](Profile.fromPath("/does/not/exist.json"))
  }

  test("expired token fails fast at authorization") {
    val p = Profile.fromJson(
      """{"shareCredentialsVersion":1,"endpoint":"https://x.com",
        |"bearerToken":"t","expirationTime":"2020-01-01T00:00:00Z"}""".stripMargin)
    assert(p.isExpired)
    intercept[DeltaSharingException](p.authorization)
  }

  test("token is redacted in toString") {
    val p = Profile.fromJson(
      """{"shareCredentialsVersion":1,"endpoint":"https://x.com","bearerToken":"secret"}""")
    assert(!p.toString.contains("secret"))
  }
}
