package graft.sharing

import org.scalatest.funsuite.AnyFunSuite

import graft.sharing.PredicateHints._

/** Stats-based file skipping — the SURVEY §4 improvement the reference
  * leaves on the table (stats parsed at action.rs:180-183, never used).
  * Three-valued interval semantics: skip ONLY on provable exclusion. */
class StatsPruningSpec extends AnyFunSuite {

  private def stats(min: String, max: String, col: String = "x",
      nulls: Long = 0, rows: Long = 10): String =
    s"""{"numRecords":$rows,"minValues":{"$col":$min},""" +
      s""""maxValues":{"$col":$max},"nullCount":{"$col":$nulls}}"""

  private def col(vt: String = "double") = ColumnOp("x", vt)
  private def lit(v: String, vt: String = "double") = LiteralOp(v, vt)

  test("comparison pruning on numeric min/max") {
    val st = Some(stats("5", "10"))
    assert(!StatsPruning.mayMatch(lessThan(col(), lit("5")), st)) // all >= 5
    assert(StatsPruning.mayMatch(lessThan(col(), lit("6")), st))
    assert(!StatsPruning.mayMatch(greaterThan(col(), lit("10")), st))
    assert(StatsPruning.mayMatch(greaterThanOrEqual(col(), lit("10")), st))
    assert(!StatsPruning.mayMatch(equal(col(), lit("11")), st))
    assert(!StatsPruning.mayMatch(equal(col(), lit("4.9")), st))
    assert(StatsPruning.mayMatch(equal(col(), lit("7")), st))
  }

  test("date strings compare chronologically (ISO lexicographic)") {
    val st = Some(stats("\"1995-01-01\"", "\"1995-12-31\""))
    val d = ColumnOp("x", "date")
    assert(!StatsPruning.mayMatch(
      lessThan(d, LiteralOp("1995-01-01", "date")), st))
    assert(StatsPruning.mayMatch(
      lessThan(d, LiteralOp("1995-06-01", "date")), st))
    assert(!StatsPruning.mayMatch(
      greaterThan(d, LiteralOp("1996-01-01", "date")), st))
  }

  test("not/isNull need the dual bound (all-match), stay conservative") {
    // nullCount 0 => isNull can't match; not(isNull) always may
    val noNulls = Some(stats("1", "2"))
    assert(!StatsPruning.mayMatch(isNull(col()), noNulls))
    assert(StatsPruning.mayMatch(not(isNull(col())), noNulls))
    // all null => not(isNull) can't match
    val allNull = Some(stats("1", "2", nulls = 10, rows = 10))
    assert(StatsPruning.mayMatch(isNull(col()), allNull))
    assert(!StatsPruning.mayMatch(not(isNull(col())), allNull))
    // not(x < 5) with all values < 5 => skip
    val st = Some(stats("1", "4"))
    assert(!StatsPruning.mayMatch(not(lessThan(col(), lit("5"))), st))
  }

  test("and/or combine; missing stats and unknown ops never skip") {
    val st = Some(stats("5", "10"))
    // interval logic is per-conjunct: x>7 AND x<6 is row-impossible but
    // both conjuncts individually may-match [5,10] — file is KEPT
    // (conservative, correct); only a provably-false conjunct skips
    assert(StatsPruning.mayMatch(
      and(Seq(greaterThan(col(), lit("7")), lessThan(col(), lit("6")))), st))
    assert(!StatsPruning.mayMatch(
      and(Seq(greaterThan(col(), lit("12")), lessThan(col(), lit("6")))), st))
    assert(StatsPruning.mayMatch(
      or(Seq(greaterThan(col(), lit("12")), lessThan(col(), lit("6")))), st))
    assert(StatsPruning.mayMatch(lessThan(col(), lit("0")), None)) // no stats
    assert(StatsPruning.mayMatch(
      lessThan(ColumnOp("other", "double"), lit("0")), st)) // col not in stats
    assert(StatsPruning.mayMatch(
      lessThan(col(), LiteralOp("abc", "double")), st)) // unparsable literal
  }

  test("timestamps compare as instants across mixed formats") {
    val c = ColumnOp("x", "timestamp")
    // stats in ISO-Z with millis; literal in the java.sql space form
    val st = Some(stats("\"2021-06-01T00:00:00.000Z\"",
      "\"2021-06-01T23:59:59.000Z\""))
    // lexicographic would see 'T' > ' ' and wrongly skip; instant
    // comparison keeps the file (morning rows < noon exist)
    assert(StatsPruning.mayMatch(
      lessThan(c, LiteralOp("2021-06-01 12:00:00.0", "timestamp")), st))
    // and still prunes a provable miss
    assert(!StatsPruning.mayMatch(
      greaterThan(c, LiteralOp("2021-06-02 00:00:00.0", "timestamp")), st))
    // boundary equality across 'Z' vs '.000Z' renderings
    assert(StatsPruning.mayMatch(
      greaterThanOrEqual(c, LiteralOp("2021-06-01T23:59:59Z", "timestamp")), st))
    // unparsable timestamp => unknown => keep
    assert(StatsPruning.mayMatch(
      lessThan(c, LiteralOp("junk", "timestamp")), st))
  }

  test("hint JSON round-trips through the server-side parser") {
    val op = and(Seq(
      lessThan(ColumnOp("l_quantity", "double"), LiteralOp("5", "double")),
      not(isNull(ColumnOp("l_returnflag", "string")))))
    val parsed = StatsPruning.parseHintJson(op.json)
    assert(parsed.contains(op))
    assert(StatsPruning.parseHintJson("not json at all").isEmpty)
  }

  test("degenerate composite hints are ignored, not evaluated") {
    // {"op":"or"} with no children would evaluate may=false and prune
    // EVERY file — the parser must fail open (None) on such hints
    assert(StatsPruning.parseHintJson("""{"op":"or"}""").isEmpty)
    assert(StatsPruning.parseHintJson("""{"op":"and","children":[]}""").isEmpty)
    assert(StatsPruning.parseHintJson("""{"op":"not"}""").isEmpty)
    // a well-formed sibling inside a degenerate parent is rejected whole
    assert(StatsPruning.parseHintJson(
      """{"op":"and","children":[{"op":"or"}]}""").isEmpty)
  }

  test("prune keeps files without stats and drops provable misses") {
    def fa(id: String, st: Option[String]) = FileAction(
      url = s"http://x/$id", id = id, partitionValues = Map.empty,
      size = 1L, stats = st, version = None, timestamp = None,
      expirationTimestamp = None)
    val files = Seq(
      fa("lo", Some(stats("0", "4"))),
      fa("hi", Some(stats("6", "9"))),
      fa("nostats", None))
    val kept = StatsPruning.prune(files,
      Seq(lessThan(col(), lit("5"))))
    assert(kept.map(_.id) == Seq("lo", "nostats"))
    // no predicates => untouched
    assert(StatsPruning.prune(files, Seq.empty) == files)
  }
}
