package graft.sharing

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-string parity with the reference predicate serializer
  * (src/datasource/expr.rs:252-336 — expected JSON at :276,318,333). */
class PredicateHintsSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("hireDate", DateType),
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("big", LongType),
    StructField("bin", BinaryType),
    StructField("ts", TimestampType)))

  private def json(f: Filter): String =
    PredicateHints.fromFilter(f, schema).get.json

  test("equal with date literal renders YYYY-MM-DD (expr.rs:276)") {
    // Date32(18746) in the reference test == 2021-04-29
    val f = EqualTo("hireDate", java.sql.Date.valueOf("2021-04-29"))
    assert(json(f) ==
      """{"op":"equal","children":[{"op":"column","name":"hireDate","valueType":"date"},{"op":"literal","value":"2021-04-29","valueType":"date"}]}""")
  }

  test("and of equal + lessThan (expr.rs:318)") {
    val f = And(EqualTo("hireDate", java.sql.Date.valueOf("2021-04-29")),
      LessThan("id", 25))
    assert(json(f) ==
      """{"op":"and","children":[{"op":"equal","children":[{"op":"column","name":"hireDate","valueType":"date"},{"op":"literal","value":"2021-04-29","valueType":"date"}]},{"op":"lessThan","children":[{"op":"column","name":"id","valueType":"int"},{"op":"literal","value":"25","valueType":"int"}]}]}""")
  }

  test("not(isNull) (expr.rs:333)") {
    assert(json(Not(IsNull("id"))) ==
      """{"op":"not","children":[{"op":"isNull","children":[{"op":"column","name":"id","valueType":"int"}]}]}""")
    // IsNotNull sugar produces the same tree (expr.rs IsNotNull branch)
    assert(json(IsNotNull("id")) == json(Not(IsNull("id"))))
  }

  test("value types map like the reference (expr.rs:165-191)") {
    assert(json(GreaterThan("score", 1.5)).contains("\"valueType\":\"double\""))
    assert(json(LessThanOrEqual("big", 9L)).contains("\"valueType\":\"long\""))
    assert(json(EqualTo("name", "x")).contains("\"valueType\":\"string\""))
  }

  test("unsupported columns/filters are not hinted") {
    assert(PredicateHints.fromFilter(EqualTo("bin", Array[Byte](1)), schema).isEmpty)
    assert(PredicateHints.fromFilter(StringContains("name", "x"), schema).isEmpty)
    // OR with one unsupported side must drop entirely (over-pruning risk)
    assert(PredicateHints.fromFilter(
      Or(EqualTo("id", 1), StringContains("name", "x")), schema).isEmpty)
    // AND keeps the supported side
    assert(PredicateHints.fromFilter(
      And(EqualTo("id", 1), StringContains("name", "x")), schema).get.json
      .contains("\"op\":\"equal\""))
  }

  test("timestamp literals render as UTC instants regardless of JVM zone") {
    // java.sql.Timestamp.toString is default-zone wall-clock time; a
    // pruner comparing it against UTC stats would evaluate hours off
    val prev = java.util.TimeZone.getDefault
    java.util.TimeZone.setDefault(
      java.util.TimeZone.getTimeZone("America/Los_Angeles"))
    try {
      val ts = java.sql.Timestamp.from(
        java.time.Instant.parse("2021-06-02T06:00:00Z"))
      assert(json(LessThan("ts", ts)).contains("2021-06-02T06:00:00Z"))
    } finally java.util.TimeZone.setDefault(prev)
  }

  test("NOT over a partially-translatable AND is dropped (soundness)") {
    // And(a, untranslatable) may collapse to `a` ONLY in a positive
    // context; not(a) is NOT implied by Not(And(a, b)) — a pruner acting
    // on it would skip files containing matching rows.
    assert(PredicateHints.fromFilter(
      Not(And(LessThan("id", 5), StringContains("name", "z"))),
      schema).isEmpty)
    // fully-translatable NOT still works
    assert(PredicateHints.fromFilter(
      Not(And(LessThan("id", 5), EqualTo("score", 1.0))), schema).nonEmpty)
    // nested: Or under Not inherits strictness
    assert(PredicateHints.fromFilter(
      Not(Or(LessThan("id", 5),
        And(EqualTo("score", 1.0), StringContains("name", "z")))),
      schema).isEmpty)
  }

  test("IN-list becomes or-of-equals; nulls and oversized lists drop") {
    assert(json(In("id", Array(1, 2))) ==
      """{"op":"or","children":[{"op":"equal","children":[{"op":"column","name":"id","valueType":"int"},{"op":"literal","value":"1","valueType":"int"}]},{"op":"equal","children":[{"op":"column","name":"id","valueType":"int"},{"op":"literal","value":"2","valueType":"int"}]}]}""")
    // singleton IN collapses to plain equal
    assert(json(In("id", Array(7))) == json(EqualTo("id", 7)))
    // a NULL element makes IN three-valued — not hinted
    assert(PredicateHints.fromFilter(
      In("id", Array(1, null)), schema).isEmpty)
    // oversized lists aren't hinted (wire-size guard)
    assert(PredicateHints.fromFilter(
      In("id", (1 to 17).map(Int.box).toArray[Any]), schema).isEmpty)
    // catalyst path produces the same tree
    import org.apache.spark.sql.catalyst.{expressions => ce}
    val attr = ce.AttributeReference("id", IntegerType)()
    val catalystIn = ce.In(attr, Seq(ce.Literal(1), ce.Literal(2)))
    assert(PredicateHints.fromCatalyst(catalystIn, schema).get.json ==
      json(In("id", Array(1, 2))))
    // InSet (OptimizeIn's rewrite above threshold 10, still <= maxInList)
    // must hint too — 11..16-element lists take this form on the V2 path
    val catalystInSet = ce.InSet(attr, (1 to 12).map(Int.box).toSet[Any])
    val setHint = PredicateHints.fromCatalyst(catalystInSet, schema)
    assert(setHint.isDefined, "12-element InSet should produce a hint")
    assert("\"op\":\"equal\"".r.findAllIn(setHint.get.json).length == 12)
    // nulls and oversized sets drop, same as In
    assert(PredicateHints.fromCatalyst(
      ce.InSet(attr, Set[Any](1, null)), schema).isEmpty)
    assert(PredicateHints.fromCatalyst(
      ce.InSet(attr, (1 to 17).map(Int.box).toSet[Any]), schema).isEmpty)
  }

  test("conjunction hint of multiple filters") {
    val hint = PredicateHints.toHintJson(
      Seq(EqualTo("id", 1), LessThan("score", 2.0)), schema)
    assert(hint.get.startsWith("""{"op":"and","children":["""))
    assert(PredicateHints.toHintJson(Seq(StringContains("name", "x")), schema).isEmpty)
  }
}
