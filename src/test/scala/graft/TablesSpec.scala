package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Guards the timestamp canonicalization in [[Tables.load]] (round-10
  * verdict ask #1): the driver's generator has flipped timestamp physical
  * types across rounds, and an NTZ leak breaks any `Row.getTimestamp`
  * accessor (the round-10 `LayoutSpec` failure). Every table must load
  * with zero TIMESTAMP_NTZ columns regardless of what the parquet stores.
  */
class TablesSpec extends SparkTestBase {

  test("no table exposes a TIMESTAMP_NTZ column after load") {
    for (n <- Tables.names) {
      val ntz = Tables.load(spark, sf0001, n).schema.fields
        .filter(_.dataType == TimestampNTZType).map(_.name)
      assert(ntz.isEmpty, s"$n leaks NTZ columns: ${ntz.mkString(", ")}")
    }
  }

  test("the generator-flipped columns land on canonical LTZ TimestampType") {
    assert(Tables.lineitem(spark, sf0001)
      .schema("l_shipdate").dataType == TimestampType)
    assert(Tables.orders(spark, sf0001)
      .schema("o_orderdate").dataType == TimestampType)
    assert(Tables.events(spark, sf0001)
      .schema("ts").dataType == TimestampType)
  }

  test("getTimestamp works on collected min/max (the LayoutSpec regression)") {
    import org.apache.spark.sql.functions.{max, min}
    val r = Tables.lineitem(spark, sf0001)
      .agg(min("l_shipdate").as("mn"), max("l_shipdate").as("mx"))
      .collect()(0)
    assert(r.getTimestamp(0).getTime <= r.getTimestamp(1).getTime)
  }
}
