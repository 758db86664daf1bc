package graft.sharing

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema translation envelope (reference src/datasource/schema.rs). */
class DeltaSchemaSpec extends AnyFunSuite {

  test("primitive struct round-trips") {
    val s = StructType(Seq(
      StructField("s", StringType), StructField("l", LongType),
      StructField("i", IntegerType), StructField("sh", ShortType),
      StructField("b", ByteType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("bool", BooleanType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampType),
      StructField("dec", DecimalType(38, 10))))
    assert(DeltaSchema.fromSchemaString(DeltaSchema.toSchemaString(s)) == s)
  }

  test("nested array/map/struct preserved with nullability") {
    val s = StructType(Seq(
      StructField("arr", ArrayType(LongType, containsNull = false)),
      StructField("m", MapType(StringType, DoubleType, valueContainsNull = true)),
      StructField("st", StructType(Seq(StructField("x", StringType, nullable = false))))))
    assert(DeltaSchema.fromSchemaString(s.json) == s)
  }

  test("decimal precision > 38 rejected (narrower than reference p<=76)") {
    // Spark can't represent DecimalType(40,_); splice the JSON directly.
    val json =
      """{"type":"struct","fields":[{"name":"d","type":"decimal(40,2)","nullable":true,"metadata":{}}]}"""
    val e = intercept[DeltaSharingException](DeltaSchema.fromSchemaString(json))
    assert(e.getMessage.toLowerCase.contains("decimal"))
  }

  test("timestamp_ntz accepted (deliberate widening of schema.rs:261 TODO)") {
    val json =
      """{"type":"struct","fields":[{"name":"t","type":"timestamp_ntz","nullable":true,"metadata":{}}]}"""
    assert(DeltaSchema.fromSchemaString(json).head.dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
  }

  test("non-struct and garbage schemaStrings rejected") {
    intercept[DeltaSharingException](DeltaSchema.fromSchemaString("\"long\""))
    intercept[DeltaSharingException](DeltaSchema.fromSchemaString("not json"))
  }

  test("readCompatible: metadata churn and nullable tightening tolerated") {
    val running = StructType(Seq(
      StructField("a", LongType, nullable = true),
      StructField("b", ArrayType(StringType, containsNull = true))))
    // same structure, a comment added + nullable→non-null tightening
    val declared = StructType(Seq(
      StructField("a", LongType, nullable = false,
        new MetadataBuilder().putString("comment", "server note").build()),
      StructField("b", ArrayType(StringType, containsNull = false))))
    assert(DeltaSchema.readCompatible(running, declared))
  }

  test("readCompatible: structural drift and nullability widening kill") {
    val running = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("m", MapType(StringType, LongType,
        valueContainsNull = false))))
    // widening a non-null running field to nullable: codegen compiled
    // without null checks could be fed nulls — incompatible
    assert(!DeltaSchema.readCompatible(running,
      running.copy(fields = running.fields.updated(0,
        running.fields(0).copy(nullable = true)))))
    // type change
    assert(!DeltaSchema.readCompatible(running,
      running.copy(fields = running.fields.updated(0,
        running.fields(0).copy(dataType = IntegerType)))))
    // rename
    assert(!DeltaSchema.readCompatible(running,
      running.copy(fields = running.fields.updated(0,
        running.fields(0).copy(name = "a2")))))
    // added column
    assert(!DeltaSchema.readCompatible(running,
      StructType(running.fields :+ StructField("c", StringType))))
    // map value-nullability widening, nested
    assert(!DeltaSchema.readCompatible(running,
      running.copy(fields = running.fields.updated(1,
        StructField("m", MapType(StringType, LongType,
          valueContainsNull = true))))))
  }

  test("readCompatible: CHAR/VARCHAR metadata is semantic, not churn") {
    // Spark encodes CHAR(n)/VARCHAR(n) as StringType +
    // __CHAR_VARCHAR_TYPE_STRING metadata; a declared length change is
    // a length-contract change, not comment churn (r12 ADVICE).
    def cv(t: String): Metadata = new MetadataBuilder()
      .putString("__CHAR_VARCHAR_TYPE_STRING", t).build()
    val runningV10 = StructType(Seq(
      StructField("s", StringType, nullable = true, cv("varchar(10)"))))
    // identical declared length: compatible even with extra comment keys
    val sameLenPlusComment = StructType(Seq(
      StructField("s", StringType, nullable = true,
        new MetadataBuilder().putString("__CHAR_VARCHAR_TYPE_STRING",
          "varchar(10)").putString("comment", "note").build())))
    assert(DeltaSchema.readCompatible(runningV10, sameLenPlusComment))
    // length change kills
    assert(!DeltaSchema.readCompatible(runningV10, StructType(Seq(
      StructField("s", StringType, nullable = true, cv("varchar(20)"))))))
    // CHAR↔VARCHAR-ness change kills
    assert(!DeltaSchema.readCompatible(runningV10, StructType(Seq(
      StructField("s", StringType, nullable = true, cv("char(10)"))))))
    // dropping the char/varchar declaration (plain string) kills too:
    // the running plan pads/truncates where the new contract would not
    assert(!DeltaSchema.readCompatible(runningV10, StructType(Seq(
      StructField("s", StringType, nullable = true)))))
    assert(!DeltaSchema.readCompatible(
      StructType(Seq(StructField("s", StringType))), runningV10))
  }
}
