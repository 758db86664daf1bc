package graft.sharing

import org.apache.spark.sql.types._

/** Delta-protocol `schemaString` → Spark `StructType`.
  *
  * The reference hand-rolls a 531-line JSON→Arrow converter
  * (src/datasource/schema.rs:406-531); in Spark the Delta schema
  * serialization IS Spark SQL's own DataType JSON format, so translation
  * collapses to `DataType.fromJson` plus a validation envelope enforcing
  * the reference's type rules:
  *
  *  - supported primitives: string long integer short byte float double
  *    boolean binary date timestamp decimal(p,s) (schema.rs:235-269);
  *  - `timestamp_ntz` is ACCEPTED — a deliberate widening of the
  *    reference envelope (schema.rs:261 leaves it TODO): the Delta
  *    protocol has since standardized timestampNtz and Spark supports it
  *    natively, so rejecting it would make ordinary tables unreadable;
  *  - decimal precision capped at 38 — Spark has no Decimal256, so the
  *    envelope is narrower than the reference's p≤76 (schema.rs:497-508);
  *  - struct/array/map recurse with nullability preserved.
  */
object DeltaSchema {

  def fromSchemaString(schemaString: String): StructType = {
    val parsed =
      try DataType.fromJson(schemaString)
      catch {
        case e: Exception => throw DeltaSharingException.parseResponse(
          s"Invalid schemaString: ${e.getMessage}")
      }
    parsed match {
      case st: StructType => validate(st).asInstanceOf[StructType]
      case other => throw DeltaSharingException.parseResponse(
        s"schemaString must be a struct, got ${other.typeName}")
    }
  }

  private def validate(dt: DataType): DataType = dt match {
    case st: StructType =>
      StructType(st.fields.map(f => f.copy(dataType = validate(f.dataType))))
    case at: ArrayType => at.copy(elementType = validate(at.elementType))
    case mt: MapType =>
      mt.copy(keyType = validate(mt.keyType), valueType = validate(mt.valueType))
    case d: DecimalType =>
      if (d.precision > 38) throw DeltaSharingException.parseResponse(
        s"decimal precision ${d.precision} exceeds the supported maximum of 38")
      else d
    case StringType | LongType | IntegerType | ShortType | ByteType |
         FloatType | DoubleType | BooleanType | BinaryType | DateType |
         TimestampType | TimestampNTZType => dt
    case other => throw DeltaSharingException.parseResponse(
      s"Unsupported data type in schemaString: ${other.typeName}")
  }

  /** Spark StructType → Delta schemaString (used by the local sharing
    * server to describe tables it serves). Spark's JSON serialization is
    * already the Delta wire format. */
  def toSchemaString(schema: StructType): String = schema.json
}
