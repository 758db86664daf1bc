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

  /** Read-compatibility projection for the CDF stream's drift guard: can
    * a plan compiled against `running` keep decoding files the server now
    * declares as `declared`? Field METADATA (comments, source tags) never
    * affects decoding, and a nullable→non-nullable TIGHTENING only
    * narrows what the server may send — a server that re-serializes a
    * semantically identical schema with different comments or stricter
    * nullability must not kill a healthy stream. What DOES kill it:
    * any name/type/field-set/order change, and a nullability WIDENING
    * (running non-null → declared nullable): the running plan's codegen
    * was compiled assuming the column can't be null, so evolved files
    * could feed it nulls it never checks for. One metadata key IS
    * semantic, not cosmetic: Spark encodes CHAR(n)/VARCHAR(n) as a
    * StringType plus `__CHAR_VARCHAR_TYPE_STRING` field metadata, so a
    * server changing a declared VARCHAR length (or CHAR↔VARCHAR-ness)
    * is a length-contract change the running plan's padding/truncation
    * behavior depends on — it must kill the stream, not pass as
    * comment churn (r12 ADVICE). */
  def readCompatible(running: StructType, declared: StructType): Boolean =
    typeCompatible(running, declared)

  /** Spark's reserved metadata key carrying the original CHAR/VARCHAR
    * type string for a StringType field
    * (org.apache.spark.sql.catalyst.util.CharVarcharUtils.CHAR_VARCHAR_TYPE_STRING_METADATA_KEY). */
  private val CharVarcharKey = "__CHAR_VARCHAR_TYPE_STRING"

  private def charVarcharOf(f: StructField): Option[String] =
    if (f.metadata.contains(CharVarcharKey))
      Some(f.metadata.getString(CharVarcharKey))
    else None

  private def typeCompatible(run: DataType, dec: DataType): Boolean =
    (run, dec) match {
      case (r: StructType, d: StructType) =>
        r.fields.length == d.fields.length &&
          r.fields.zip(d.fields).forall { case (rf, df) =>
            rf.name == df.name &&
              nullOk(rf.nullable, df.nullable) &&
              charVarcharOf(rf) == charVarcharOf(df) &&
              typeCompatible(rf.dataType, df.dataType)
          }
      case (r: ArrayType, d: ArrayType) =>
        nullOk(r.containsNull, d.containsNull) &&
          typeCompatible(r.elementType, d.elementType)
      case (r: MapType, d: MapType) =>
        nullOk(r.valueContainsNull, d.valueContainsNull) &&
          typeCompatible(r.keyType, d.keyType) &&
          typeCompatible(r.valueType, d.valueType)
      case (r, d) => r == d
    }

  /** declared may be nullable only where running already tolerates null. */
  private def nullOk(running: Boolean, declared: Boolean): Boolean =
    running || !declared
}
