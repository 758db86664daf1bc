package graft.sharing.catalog

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sharing._

/** `spark.read.format("graft-sharing").load("<profile>#<share>.<schema>.<table>")`
  * — the DataFrameReader face of the connector (reference entry point
  * `DeltaSharingTable::try_from_str`, src/datasource/table.rs:93-103).
  */
final class GraftSharingDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-sharing"

  private def connect(options: CaseInsensitiveStringMap): (DeltaSharingClient, TableRef) = {
    val path = Option(options.get("path")).getOrElse(
      throw DeltaSharingException.parseSecurable(
        "graft-sharing needs a load path of the form <profile>#<share>.<schema>.<table>"))
    val (profilePath, ref) = GraftSharing.parseConnection(path)
    (new DeltaSharingClient(Profile.fromPath(profilePath)), ref)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (client, ref) = connect(options)
    DeltaSchema.fromSchemaString(client.getTableMetadata(ref)._2.schemaString)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val (client, ref) = connect(options)
    // optional time travel: pin every server interaction (metadata AND
    // file listing AND per-task URL refresh) to a past version
    val versionAsOf = Option(options.get("versionAsOf")).map { raw =>
      raw.toLongOption.filter(_ >= 0).getOrElse(
        throw DeltaSharingException.parseSecurable(
          s"versionAsOf must be a non-negative integer, got: $raw"))
    }
    val (_, metadata) = client.getTableMetadata(ref, versionAsOf)
    val profilePath = Option(options.get("path")).map(_.split("#")(0))
    new GraftTable(client, ref, metadata, profilePath, versionAsOf)
  }

  override def supportsExternalMetadata(): Boolean = false
}
