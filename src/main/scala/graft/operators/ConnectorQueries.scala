package graft.operators

import graft.QueryDef

/** Delta-Sharing-connector-backed queries: each reads the test tables
  * through the full HTTP sharing path (mock server → REST client → signed
  * URLs → parquet-over-HTTP scan), proving the SURVEY §2.1 connector
  * stack end-to-end inside the driver's correctness gate.
  *
  * Populated once the connector layers land (client, source, catalog).
  */
object ConnectorQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
