package graft.dv

/** Static model of the DV plan — the Spark-side analogue of the reference's
  * DVSchema/BusinessKey/Descriptor tree (extension/src/model/dv_schema.rs).
  * UUIDs/timestamps are omitted: the plan here is a pure function of the
  * source schema, so identity is the name.
  */
final case class Col(name: String, typeName: String)

final case class HubSpec(name: String, sourceTable: String, bkParts: Seq[Col]) {
  def hkName: String = s"hub_${name}_hk"
}

final case class SatSpec(
    name: String,
    sourceTable: String,
    hubName: String,
    bkParts: Seq[Col],
    descriptors: Seq[Col],
    sensitive: Boolean,
    hkColumn: Option[String] = None) {
  def hdName: String = s"sat_${name}_hd"
  /** Satellites normally orbit a hub; link satellites override the key col. */
  def hkName: String = hkColumn.getOrElse(s"hub_${hubName}_hk")
}

/** A link member: the hub it points at plus the source columns forming
  * that hub's business key in this source table.
  */
final case class LinkMember(hubName: String, parts: Seq[Col])

final case class LinkSpec(
    name: String,
    sourceTable: String,
    members: Seq[LinkMember],
    degenerate: Seq[Col] = Nil) {
  def hkName: String = s"link_${name}_hk"
}

object DvDefaults {
  /** Injected load timestamp — wall-clock time is not reproducible, so the
    * engine takes load_ts as a parameter (the reference stamps
    * CURRENT_TIMESTAMP, dv_loader.rs:173).
    */
  val LoadTs = "2024-01-01 00:00:00"
  /** Ghost-record load_ts (reference dv_loader.rs:121). */
  val GhostTs = "0001-01-01 00:00:00"
  val GhostSource = "SYSTEM"
  def recordSource(table: String): String = s"source.$table"
}
