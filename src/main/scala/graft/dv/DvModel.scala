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

/** One table that loads a hub: the carrying table plus the columns that
  * form the hub's business key there (positionally matching the hub spec's
  * bkParts). The reference loads `hub_<bk_name>` from every source table
  * whose transformer response carries that business-key name
  * (controller/dv_builder.rs:130-148 names the key,
  * controller/dv_loader.rs:166-199 loads per source) — consolidation means
  * `customer.c_custkey` and `orders.o_custkey` feed ONE hub_customer.
  */
final case class HubSource(table: String, parts: Seq[Col])

/** A hub together with every source table that loads it (home table first —
  * its column names define the hub's `_bk` columns).
  */
final case class DerivedHub(spec: HubSpec, sources: Seq[HubSource])

/** A complete derived vault plan — what `planFromClassification` returns
  * and `go()` builds (the reference's Vec<BusinessKey> → DDL+DML pipeline,
  * controller/dv_builder.rs:74-201).
  */
final case class DvPlan(hubs: Seq[DerivedHub], sats: Seq[SatSpec], links: Seq[LinkSpec]) {
  def objectNames: Seq[String] =
    hubs.map(h => s"hub_${h.spec.name}") ++ sats.map(t => s"sat_${t.name}") ++
      links.map(l => s"link_${l.name}")
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
