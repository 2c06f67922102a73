package graft.dv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Drift → re-plan, closed as one loop: when the catalog re-scan detects a
  * re-typed column ([[CatalogScd2.merge]], the reclassify path), derive the
  * vault plan under BOTH catalog worlds and decide per vault object whether
  * its stored hashes survive the drift or the object must be rebuilt.
  *
  * The reference's bgw loop re-scans the catalog and re-runs the dv_builder
  * over the refreshed source_objects (controller/bgw_source_objects.rs,
  * controller/dv_builder.rs:378-448); it never answers "which already-built
  * objects did this drift invalidate". graft makes that the operator: a
  * type change invalidates an object iff it changes the CANONICALIZATION
  * CLASS of a hash input (GraftFunctions.canon: double→exact-decimal text,
  * timestamp→epoch-ms text, everything else→plain text) — same name, same
  * category, but the stored hub-hash/hash-diff columns no longer reproduce.
  *
  * The drift pair exercised is real: events.ts bigint→timestamp is exactly
  * the re-type the 2026-08-13 testdata regeneration shipped (it invalidates
  * sat_event's hash-diff), plus the Reclassify scenario's lossy
  * customer.c_acctbal double→varchar export (invalidates the sensitive
  * satellite). Both plans come from live classifier+planner runs — the
  * static oracle pins the derivation, not a hand-written table.
  */
object Replan {

  /** The pre-drift catalog world: what rounds 1-4 observed. */
  val PreTypes: Map[(String, String), String] = Map(("events", "ts") -> "bigint")

  /** The post-drift world: the current catalog plus the simulated lossy
    * re-export (Reclassify.DriftTable/DriftColumn/DriftType).
    */
  val PostTypes: Map[(String, String), String] =
    Map((Reclassify.DriftTable, Reclassify.DriftColumn) -> Reclassify.DriftType)

  /** Canonicalization class of a type — two types hash identically iff
    * their classes match (mirror of GraftFunctions.canon/canonSql: the
    * DECIMAL(12,2) route for double, the epoch-ms route for timestamp,
    * plain text for the rest).
    */
  def canonClass(typeName: String): String = typeName match {
    case "double"    => "dec2"
    case "timestamp" => "epochms"
    case _           => "text"
  }

  /** The hash inputs of a vault object, as name:canon-class pairs — the
    * hub hash key's BK parts, a satellite's hash-diff descriptors, a
    * link's member FK parts plus degenerates.
    */
  private def hashSig(parts: Seq[Col]): String =
    parts.map(c => s"${c.name}:${canonClass(c.typeName)}").mkString("+")

  private def planSigs(plan: DvPlan): Seq[(String, String, String)] =
    plan.hubs.map(h => ("hub", h.spec.name, hashSig(h.spec.bkParts))) ++
      plan.sats.map(t => ("sat", t.name, hashSig(t.descriptors))) ++
      plan.links.map(l => ("link", l.name,
        hashSig(l.members.flatMap(_.parts) ++ l.degenerate)))

  /** One row per vault object: its hash signature in the pre- and
    * post-drift catalog worlds, the drifted columns (from the SCD2 catalog
    * merge — the detection half of the loop) it carries among its hash
    * inputs, and keep/rebuild. Spark side = live SCD2 merge + two live
    * classifier+planner derivations; oracle = the static expectation.
    */
  def replanDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Detection: the same SCD2 catalog merge the reclassify loop runs —
    // drifted columns are the current versions the re-scan opened.
    val state = CatalogScd2.merge(
      CatalogScd2.init(Reclassify.snapshot(s, PreTypes), Reclassify.T1),
      Reclassify.snapshot(s, PostTypes), Reclassify.T2)
    val drifted = state
      .filter(col("current_flag") === "Y" && col("deleted_flag") === "N" &&
        col("valid_from") === Reclassify.T2)
      .select(col("table_name"), col("column_name"))
    // Derivation: full-scope plans under both type worlds (catalog types
    // and type-derived signals patched; name signals — and hence the
    // object set — are identical, which the inner join below relies on
    // and ReplanSpec asserts).
    val ctx = Classify.demoContext ++ DvPlanner.goContext
    val pre = DvPlanner.planFromClassification(
      s, dir, DvPlanner.FullScope, ctx, typeOverride = PreTypes)
    val post = DvPlanner.planFromClassification(
      s, dir, DvPlanner.FullScope, ctx, typeOverride = PostTypes)
    // Column → object ownership comes from the POST plan's parts; the
    // drifted list is joined in so the output names which catalog event
    // triggered each rebuild.
    val owners = (post.hubs.map(h => (h.spec.sourceTable, "hub", h.spec.name, h.spec.bkParts)) ++
      post.sats.map(t => (t.sourceTable, "sat", t.name, t.descriptors)) ++
      post.links.map(l => (l.sourceTable, "link", l.name, l.members.flatMap(_.parts) ++ l.degenerate)))
      .flatMap { case (src, ot, on, parts) => parts.map(p => (src, p.name, ot, on)) }
      .toDF("table_name", "column_name", "object_type", "object_name")
    val driftByObject = owners.join(drifted, Seq("table_name", "column_name"))
      .groupBy("object_type", "object_name")
      .agg(concat_ws("+", sort_array(collect_list("column_name"))).as("drifted_cols"))
    val preDf = planSigs(pre).toDF("object_type", "object_name", "pre_sig")
    val postDf = planSigs(post).toDF("object_type", "object_name", "post_sig")
    preDf.join(postDf, Seq("object_type", "object_name"))
      .join(driftByObject, Seq("object_type", "object_name"), "left")
      .select(col("object_type"), col("object_name"), col("pre_sig"), col("post_sig"),
        coalesce(col("drifted_cols"), lit("")).as("drifted_cols"),
        when(col("pre_sig") =!= col("post_sig"), "rebuild").otherwise("keep").as("action"))
      .orderBy("object_type", "object_name")
  }

  /** Static oracle: the expected catalog plan with signatures computed from
    * the registry + the two drift maps — exercised as a VALUES table so
    * DuckDB needs no live session (the dv_plan_catalog convention).
    */
  def replanDriftSql: String = {
    def typeOf(world: Map[(String, String), String])(table: String, colName: String): String =
      world.getOrElse((table, colName),
        SourceSchemas.columns(table).find(_.name == colName).get.typeName)
    def sig(world: Map[(String, String), String], table: String, cols: Seq[String]): String =
      cols.map(c => s"$c:${canonClass(typeOf(world)(table, c))}").mkString("+")
    val rows = DvPlanner.expectedCatalogPlan.map { case (ot, on, src, keys, attrs) =>
      val cols = ot match {
        case "hub"  => keys.split('+').toSeq
        case "sat"  => attrs.split('+').toSeq
        case "link" => keys.split('+').toSeq.map(_.split(':')(1)) ++
          (if (attrs.isEmpty) Nil else attrs.split('+').toSeq)
      }
      val preSig = sig(PreTypes, src, cols)
      val postSig = sig(PostTypes, src, cols)
      val driftedCols = cols.filter(c => typeOf(PreTypes)(src, c) != typeOf(PostTypes)(src, c))
        .sorted.mkString("+")
      val action = if (preSig != postSig) "rebuild" else "keep"
      s"('$ot', '$on', '$preSig', '$postSig', '$driftedCols', '$action')"
    }
    s"""SELECT * FROM (VALUES
       |  ${rows.mkString(",\n  ")}
       |) AS t(object_type, object_name, pre_sig, post_sig, drifted_cols, action)
       |ORDER BY object_type, object_name""".stripMargin
  }
}
