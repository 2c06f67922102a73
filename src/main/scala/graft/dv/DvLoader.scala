package graft.dv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-driven incremental loading — the reference's continuous-load path:
  * `dv_load_schema_from_build_id` deserializes the DVSchema a `go()` stored
  * in the repo and `dv_data_loader` generates the hub/sat DML from it
  * (controller/dv_loader.rs:5-66). Here: parse `dv_schema.json` back into
  * typed specs with Spark's JSON reader and drive the (hk) / (hk, hd)
  * anti-join increments against the stored parquet objects.
  *
  * At scale this is the steady-state pipeline: build once, then every
  * arriving batch is an anti-join append driven by the stored schema — the
  * stored side stays bucketed on the hash key, so no shuffle on the big side.
  */
object DvLoader {

  /** Bucketed-layout marker a bucketed go() writes into the repo: vault
    * objects live as catalog tables `<tablePrefix><object>` bucketed by
    * their anti-join keys, so loads must read (and append) through the
    * catalog — reading the parquet path directly would drop the bucket
    * metadata and reintroduce the stored-side shuffle.
    *
    * The bucket spec lives in the catalog, not in the parquet files: on a
    * cluster that is a shared metastore; in a fresh in-memory-catalog
    * session the loader re-registers each table from the repo path + this
    * marker (CREATE TABLE ... CLUSTERED BY ... LOCATION) before reading,
    * so a bucketed repo is loadable from any session.
    */
  final case class Bucketing(tablePrefix: String, buckets: Int)

  final case class DvSchemaRef(hubs: Seq[HubSpec], sats: Seq[SatSpec], links: Seq[LinkSpec],
                               bucketing: Option[Bucketing] = None)

  /** Parse the repo's dv_schema.json back into typed specs.
    *
    * DRIVER-SIDE parse (r14, guide §5 "the driver should do almost no data
    * work" read the other way round: metadata must never cost a CLUSTER
    * job). The previous `spark.read.json(multiLine)` ran a schema-inference
    * Spark job + collect per call — and this is called once per incremental
    * load, TWICE per streaming micro-batch (streamTableLoadBatch +
    * streamTableLoadPlans) and once per compaction/purge rewrite, so the
    * bucketed E2E paid ~7 pure-overhead jobs per run and every streaming
    * micro-batch paid two. The repo schema is a few-KB JSON document;
    * Jackson (on Spark's own classpath) parses it in microseconds. Same
    * fix shape as IvfIndexRepo.bucketing's meta parse. The SparkSession
    * parameter stays: the schema file is read through the session's Hadoop
    * FS so non-local repo URIs keep working.
    */
  def readSchema(s: SparkSession, repoDir: String): DvSchemaRef = {
    import scala.jdk.CollectionConverters._
    val p = new org.apache.hadoop.fs.Path(s"$repoDir/dv_schema.json")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val txt = scala.util.Using.resource(fs.open(p)) { in =>
      new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    }
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
    def arr(n: com.fasterxml.jackson.databind.JsonNode, field: String) =
      Option(n.get(field)).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    def cols(n: com.fasterxml.jackson.databind.JsonNode, field: String): Seq[Col] =
      arr(n, field).map(c => Col(c.get("name").asText(), c.get("type").asText()))
    def optText(n: com.fasterxml.jackson.databind.JsonNode, field: String): Option[String] =
      Option(n.get(field)).filterNot(_.isNull).map(_.asText())
    val bucketing = Option(root.get("bucketing")).filterNot(_.isNull).map(b =>
      Bucketing(b.get("table_prefix").asText(), b.get("buckets").asInt()))
    val hubs = arr(root, "hubs").map(h =>
      HubSpec(h.get("name").asText(), h.get("source").asText(), cols(h, "bk_parts")))
    val sats = arr(root, "satellites").map(t =>
      SatSpec(t.get("name").asText(), t.get("source").asText(), t.get("hub").asText(),
        cols(t, "bk_parts"), cols(t, "descriptors"), t.get("sensitive").asBoolean(),
        // hk_column is optional in the repo (only link-orbiting satellites carry it)
        optText(t, "hk_column")))
    val links = arr(root, "links").map(l =>
      LinkSpec(l.get("name").asText(), l.get("source").asText(),
        arr(l, "members").map(m =>
          LinkMember(m.get("hub").asText(), cols(m, "parts"))),
        cols(l, "degenerate")))
    DvSchemaRef(hubs, sats, links, bucketing)
  }

  /** One incremental load pass over every schema object in `scope`: batch
    * frames from the current source, anti-join against the stored parquet,
    * append only novel rows. Returns (object, n_appended).
    */
  /** Anti-join keys per schema object, derived from the PARSED schema (not
    * the static plan registry — a hand-authored dv_schema.json must load
    * with its own keys): hash key for hubs/links, (hash key, hash diff)
    * for satellites.
    */
  private[dv] def schemaKeys(schema: DvSchemaRef, obj: String): Seq[String] =
    schema.hubs.find(h => s"hub_${h.name}" == obj).map(h => Seq(h.hkName))
      .orElse(schema.sats.find(t => s"sat_${t.name}" == obj).map(t => Seq(t.hkName, t.hdName)))
      .orElse(schema.links.find(l => s"link_${l.name}" == obj).map(l => Seq(l.hkName)))
      .getOrElse(sys.error(s"object $obj not in the repo schema"))

  /** Bucketed-aware stored-side read: the catalog table (re-registered if
    * this session lacks the entry) when the repo is bucketed — the table
    * read carries the bucket spec, so the anti-join needs no Exchange on
    * this side — or the parquet path for a plain repo.
    */
  private def storedSide(s: SparkSession, repoDir: String, schema: DvSchemaRef,
                         obj: String): DataFrame =
    schema.bucketing match {
      case Some(b) => storedObject(s, repoDir, obj, schemaKeys(schema, obj), b)
      case None => s.read.parquet(s"$repoDir/$obj")
    }

  /** Generic bucketed-object READ — the storedSide discipline with
    * explicit keys and bucket spec, for repo objects that are not vault
    * schema objects (the IVF index repo): through the session catalog
    * (re-registered if this session lacks the entry) so the table read
    * carries the bucket spec and keyed anti-joins need no Exchange on
    * this side.
    */
  private[graft] def storedObject(s: SparkSession, repoDir: String, obj: String,
                                  keys: Seq[String], b: Bucketing): DataFrame = {
    val table = s"${b.tablePrefix}$obj"
    if (!s.catalog.tableExists(table))
      registerBucketed(s, repoDir, obj, keys, b)
    s.table(table)
  }

  /** Bucketed-aware append: through the catalog under the same bucket spec
    * (creating the external table over the repo path on the first write)
    * so the layout survives every load — appending plain parquet files
    * into a bucketed table's directory would corrupt its layout. Plain
    * repos append parquet directly.
    */
  private def appendSide(s: SparkSession, repoDir: String, schema: DvSchemaRef,
                         obj: String, novel: DataFrame): Unit =
    schema.bucketing match {
      case Some(b) => appendObject(s, repoDir, obj, schemaKeys(schema, obj), b, novel)
      case None => novel.write.mode("append").parquet(s"$repoDir/$obj")
    }

  /** Generic bucketed-object APPEND (see [[storedObject]]): through the
    * catalog under the object's bucket spec, creating the external table
    * over the repo path on the first write.
    */
  private[graft] def appendObject(s: SparkSession, repoDir: String, obj: String,
                                  keys: Seq[String], b: Bucketing,
                                  novel: DataFrame): Unit =
    // Lease (r13 verdict #3): an append overlapping a stage-and-swap
    // rewrite (or another append to the SAME object) fails loudly
    // instead of racing the swap's file moves. Distinct objects append
    // concurrently as before — the lease is per object.
    DvMaintenance.withLease(repoDir, obj, "append") {
      val table = s"${b.tablePrefix}$obj"
      val w = novel.write.mode("append").format("parquet")
        .bucketBy(b.buckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
      (if (s.catalog.tableExists(table)) w
       else w.option("path", s"$repoDir/$obj")).saveAsTable(table)
    }

  def incrementalLoad(s: SparkSession, dir: String, repoDir: String,
                      loadTs: String = DvDefaults.LoadTs,
                      scope: String => Boolean = _ => true): Seq[(String, Long)] = {
    val schema = readSchema(s, repoDir)
    // count-of-appended rides on the write pass via an Observation — one
    // action per object, no cache (the same pattern as DvGo.go).
    def append(novel: DataFrame, obj: String): (String, Long) = {
      val obs = org.apache.spark.sql.Observation(s"load_${obj}_${System.nanoTime()}")
      appendSide(s, repoDir, schema, obj, novel.observe(obs, count(lit(1)).as("n")))
      obj -> obs.get("n").asInstanceOf[Long]
    }
    def stored(obj: String): DataFrame = storedSide(s, repoDir, schema, obj)
    // ordered = false throughout: the batch frames feed anti-joins and
    // appends, never an ordered consumer (r14, guide §2.4)
    val hubLoads = schema.hubs.filter(h => scope(s"hub_${h.name}")).map { h =>
      val batch = DvBuild.hub(s, dir, h, loadTs, ordered = false)
      append(DvBuild.hubIncrement(stored(s"hub_${h.name}").select(h.hkName), batch, h.hkName),
        s"hub_${h.name}")
    }
    val satLoads = schema.sats.filter(t => scope(s"sat_${t.name}")).map { t =>
      val batch = DvBuild.sat(s, dir, t, loadTs, ordered = false)
      append(DvBuild.satIncrement(stored(s"sat_${t.name}").select(t.hkName, t.hdName),
        batch, t.hkName, t.hdName), s"sat_${t.name}")
    }
    val linkLoads = schema.links.filter(l => scope(s"link_${l.name}")).map { l =>
      val batch = DvBuild.link(s, dir, l, loadTs, ordered = false)
      append(DvBuild.hubIncrement(stored(s"link_${l.name}").select(l.hkName), batch, l.hkName),
        s"link_${l.name}")
    }
    hubLoads ++ satLoads ++ linkLoads
  }

  /** Streaming continuous load — the reference's background-worker refresh
    * loop (controller/bgw_init.rs) re-expressed: every micro-batch of
    * `tableName` source rows runs the schema-driven increments for each
    * vault object that table feeds. Ghost records insert on the first
    * batch and are anti-joined away afterwards, exactly like the batch
    * path.
    */
  def streamTableLoadBatch(s: SparkSession, batch: DataFrame, tableName: String,
                           repoDir: String, loadTs: String,
                           suppressDir: Option[String] = None): Unit = {
    val schema = readSchema(s, repoDir)
    // The per-object loads are independent (distinct directories/catalog
    // tables, shared read-only batch) — submit them concurrently like
    // DvGo.go's builds; the scheduler interleaves their jobs.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val loads = streamTableLoadPlans(s, batch, tableName, repoDir, loadTs, suppressDir).map {
      case (obj, novel) => () => appendSide(s, repoDir, schema, obj, novel)
    }
    Await.result(Future.sequence(loads.map(f => Future(f()))), Duration.Inf)
  }

  /** The per-object micro-batch PLANS of the schema-driven streaming load
    * — (object name, novel-rows frame) pairs, exposed unwritten so the
    * streaming plan sweep (r10 verdict #8) audits the exact frames every
    * micro-batch executes; [[streamTableLoadBatch]] appends them.
    */
  def streamTableLoadPlans(s: SparkSession, batch: DataFrame, tableName: String,
                           repoDir: String, loadTs: String,
                           suppressDir: Option[String] = None): Seq[(String, DataFrame)] = {
    val schema = readSchema(s, repoDir)
    // Standing erasure suppression (r13 ADVICE — erased data must not be
    // resurrectable): novel rows for a SENSITIVE satellite anti-join the
    // erasure processed log (obj, hk) — a replayed/redelivered batch that
    // still carries a purged victim's source rows appends nothing for
    // that key, ever. Request-scale right side → broadcast; non-sensitive
    // objects (hubs, links, ordinary sats) are untouched: erasure rewrites
    // descriptors, never the pseudonymous skeleton.
    def suppress(obj: String, hkName: String, novel: DataFrame): DataFrame =
      suppressDir.filter(ed => obj.endsWith("_sensitive") && pathExists(s, s"$ed/processed"))
        .map { ed =>
          novel.join(
            org.apache.spark.sql.functions.broadcast(
              s.read.parquet(s"$ed/processed")
                .filter(org.apache.spark.sql.functions.col("obj") === obj)
                .select(org.apache.spark.sql.functions.col("hk").as(hkName)).distinct()),
            Seq(hkName), "left_anti")
        }.getOrElse(novel)
    // First micro-batch of a fresh repo: nothing stored yet -> full insert.
    // ONLY a missing path means "fresh" — any other analysis failure
    // (schema drift, renamed hash-key column) must fail the batch loudly,
    // or every micro-batch would silently degrade to a full duplicate
    // insert. Reads and appends route through the bucketed-aware helpers:
    // a streaming load into a bucketed repo keeps the bucket layout (an
    // unrouted plain-parquet append would corrupt it for every later read).
    def novelAgainst(obj: String, keys: Seq[String], b: DataFrame): DataFrame =
      try {
        b.join(storedSide(s, repoDir, schema, obj).select(keys.head, keys.tail: _*),
          keys, "left_anti")
      } catch {
        case e: org.apache.spark.sql.AnalysisException if isPathMissing(e) => b
      }
    // ordered = false: micro-batch frames feed anti-joins and appends; on
    // the FIRST batch of a fresh repo the frame is appended raw, where the
    // builders' trailing sort would actually execute (r14, guide §2.4)
    schema.hubs.filter(_.sourceTable == tableName).map { h =>
      s"hub_${h.name}" ->
        novelAgainst(s"hub_${h.name}", Seq(h.hkName),
          DvBuild.hubFrom(s, batch, h, loadTs, ordered = false))
    } ++
    schema.sats.filter(_.sourceTable == tableName).map { t =>
      s"sat_${t.name}" ->
        suppress(s"sat_${t.name}", t.hkName,
          novelAgainst(s"sat_${t.name}", Seq(t.hkName, t.hdName),
            DvBuild.satFrom(batch, t, loadTs, ordered = false)))
    } ++
    schema.links.filter(_.sourceTable == tableName).map { l =>
      s"link_${l.name}" ->
        novelAgainst(s"link_${l.name}", Seq(l.hkName),
          DvBuild.linkFrom(batch, l, loadTs, ordered = false))
    }
  }

  /** Re-register a bucketed vault table over its existing repo files —
    * the fresh-session path: the files carry Spark's bucketed naming, so
    * an external CLUSTERED BY table with the identical spec reads them
    * shuffle-free exactly like the building session's catalog entry did.
    */
  private[dv] def registerBucketed(s: SparkSession, repoDir: String, obj: String,
                                   keys: Seq[String], b: Bucketing): Unit = {
    val ddlSchema = s.read.parquet(s"$repoDir/$obj").schema.toDDL
    val keyList = keys.mkString(", ")
    // single quotes in the path are legal POSIX — escape them or the
    // generated LOCATION literal breaks for such repos
    val loc = s"$repoDir/$obj".replace("'", "''")
    // IF NOT EXISTS: two sessions racing the re-registration on a shared
    // metastore must both proceed, not crash the loser's load
    s.sql(s"""CREATE TABLE IF NOT EXISTS ${b.tablePrefix}$obj ($ddlSchema) USING parquet
             |CLUSTERED BY ($keyList) SORTED BY ($keyList) INTO ${b.buckets} BUCKETS
             |LOCATION '$loc'""".stripMargin)
  }

  /** True only for "the stored object does not exist yet" failures.
    * Primary match is the stable error condition (PATH_NOT_FOUND) rather
    * than message text — a Spark upgrade rewording the message must not
    * turn every fresh repo's first micro-batch into a crash. The message
    * check stays as a fallback for exceptions raised without a condition.
    */
  private[graft] def isPathMissing(e: org.apache.spark.sql.AnalysisException): Boolean = {
    val cond = Option(e.getCondition).getOrElse("")
    val m = Option(e.getMessage).getOrElse("")
    cond == "PATH_NOT_FOUND" || m.contains("PATH_NOT_FOUND") || m.contains("Path does not exist")
  }

  /** Existence probe through the session's Hadoop FS (works for any
    * supported filesystem URI, unlike java.nio).
    */
  private[graft] def pathExists(s: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Wire the continuous load onto a streaming source of `tableName` rows. */
  def streamTableLoadSink(rows: DataFrame, tableName: String, repoDir: String,
                          checkpoint: String) =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        streamTableLoadBatch(batch.sparkSession, batch, tableName, repoDir, s"batch_$batchId")
      }

  /** Query face: seed a repo with a partial build (customers with
    * custkey % 5 != 0), then run the schema-driven load from the full
    * source — the appended counts are exactly the % 5 == 0 remainder, which
    * the oracle derives from source cardinality.
    */
  def loadFromRepo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import DvPlanner.{hubCustomer, satCustomer}
    val repo = java.nio.file.Files.createTempDirectory("graft_dv_repo_").toString
    val keep = expr("cast(c_custkey_bk as bigint) % 5 != 0") // ghosts (-1,-2) stay
    // ordered = false: seed frames are written, never read ordered (r14)
    val hub0 = DvBuild.hub(s, dir, hubCustomer, ordered = false).filter(keep)
    hub0.write.mode("overwrite").parquet(s"$repo/hub_customer")
    DvBuild.sat(s, dir, satCustomer, ordered = false)
      .join(hub0.select(satCustomer.hkName), Seq(satCustomer.hkName), "left_semi")
      .write.mode("overwrite").parquet(s"$repo/sat_customer")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$repo/dv_schema.json"),
      DvGo.planJson(DvPlanner.literalPlan, "repo-load-demo", Set("hub_customer", "sat_customer")))
    val scope = Set("hub_customer", "sat_customer")
    val counts = incrementalLoad(s, dir, repo, scope = scope)
    // counts are materialized; the seeded repo is no longer needed
    deleteRecursively(java.nio.file.Paths.get(repo))
    counts.toDF("object", "n_new").orderBy("object")
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = deletePath(p)

  /** Depth-first recursive delete; the Files.walk stream is closed (it
    * holds open directory descriptors until then).
    */
  private[graft] def deletePath(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    def sweep(): Unit =
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { walk =>
        walk.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    if (java.nio.file.Files.exists(p)) {
      try sweep()
      catch {
        // A racing writer — executor tasks of an ABORTING job still
        // flushing into the vault dir — can create files between the walk
        // and the reverse delete (observed at sf10: DirectoryNotEmptyException
        // from goBucketedE2E's finally while a disk-full abort was still
        // unwinding, which then MASKED the real failure). Settle briefly
        // and re-walk once; cleanup callers treat a second failure as
        // non-masking (logged, not thrown over the primary exception).
        case _: java.io.IOException =>
          Thread.sleep(500); sweep()
      }
    }
  }

  /** deletePath for `finally` blocks: never throws — a cleanup failure
    * must not REPLACE the primary exception (Scala semantics: a throw in
    * finally discards the in-flight one). Logs the leak loudly instead.
    */
  private[graft] def deletePathQuietly(p: java.nio.file.Path, what: String): Unit =
    try deletePath(p)
    catch {
      case e: Throwable =>
        System.err.println(s"[graft] $what cleanup failed (leaked $p, NON-masking): $e")
    }

  /** Oracle twin: the appended counts from source cardinality. */
  def loadFromRepoSql: String =
    """SELECT 'hub_customer' AS object, CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_new
      |FROM customer WHERE c_custkey % 5 = 0
      |UNION ALL
      |SELECT 'sat_customer' AS object, CAST(count(*) AS BIGINT) AS n_new
      |FROM (SELECT DISTINCT c_custkey, c_nationkey, c_mktsegment
      |      FROM customer WHERE c_custkey % 5 = 0) t
      |ORDER BY object""".stripMargin
}
