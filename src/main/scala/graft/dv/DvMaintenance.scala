package graft.dv

import org.apache.spark.sql.SparkSession

/** Vault maintenance — the autovacuum/OPTIMIZE analogue graft must provide
  * itself (the reference's vault lives in Postgres tables, so compaction
  * comes for free from the database; a parquet vault does not get it).
  *
  * Insert-only incremental loading writes one file set per micro-batch:
  * after N loads every bucket of a vault object holds N small files, and
  * scan fan-in (open cost, footer reads, row-group fragmentation) degrades
  * even though the bucketed layout is still correct. Compaction rewrites
  * the object to exactly one file per bucket: the rewrite repartitions by
  * the bucket keys — Spark's repartition hash IS the bucket-id hash
  * (both are HashPartitioning over the same columns), so partition i
  * holds exactly bucket i and the bucketed writer emits one file per
  * bucket. That one co-partitioned exchange is the minimum any
  * defragmentation pays; every subsequent incremental load is
  * shuffle-free again.
  */
object DvMaintenance {

  // ------------------------------------------------------------------
  // Per-object repo writer lease (r13 verdict #3): the single-writer
  // window protecting compaction/purge/append used to be convention —
  // a second concurrent writer corrupted silently. Now it is structural:
  // every stage-and-swap rewrite and every bucketed append
  // checks-and-claims `<repoDir>/<obj>__lease` first, so an overlapping
  // writer FAILS LOUDLY instead of interleaving file moves.
  //
  // Claim protocol (atomic on any POSIX filesystem): write the holder's
  // token to a private temp file, then `Files.move(tmp, lease)` WITHOUT
  // REPLACE_EXISTING — exactly one mover wins; the loser reads the
  // token. A token registered in this JVM's live set is a real
  // concurrent writer → refuse. A token NOT in the live set is a stale
  // lease from a crashed writer → reclaimed automatically, so the
  // compaction crash ladder's "re-running repairs every interrupted
  // state" contract still holds (failure-injected in DvMaintenanceSpec).
  // Cross-JVM stale detection has no liveness oracle; a second DRIVER's
  // lease is treated as stale here — the multi-driver case needs an
  // external lock service, which this sandbox cannot model.
  private val liveLeases = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[graft] def leasePath(repoDir: String, obj: String): java.nio.file.Path =
    java.nio.file.Paths.get(s"$repoDir/${obj}__lease")

  private[graft] def claimLease(repoDir: String, obj: String, who: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption => _}
    val lease = leasePath(repoDir, obj)
    val token = s"$who@${java.util.UUID.randomUUID()}"
    liveLeases.add(token)
    val tmp = Paths.get(s"$repoDir/${obj}__lease.claim.${token.hashCode.toHexString}${System.nanoTime()}")
    Files.createDirectories(lease.getParent)
    Files.writeString(tmp, token)
    def tryMove(): Boolean =
      try { Files.move(tmp, lease); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    if (!tryMove()) {
      val holder = try Files.readString(lease) catch { case _: java.io.IOException => "" }
      if (liveLeases.contains(holder)) {
        liveLeases.remove(token)
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"repo writer lease on $obj is HELD by a live writer ($holder) — " +
            "a second concurrent compaction/purge/append on the same object " +
            "violates the single-writer window; serialize the writers")
      }
      // stale lease from a crashed writer: reclaim (the crash ladder's
      // re-run-repairs contract), but only the one observed holder —
      // losing a reclaim race to ANOTHER live claimer must still refuse
      Files.deleteIfExists(lease)
      if (!tryMove()) {
        liveLeases.remove(token)
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"repo writer lease on $obj was re-claimed concurrently while " +
            "reclaiming a stale lease — a live writer holds the object")
      }
    }
    token
  }

  private[graft] def releaseLease(repoDir: String, obj: String, token: String): Unit = {
    liveLeases.remove(token)
    java.nio.file.Files.deleteIfExists(leasePath(repoDir, obj))
  }

  /** Run `body` under the per-object writer lease. */
  private[graft] def withLease[A](repoDir: String, obj: String, who: String)(body: => A): A = {
    val token = claimLease(repoDir, obj, who)
    try body finally releaseLease(repoDir, obj, token)
  }

  /** Rewrite a bucketed vault object to one file per bucket. Returns the
    * (files_before, files_after) pair. PRECONDITION: single maintenance
    * writer per object, no concurrent loads during the swap (the same
    * single-writer window any table-rewriting OPTIMIZE needs).
    *
    * Crash safety (failure-injected in DvMaintenanceSpec): every crash
    * state an interrupted run can leave is repaired by simply calling
    * compactBucketed again —
    *  - crash after the stage write: retry pre-cleans the staging dir and
    *    catalog entry and re-stages;
    *  - crash BETWEEN the two swap renames (live object already moved to
    *    `<obj>__old`, compacted copy not yet moved in): retry RESTORES the
    *    set-aside copy before any cleanup. The restore must run first —
    *    the r7 pre-clean deleted `<obj>__old` unconditionally, which on
    *    this retry path would have destroyed the only surviving copy of
    *    the object;
    *  - crash after the swap, before the old-copy delete: retry discards
    *    the stale `<obj>__old` and recompacts the already-compacted
    *    object (idempotent).
    */
  def compactBucketed(s: SparkSession, repoDir: String, obj: String): (Long, Long) =
    rewriteBucketed(s, repoDir, obj, identity)

  /** [[compactBucketed]] for a NON-schema bucketed repo object (the IVF
    * index repo): same stage-and-swap rewrite and crash-safety ladder,
    * with the keys and bucket spec supplied by the object's own metadata
    * instead of dv_schema.json.
    */
  def compactBucketedObject(s: SparkSession, repoDir: String, obj: String,
                            keys: Seq[String], b: DvLoader.Bucketing): (Long, Long) =
    rewriteBucketedWith(s, repoDir, obj, keys, b, identity)

  /** The stage-and-swap rewrite with a caller transform, public for
    * maintenance operators that REPLACE a bucketed object's rows rather
    * than defragment them (IVF retrain re-deriving cell assignments,
    * streaming PIT state merge): same crash-safety ladder, same lease,
    * same one-file-per-bucket layout on the way out.
    */
  def rewriteBucketedObject(s: SparkSession, repoDir: String, obj: String,
                            keys: Seq[String], b: DvLoader.Bucketing,
                            transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): (Long, Long) =
    rewriteBucketedWith(s, repoDir, obj, keys, b, transform)

  /** Physical erasure for sensitive satellites (r11 verdict #8 — GDPR
    * right-to-erasure): rewrite `sat_*_sensitive` DROPPING every row whose
    * hash key appears in `victims` (one `hkCol` column, metadata-scale: one
    * row per erasure request), while PRESERVING the bucketed layout — the
    * same stage-and-swap rewrite as compaction, so the post-purge object
    * is also one file per bucket and subsequent incremental loads stay
    * shuffle-free. The vault's ordinary delete story stays LOGICAL
    * (`dv_sat_status`); THIS is the physical hop for data the law says
    * must not exist anymore — which is exactly why the reference splits
    * sensitive descriptors into their own satellite
    * (extension/src/model/dv_builder.rs:149-170): erasure rewrites only
    * the sensitive rows, never the hub skeleton or the non-sensitive
    * history.
    *
    * Guards: the object must be a `_sensitive` satellite (refuse to purge
    * structural objects), and ghost rows (record_source = SYSTEM) survive
    * unconditionally even if a victim hk collides with one. The victims
    * side is broadcast into an anti-join (erasure requests are
    * request-scale, never corpus-scale). Returns (rows_before,
    * rows_after). Crash safety: identical to compaction — every
    * interrupted state is repaired by re-running (same stage/swap/restore
    * discipline).
    */
  def purgeSensitive(s: SparkSession, repoDir: String, obj: String,
                     victims: org.apache.spark.sql.DataFrame,
                     hkCol: String): (Long, Long) = {
    import org.apache.spark.sql.functions.{broadcast, col, count, lit}
    require(obj.endsWith("_sensitive"),
      s"purgeSensitive: $obj is not a sensitive satellite — logical deletes (dv_sat_status) cover it")
    // the (before, after) counts ride the rewrite's own write pass as
    // observed metrics (r14, guide §1.2 step 1 "don't compute things you
    // throw away"): the previous shape re-read the whole object twice —
    // two extra passes that at 100 TB are real scans. Each branch is
    // observed exactly once: before = ghosts + purgeable, after =
    // survivors + ghosts (ghosts survive unconditionally).
    val obsG = org.apache.spark.sql.Observation(s"purge_g_${System.nanoTime()}")
    val obsP = org.apache.spark.sql.Observation(s"purge_p_${System.nanoTime()}")
    val obsS = org.apache.spark.sql.Observation(s"purge_s_${System.nanoTime()}")
    rewriteBucketed(s, repoDir, obj, df => {
      val ghosts = df.filter(col("record_source") === lit(DvDefaults.GhostSource))
        .observe(obsG, count(lit(1)).as("n"))
      val purgeable = df.filter(col("record_source") =!= lit(DvDefaults.GhostSource))
        .observe(obsP, count(lit(1)).as("n"))
      purgeable.join(broadcast(victims.select(col(hkCol)).distinct()), Seq(hkCol), "left_anti")
        .observe(obsS, count(lit(1)).as("n"))
        .unionByName(ghosts)
    })
    val (g, p, surv) = (obsG.get("n").asInstanceOf[Long],
      obsP.get("n").asInstanceOf[Long], obsS.get("n").asInstanceOf[Long])
    (g + p, surv + g)
  }

  private def rewriteBucketed(s: SparkSession, repoDir: String, obj: String,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): (Long, Long) = {
    val schema = DvLoader.readSchema(s, repoDir)
    val b = schema.bucketing.getOrElse(
      sys.error(s"compactBucketed: repo at $repoDir is not bucketed"))
    rewriteBucketedWith(s, repoDir, obj, DvLoader.schemaKeys(schema, obj), b, transform)
  }

  private def rewriteBucketedWith(s: SparkSession, repoDir: String, obj: String,
      keys: Seq[String], b: DvLoader.Bucketing,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): (Long, Long) =
    withLease(repoDir, obj, "rewrite") {
      rewriteBucketedLeased(s, repoDir, obj, keys, b, transform)
    }

  private def rewriteBucketedLeased(s: SparkSession, repoDir: String, obj: String,
      keys: Seq[String], b: DvLoader.Bucketing,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): (Long, Long) = {
    val table = s"${b.tablePrefix}$obj"
    val objPath = java.nio.file.Paths.get(s"$repoDir/$obj")
    val stagePath = java.nio.file.Paths.get(s"$repoDir/${obj}__compact")
    val asidePath = java.nio.file.Paths.get(s"$repoDir/${obj}__old")
    // mid-swap crash recovery — BEFORE the debris cleanup and BEFORE any
    // catalog registration against the (possibly missing) live path
    if (!java.nio.file.Files.exists(objPath) && java.nio.file.Files.exists(asidePath))
      java.nio.file.Files.move(asidePath, objPath)
    if (!s.catalog.tableExists(table))
      DvLoader.registerBucketed(s, repoDir, obj, keys, b)
    def dataFiles(p: java.nio.file.Path): Long = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { w =>
        w.iterator().asScala.count(f => f.getFileName.toString.startsWith("part-")).toLong
      }
    }
    val staging = s"${table}__compact"
    // pre-clean debris from a crashed earlier run — a retry must not fail
    // on a non-empty staging location or a stale set-aside copy (the
    // set-aside copy is stale HERE because the restore above already ran:
    // if it still exists, the live object does too)
    s.sql(s"DROP TABLE IF EXISTS $staging")
    DvLoader.deletePath(stagePath)
    DvLoader.deletePath(asidePath)
    val before = dataFiles(objPath)
    // partition i == bucket i under repartition-by-keys (repartition and
    // the bucketed writer share the same HashPartitioning), so the writer
    // emits one file per bucket. The rewrite reads the PLAIN parquet path,
    // not the catalog table: a bucketed-table read of an appended object
    // advertises hash partitioning while actually splitting buckets per
    // append file set, which lets the optimizer elide the repartition and
    // defeats the consolidation. Stage beside the object, then swap.
    transform(s.read.parquet(objPath.toString))
      .repartition(b.buckets, keys.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(b.buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", stagePath.toString)
      .saveAsTable(staging)
    // swap: drop both catalog entries (external — files stay), rename the
    // live object aside, move the compacted directory in, then delete the
    // old copy and re-register. The table name never changes, only its
    // files; the old data survives on disk until the new copy is in place.
    s.sql(s"DROP TABLE IF EXISTS $staging")
    s.sql(s"DROP TABLE IF EXISTS $table")
    java.nio.file.Files.move(objPath, asidePath)
    java.nio.file.Files.move(stagePath, objPath)
    // re-register FIRST: the aside copy is garbage once the compacted files
    // are in place, and a failed garbage delete must not leave the table
    // dropped (the pre-clean above removes a surviving aside on retry)
    DvLoader.registerBucketed(s, repoDir, obj, keys, b)
    DvLoader.deletePathQuietly(asidePath, s"compaction aside copy for $table")
    (before, dataFiles(objPath))
  }
}
