package graft.dv

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-catalog home for a streaming sink's exactly-once stored side —
  * the IvfIndexRepo discipline generalized to the pair/window sinks (r13
  * verdict #2): `nearDupSinkPlan`, `semanticProdSinkPlan` and
  * `packSinkPlan` used to re-read a PLAIN-parquet stored side per
  * micro-batch — an unbucketed anti-join right side at corpus-pair scale,
  * reshuffled on every batch, forever. Here the stored rows live as ONE
  * bucketed object keyed by the sink's anti-join keys, read AND appended
  * only through the session catalog ([[DvLoader.storedObject]] /
  * [[DvLoader.appendObject]] — the CLAUDE.md vault invariant: plain
  * parquet appends would corrupt the bucket layout), so the anti-join's
  * stored side carries its bucket spec and needs no Exchange.
  * `sink_meta.json` pins (table_prefix, buckets) exactly like
  * `ivf_meta.json` / dv_schema.json's bucketing block, so any session
  * resolves the same spec; compaction is the ordinary
  * [[DvMaintenance.compactBucketedObject]] stage-and-swap, and the
  * per-object writer lease covers appends like every vault object.
  *
  * Single writer per sink dir: the sink's foreachBatch hook IS the
  * single-writer window (the ContinuousPipeline contract); the lease makes
  * a violation fail loudly instead of corrupting.
  */
object SinkRepo {

  /** The one stored object per sink repo. */
  val Obj = "rows"

  // Meta IO through the session's Hadoop FS (r15 ADVICE: java.nio worked
  // for local paths only, while the data layer underneath already handles
  // any supported filesystem URI — a sink on hdfs://s3 would have failed
  // at the META read, the confusing place).
  private def metaHPath(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/sink_meta.json")

  private def hfs(s: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Unique, rebuild-stable catalog prefix per sink dir (the
    * DvGo.tablePrefix derivation): normalized-path hash, so two sinks in
    * different dirs never collide and a re-opened sink reuses its entry.
    */
  private def tablePrefix(dir: String): String = {
    val canonical = java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString
    "graft_sink_" + java.util.UUID.nameUUIDFromBytes(canonical.getBytes).toString
      .replace("-", "").take(12) + "_"
  }

  /** The sink's bucket spec, creating the meta on first call. Idempotent;
    * `buckets` only applies to the creating call (later calls read the
    * pinned spec — the dv_schema.json discipline).
    *
    * Guards (r15 ADVICE): a dir that already holds top-level part-* files
    * but no sink_meta.json is a PRE-SinkRepo plain-parquet sink — its rows
    * live outside `rows/`, so adopting it silently would make every stored
    * row invisible to the anti-join (a resumed checkpoint would re-append
    * previously flagged pairs). Fail loudly instead of violating
    * exactly-once. Meta creation is write-temp + rename: rename does not
    * overwrite, so two sessions racing a fresh sink both end up reading
    * ONE winner's spec instead of interleaving a partial write.
    */
  def ensure(s: SparkSession, dir: String, buckets: Int = 8): DvLoader.Bucketing = {
    val mp = metaHPath(dir)
    val fs = hfs(s, mp)
    if (!fs.exists(mp)) {
      val dirP = new org.apache.hadoop.fs.Path(dir)
      if (fs.exists(dirP)) {
        val legacy = fs.listStatus(dirP).exists(st =>
          st.isFile && st.getPath.getName.startsWith("part-"))
        require(!legacy,
          s"$dir holds top-level parquet files but no sink_meta.json — this is a " +
            "pre-SinkRepo plain-parquet sink; migrate its files into " +
            s"$dir/$Obj (and write a sink_meta.json) before reopening, or the " +
            "stored rows would be invisible to the exactly-once anti-join")
      }
      fs.mkdirs(dirP)
      val tmp = new org.apache.hadoop.fs.Path(dir,
        s".sink_meta.json.tmp_${java.util.UUID.randomUUID().toString.take(8)}")
      scala.util.Using.resource(fs.create(tmp, false)) { out =>
        out.write(s"""{"table_prefix": "${tablePrefix(dir)}", "buckets": $buckets}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      // rename refuses an existing destination: the loser of a creation
      // race cleans up its temp and reads the winner's pinned spec
      if (!fs.rename(tmp, mp)) fs.delete(tmp, false)
    }
    bucketing(s, dir).get
  }

  /** Driver-side meta parse (metadata never costs a cluster job). */
  def bucketing(s: SparkSession, dir: String): Option[DvLoader.Bucketing] = {
    val mp = metaHPath(dir)
    val fs = hfs(s, mp)
    if (!fs.exists(mp)) None
    else {
      val txt = scala.util.Using.resource(fs.open(mp)) { in =>
        new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      }
      def field(k: String): String =
        s""""$k"\\s*:\\s*"?([^",}]+)"?""".r.findFirstMatchIn(txt)
          .map(_.group(1)).getOrElse(sys.error(s"sink_meta.json at $dir lacks $k"))
      Some(DvLoader.Bucketing(field("table_prefix"), field("buckets").trim.toInt))
    }
  }

  /** True once the stored object has rows on disk (a fresh sink's first
    * micro-batch is a full insert — no stored side to anti-join).
    */
  def objExists(s: SparkSession, dir: String): Boolean =
    DvLoader.pathExists(s, s"$dir/$Obj")

  /** The stored side THROUGH the catalog — carries the bucket spec, so a
    * keyed anti-join needs no Exchange here.
    */
  def stored(s: SparkSession, dir: String, keys: Seq[String]): DataFrame =
    DvLoader.storedObject(s, dir, Obj, keys,
      bucketing(s, dir).getOrElse(sys.error(s"sink repo at $dir not initialized")))

  /** Exactly-once append face: `novel` must already be anti-joined (the
    * sink plan's job); this routes the write through the catalog under the
    * pinned spec + the per-object writer lease.
    */
  def append(s: SparkSession, dir: String, keys: Seq[String], novel: DataFrame): Unit =
    DvLoader.appendObject(s, dir, Obj, keys,
      bucketing(s, dir).getOrElse(sys.error(s"sink repo at $dir not initialized")), novel)

  /** Content face for consumers and parity checks (plain read — row
    * content only; loads that need the bucket spec use [[stored]]).
    */
  def read(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/$Obj")

  /** One-file-per-bucket rewrite — the vault compaction applied to the
    * sink's stored object (same crash ladder, same lease).
    */
  def compact(s: SparkSession, dir: String, keys: Seq[String]): (Long, Long) =
    DvMaintenance.compactBucketedObject(s, dir, Obj, keys,
      bucketing(s, dir).getOrElse(sys.error(s"sink repo at $dir not initialized")))
}
