package graft.dv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vault-disciplined persistent home for the incremental IVF index (r12
  * verdict #5). Before r13, `ann_ivf_incr`/`stream_ivf_incr` appended to a
  * caller-supplied plain-parquet indexPath — no shared spec, no layout
  * discipline, no compaction story. This repo gives the index the same
  * treatment as a bucketed vault object:
  *
  *  - `ivf_centroids` — the stored-trained coarse quantizer, K × Dim exact
  *    integer rows. Metadata-scale, stored as plain parquet (bucketing a
  *    K-row object buys nothing); refreshed wholesale on retrain.
  *  - `ivf_index` — the cell-assignment index (vec_id, cell, load_ts),
  *    BUCKETED BY vec_id and read AND appended ONLY through the session
  *    catalog ([[DvLoader.storedObject]]/[[DvLoader.appendObject]] — the
  *    CLAUDE.md vault invariant: plain parquet appends would corrupt the
  *    bucket layout), so the exactly-once anti-join carries the bucket
  *    spec on its stored side and needs no Exchange there.
  *  - `ivf_meta.json` — (table_prefix, buckets), pinned at init so every
  *    batch and streaming session resolves the SAME bucket spec (the
  *    dv_schema.json discipline applied to the index).
  *
  * Batch loads ([[appendBatch]]) and the streaming maintainer
  * (`Streams.ivfIncrRepoSink`) maintain THE SAME index through these
  * entry points, and [[compact]] (= [[DvMaintenance.compactBucketedObject]],
  * the vault stage-and-swap rewrite with its crash-safety ladder) rewrites
  * it to one file per bucket after N incremental loads. Reference
  * analogue: the bgw refresh loop's incremental discipline
  * (extension/src/controller/dv_loader.rs:5-66) applied to an ANN index
  * instead of a vault object.
  */
object IvfIndexRepo {

  val IndexObj = "ivf_index"
  val CentObj = "ivf_centroids"
  /** The exactly-once key: bucketing follows the anti-join key, exactly
    * like the vault loaders' hash keys.
    */
  val Keys: Seq[String] = Seq("vec_id")

  def init(s: SparkSession, repoDir: String, cents: Seq[(Long, Seq[Long])],
           tablePrefix: String, buckets: Int = 8): Unit = {
    import s.implicits._
    // meta IO through the session's Hadoop FS (r15 ADVICE — the SinkRepo
    // fix applied to the pre-existing pattern here): java.nio only worked
    // for local repo URIs while the data layer handles any filesystem
    val mp = new org.apache.hadoop.fs.Path(s"$repoDir/ivf_meta.json")
    val fs = mp.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(repoDir))
    scala.util.Using.resource(fs.create(mp, true)) { out =>
      out.write(s"""{"table_prefix": "$tablePrefix", "buckets": $buckets}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    cents.toDF("cell", "q").coalesce(1)
      .write.mode("overwrite").parquet(s"$repoDir/$CentObj")
  }

  def bucketing(s: SparkSession, repoDir: String): DvLoader.Bucketing = {
    // driver-side parse (r14): the meta file is two fields of graft-authored
    // JSON ([[init]] writes it) — reading it through spark.read.json cost a
    // schema-inference Spark job on EVERY repo call (append, stored read,
    // rewrite, compaction: ~4 jobs per retrain lifecycle, one per streaming
    // micro-batch). Metadata must never cost a cluster job.
    val mp = new org.apache.hadoop.fs.Path(s"$repoDir/ivf_meta.json")
    val fs = mp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val txt = scala.util.Using.resource(fs.open(mp)) { in =>
      new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    }
    def field(k: String): String =
      s""""$k"\\s*:\\s*"?([^",}]+)"?""".r.findFirstMatchIn(txt)
        .map(_.group(1)).getOrElse(sys.error(s"ivf_meta.json at $repoDir lacks $k"))
    DvLoader.Bucketing(field("table_prefix"), field("buckets").trim.toInt)
  }

  /** The stored-trained quantizer, read back in the exact literal form the
    * assignment kernel takes (K-scale collect — the coarse codebook is
    * metadata, never corpus). Self-heals a crash between
    * [[swapCentroids]]' two renames (live missing, aside present →
    * restore) before reading — the DvMaintenance recovery-first ladder.
    */
  def centroids(s: SparkSession, repoDir: String): Seq[(Long, Seq[Long])] = {
    val live = java.nio.file.Paths.get(s"$repoDir/$CentObj")
    val aside = java.nio.file.Paths.get(s"$repoDir/${CentObj}__old")
    if (!java.nio.file.Files.exists(live) && java.nio.file.Files.exists(aside))
      java.nio.file.Files.move(aside, live)
    s.read.parquet(live.toString).orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Long]](1).toSeq)).toSeq
  }

  /** Crash-safe wholesale refresh of the K-scale `ivf_centroids` object —
    * the stage-and-swap ladder (stage beside, move live aside, move stage
    * in, drop the aside copy) under the object's writer lease. Metadata
    * scale, so the object stays plain parquet; the ladder is what makes a
    * retrain crash at any point recoverable by re-running (or by the next
    * [[centroids]] read, which restores a set-aside copy first).
    */
  def swapCentroids(s: SparkSession, repoDir: String, cents: Seq[(Long, Seq[Long])]): Unit =
    DvMaintenance.withLease(repoDir, CentObj, "retrain") {
      import s.implicits._
      import java.nio.file.{Files, Paths}
      val live = Paths.get(s"$repoDir/$CentObj")
      val stage = Paths.get(s"$repoDir/${CentObj}__stage")
      val aside = Paths.get(s"$repoDir/${CentObj}__old")
      // recovery first (the DvMaintenance ladder): a crash between the two
      // renames left the only copy set aside — restore before any cleanup
      if (!Files.exists(live) && Files.exists(aside)) Files.move(aside, live)
      DvLoader.deletePath(stage)
      DvLoader.deletePath(aside)
      cents.toDF("cell", "q").coalesce(1).write.mode("overwrite").parquet(stage.toString)
      Files.move(live, aside)
      Files.move(stage, live)
      DvLoader.deletePathQuietly(aside, "centroid swap aside copy")
    }

  /** Close the drift loop (r13 verdict #1 — the retrain half the trigger
    * lacked): deterministic Lloyd retrain over `vecs` — the STORED +
    * ARRIVED corpus; the caller owns the corpus frame because the index
    * stores assignments, not embeddings — then [[swapCentroids]] and a
    * stage-and-swap rewrite of the assignment index against the new
    * quantizer (every indexed vec_id re-derived; load_ts lineage kept).
    * Both swaps ride the crash ladder + writer lease, and because the
    * per-batch centroid read seam re-reads the repo ([[centroids]]), a
    * RUNNING streaming maintainer picks the new quantizer up on its next
    * micro-batch without restart (pinned in StreamingSpec). The Lloyd
    * kernel is a deterministic function of (corpus, seed), and the seed
    * is the K lowest vec_ids of the corpus — so a retrain over
    * stored+arrived is BIT-IDENTICAL to the train-from-scratch index over
    * the same corpus, which is exactly the oracle `ann_ivf_retrain`
    * hash-checks. Reference analogue: the bgw refresh loop re-running its
    * pipeline when inputs change (extension/src/controller/dv_loader.rs:5-66).
    * Returns the retrained K.
    */
  def retrainIvf(s: SparkSession, repoDir: String, vecs: DataFrame): Int = {
    import graft.queries.Similarity
    // The lifecycle makes IvfIters + 2 full passes over the quantized
    // corpus (training rounds, the reassignment rewrite, the drift
    // baseline). Reuse a caller-supplied `q` column when present (the
    // registered op passes the session-memoized qVecs cache — guide §1.2:
    // don't recompute what a sibling pass materialized); otherwise
    // quantize once and persist the NARROW (vec_id, q) projection for the
    // duration (guide §5: cache exactly the reused frame), dropping it
    // before returning. Quantization is the shared qExpr either way, so
    // assignments stay bit-identical.
    val (q, ephemeral) =
      if (vecs.columns.contains("q")) (vecs.select(col("vec_id"), col("q")), None)
      else {
        val p = Similarity.withQuantized(vecs.select(col("vec_id"), col("embedding")))
          .select(col("vec_id"), col("q"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (p, Some(p))
      }
    try {
      val newCents = Similarity.trainCentroidsFrom(q)
      swapCentroids(s, repoDir, newCents)
      DvMaintenance.rewriteBucketedObject(s, repoDir, IndexObj, Keys, bucketing(s, repoDir),
        stored => reassignFrame(stored, q, newCents))
      // refresh the stored-side drift baseline to the NEW quantizer
      // (index-scale: cells × Dim rows) so a running maintainer's drift
      // evidence tracks the retrained generation (Streams.ivfIncrRepoSink
      // prefers this over its caller-supplied fallback). A crash here
      // leaves the baseline missing/stale; re-running the retrain repairs
      // it like every other step of the ladder.
      Similarity.ivfDimAgg(q, newCents, "s_d", "n_s")
        .write.mode("overwrite").parquet(s"$repoDir/$StoredAggObj")
      newCents.size
    } finally ephemeral.foreach(_.unpersist())
  }

  /** The retrain assignment-rewrite frame (every indexed vec_id
    * re-derived against the new quantizer; load_ts lineage kept) —
    * package-visible so the retrain-loop spec sweeps the exact frame the
    * bucketed rewrite writes (scan-local argmax + one vec_id equi-join;
    * never cartesian/BNLJ).
    */
  private[graft] def reassignFrame(stored: DataFrame, q: DataFrame,
                                   cents: Seq[(Long, Seq[Long])]): DataFrame =
    stored.select(col("vec_id"), col("load_ts"))
      .join(graft.queries.Similarity.assignCells(q, cents), Seq("vec_id"))
      .select(col("vec_id"), col("cell"), col("load_ts"))

  /** The stored-side (cell, pos) drift baseline's repo home — written by
    * [[retrainIvf]], preferred by the streaming maintainer when present.
    */
  val StoredAggObj = "ivf_stored_agg"

  def storedAgg(s: SparkSession, repoDir: String): Option[DataFrame] =
    if (DvLoader.pathExists(s, s"$repoDir/$StoredAggObj"))
      Some(s.read.parquet(s"$repoDir/$StoredAggObj"))
    else None

  /** The maintenance DECISION (drift evidence → action): retrain iff the
    * drift report flags any cell (`retrain_flag` — orphaned cell or mean
    * displacement past the measured trigger), then append one recall row
    * per maintenance event (r13 verdict #7 — retrain decisions carry
    * recall evidence, not just drift micro-units: the constant-query
    * probe is cheap by construction). Returns whether a retrain ran.
    */
  def maintainIfDrifted(s: SparkSession, repoDir: String, drift: DataFrame,
                        corpus: DataFrame, eventTs: String,
                        logRecall: Boolean = true): Boolean = {
    // index-scale: the drift report is one row per cell
    val fired = drift.filter(col("retrain_flag") === 1L).limit(1).count() > 0
    if (fired) retrainIvf(s, repoDir, corpus)
    if (logRecall)
      appendRecall(s, repoDir, corpus, eventTs, if (fired) "retrain" else "append")
    fired
  }

  /** One recall row against the LIVE repo index (probe through the stored
    * centroids + stored assignments, scored on the exact brute-force
    * ground truth over the same corpus — the knn_recall_report
    * discipline), appended to `<repoDir>/recall_log` stamped with the
    * maintenance event that triggered it.
    */
  def appendRecall(s: SparkSession, repoDir: String, corpus: DataFrame,
                   eventTs: String, event: String): Unit =
    graft.queries.Similarity.repoIvfRecall(s, repoDir, corpus)
      .withColumn("event", lit(event))
      .withColumn("event_ts", lit(eventTs))
      .write.mode("append").parquet(s"$repoDir/recall_log")

  /** The index through the session catalog — carries the bucket spec. */
  def storedIndex(s: SparkSession, repoDir: String): DataFrame =
    DvLoader.storedObject(s, repoDir, IndexObj, Keys, bucketing(s, repoDir))

  /** The micro-batch append PLAN (see [[Streams.hubLoadPlan]]'s twin
    * discipline): distinct arriving vec_ids anti-joined against the
    * stored index read THROUGH the catalog — exposed so
    * StreamPlanSweepSpec sweeps the exact frame [[appendAssigned]]
    * writes (the stored side carries the bucket spec, so the LeftAnti
    * needs no Exchange there).
    */
  def appendPlan(s: SparkSession, repoDir: String, assigned: DataFrame): DataFrame = {
    val deduped = assigned.dropDuplicates("vec_id")
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$repoDir/$IndexObj")))
      deduped.join(storedIndex(s, repoDir).select("vec_id"), Keys, "left_anti")
    else deduped
  }

  /** Append only never-seen vec_ids from an assigned frame
    * (vec_id, cell, load_ts) — the hubLoadPlan anti-join discipline with
    * the bucketed catalog on BOTH sides. Returns rows appended.
    */
  def appendAssigned(s: SparkSession, repoDir: String, assigned: DataFrame): Long = {
    val obs = org.apache.spark.sql.Observation(s"ivf_append_${System.nanoTime()}")
    DvLoader.appendObject(s, repoDir, IndexObj, Keys, bucketing(s, repoDir),
      appendPlan(s, repoDir, assigned).observe(obs, count(lit(1)).as("n")))
    obs.get("n").asInstanceOf[Long]
  }

  /** Batch face: assign a vector batch to the repo's stored centroids
    * (scan-local literal argmax — no retrain) and append exactly-once.
    */
  def appendBatch(s: SparkSession, repoDir: String, vecs: DataFrame,
                  loadTs: String): Long = {
    import graft.queries.Similarity
    // reuse a pre-quantized `q` column when the caller has one (the
    // registered retrain op passes the session-memoized qVecs cache);
    // the quantization expression is identical either way
    val qf =
      if (vecs.columns.contains("q")) vecs.select(col("vec_id"), col("q"))
      else Similarity.withQuantized(vecs.select(col("vec_id"), col("embedding")))
    val assigned = Similarity.assignCells(qf, centroids(s, repoDir))
      .select(col("vec_id"), col("cell"), lit(loadTs).as("load_ts"))
    appendAssigned(s, repoDir, assigned)
  }

  /** One-file-per-bucket rewrite — the vault compaction (stage-and-swap,
    * crash-safe) applied to the index object.
    */
  def compact(s: SparkSession, repoDir: String): (Long, Long) =
    DvMaintenance.compactBucketedObject(s, repoDir, IndexObj, Keys,
      bucketing(s, repoDir))
}
