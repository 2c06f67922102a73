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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(repoDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$repoDir/ivf_meta.json"),
      s"""{"table_prefix": "$tablePrefix", "buckets": $buckets}""")
    cents.toDF("cell", "q").coalesce(1)
      .write.mode("overwrite").parquet(s"$repoDir/$CentObj")
  }

  def bucketing(s: SparkSession, repoDir: String): DvLoader.Bucketing = {
    val row = s.read.option("multiLine", true).json(s"$repoDir/ivf_meta.json").collect()(0)
    DvLoader.Bucketing(row.getAs[String]("table_prefix"), row.getAs[Long]("buckets").toInt)
  }

  /** The stored-trained quantizer, read back in the exact literal form the
    * assignment kernel takes (K-scale collect — the coarse codebook is
    * metadata, never corpus).
    */
  def centroids(s: SparkSession, repoDir: String): Seq[(Long, Seq[Long])] =
    s.read.parquet(s"$repoDir/$CentObj").orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Long]](1).toSeq)).toSeq

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
    val assigned = Similarity.assignCells(
        Similarity.withQuantized(vecs.select(col("vec_id"), col("embedding"))),
        centroids(s, repoDir))
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
