package graft

import graft.dv.{DvGo, DvLoader}
import graft.streaming.Streams
import graft.streaming.Streams.Ev
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Crash-recovery proof for the foreachBatch vault sinks (round-6 verdict
  * item 6). The sinks claim exactly-once THROUGH a restart because their
  * appends are anti-joined: a micro-batch redelivered after a crash
  * between the sink write and the checkpoint commit finds its rows
  * already stored and appends nothing.
  *
  * The crash window is simulated EXACTLY, not by hand-calling the batch
  * function twice: after the first run commits, the newest
  * `ckpt/commits/<n>` marker is deleted — the state a real crash leaves
  * when the sink write landed but the commit never did. On restart from
  * the same checkpoint, Structured Streaming reconstructs batch <n> from
  * `offsets/<n>` and RE-EXECUTES the foreachBatch with the same rows (a
  * true redelivery through the engine), then processes the new files. One
  * test per sink family: hub, sat, link, and the schema-driven bucketed
  * repo load.
  */
class CrashRecoverySpec extends SparkSpec {

  private def day(d: Int, h: Int = 0): Long =
    1704067200000L + d * 86400000L + h * 3600000L

  /** The crash itself: remove the newest commit marker (and its hidden
    * Hadoop .crc sidecar, or the local checksum fs blocks the re-commit's
    * rename) — exactly the checkpoint state a crash after the sink write
    * but before the commit leaves behind.
    */
  private def dropLastCommit(dir: String): Unit = {
    val commitsDir = new java.io.File(s"$dir/ckpt/commits")
    val commits = commitsDir.listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty, "no committed batch to crash")
    val last = commits.last
    assert(last.delete(), "could not remove the commit marker")
    val crc = new java.io.File(commitsDir, s".${last.getName}.crc")
    if (crc.exists()) assert(crc.delete(), "could not remove the commit crc")
  }

  /** Run sliceA through the sink, crash (delete the newest commit
    * marker), drop sliceB into the source, restart the SAME checkpoint.
    */
  private def crashThenResume(dir: String,
                              mkSink: DataFrame => org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row],
                              sliceA: Seq[Ev], sliceB: Seq[Ev]): Unit = {
    import spark.implicits._
    val src = s"$dir/src"
    val schema = sliceA.toDF().schema
    sliceA.toDF().write.mode("append").parquet(src)
    val q1 = mkSink(spark.readStream.schema(schema).parquet(src)).start()
    q1.processAllAvailable(); q1.stop(); q1.awaitTermination()
    dropLastCommit(dir)
    sliceB.toDF().write.mode("append").parquet(src)
    val q2 = mkSink(spark.readStream.schema(schema).parquet(src)).start()
    q2.processAllAvailable(); q2.stop()
  }

  // Slices overlap on purpose: user 2's click appears in BOTH slices, so a
  // broken anti-join would double-insert it even without the crash; the
  // crash redelivery then replays ALL of slice A on top.
  private val sliceA = Seq(
    Ev(1, day(0, 1), 1, "click", 1.0), Ev(2, day(0, 2), 2, "click", 2.0),
    Ev(3, day(0, 3), 2, "view", 0.5))
  private val sliceB = Seq(
    Ev(4, day(1, 1), 2, "click", 3.0), Ev(5, day(1, 2), 3, "buy", 9.0))

  test("hub sink: exactly-once across a crash between sink write and checkpoint commit") {
    val dir = Files.createTempDirectory("g7_crash_hub").toString
    try {
      crashThenResume(dir,
        st => Streams.hubLoadSink(st, "user_id", s"$dir/hub", s"$dir/ckpt"),
        sliceA, sliceB)
      val hub = graft.dv.SinkRepo.read(spark, s"$dir/hub")
      // batch twin: one row per distinct user across both slices
      assert(hub.count() == 3, s"hub rows: ${hub.collect().mkString(", ")}")
      assert(hub.select("hub_hk").distinct().count() == 3, "duplicate hub keys after redelivery")
      assert(hub.select("bk").collect().map(_.getString(0)).sorted.toSeq == Seq("1", "2", "3"))
    } finally DvLoader.deletePath(Paths.get(dir))
  }

  test("sat sink: exactly-once across a crash between sink write and checkpoint commit") {
    val dir = Files.createTempDirectory("g7_crash_sat").toString
    try {
      crashThenResume(dir,
        st => Streams.satLoadSink(st, "user_id", Seq("event_type"), s"$dir/sat", s"$dir/ckpt"),
        sliceA, sliceB)
      val sat = graft.dv.SinkRepo.read(spark, s"$dir/sat")
      // batch twin: one version per distinct (user, event_type):
      // (1,click) (2,click) (2,view) (3,buy) — 2's click re-arrival in
      // slice B and the whole replayed slice A must both be no-ops
      assert(sat.count() == 4, s"sat rows: ${sat.collect().mkString(", ")}")
      assert(sat.select("hub_hk", "sat_hd").distinct().count() == 4,
        "duplicate (hk, hd) versions after redelivery")
    } finally DvLoader.deletePath(Paths.get(dir))
  }

  test("link sink: exactly-once across a crash between sink write and checkpoint commit") {
    val dir = Files.createTempDirectory("g7_crash_link").toString
    try {
      crashThenResume(dir,
        st => Streams.linkLoadSink(st, Seq("user_id", "event_type"), s"$dir/link", s"$dir/ckpt"),
        sliceA, sliceB)
      val link = graft.dv.SinkRepo.read(spark, s"$dir/link")
      assert(link.count() == 4, s"link rows: ${link.collect().mkString(", ")}")
      assert(link.select("link_hk").distinct().count() == 4,
        "duplicate link keys after redelivery")
    } finally DvLoader.deletePath(Paths.get(dir))
  }

  test("schema-driven bucketed repo load: exactly-once across a crash + restart") {
    import spark.implicits._
    val repo = Files.createTempDirectory("g7_crash_repo").toString
    val dir = Files.createTempDirectory("g7_crash_sch").toString
    val scope = Set("hub_customer")
    DvGo.go(spark, sfDir, repo, include = scope, bucketed = true, buckets = 4)
    val prefix = DvLoader.readSchema(spark, repo).bucketing.get.tablePrefix
    try {
      val cust = Tables.load(spark, sfDir, "customer")
      val base = spark.table(s"${prefix}hub_customer").count()
      val nKeys = cust.select("c_custkey").distinct().count()
      val src = s"$dir/src"
      // slice A: every customer shifted +1M; slice B: shifted +2M
      cust.withColumn("c_custkey", col("c_custkey") + 1000000L)
        .write.mode("append").parquet(src)
      // the batch-id log proves the REDELIVERY actually happened through
      // the engine: after the crash, the restarted query must re-execute
      // the uncommitted batch id before processing the new files
      val seenBatches = scala.collection.mutable.ArrayBuffer.empty[Long]
      def sink(st: DataFrame) = st.writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (b: DataFrame, id: Long) =>
          seenBatches.synchronized { seenBatches += id }
          DvLoader.streamTableLoadBatch(spark, b, "customer", repo, s"batch_$id")
        }
      val schema = cust.schema
      val q1 = sink(spark.readStream.schema(schema).parquet(src)).start()
      q1.processAllAvailable(); q1.stop()
      assert(spark.table(s"${prefix}hub_customer").count() == base + nKeys)
      // crash window, then slice B arrives, then restart from the checkpoint
      dropLastCommit(dir)
      cust.withColumn("c_custkey", col("c_custkey") + 2000000L)
        .write.mode("append").parquet(src)
      val q2 = sink(spark.readStream.schema(schema).parquet(src)).start()
      q2.processAllAvailable(); q2.stop()
      // the engine really replayed the crashed batch id before the new one
      val ids = seenBatches.synchronized(seenBatches.toList)
      assert(ids.count(_ == ids.head) >= 2,
        s"uncommitted batch was not redelivered on restart: $ids")
      // the redelivered +1M batch appends nothing; the +2M batch lands once
      val finalCount = spark.table(s"${prefix}hub_customer").count()
      assert(finalCount == base + 2 * nKeys,
        s"expected ${base + 2 * nKeys} rows after crash+resume, got $finalCount")
      assert(spark.table(s"${prefix}hub_customer")
        .groupBy("hub_customer_hk").count().filter(col("count") > 1).count() == 0,
        "duplicate hub keys in the bucketed repo after redelivery")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}hub_customer")
      DvLoader.deletePath(Paths.get(repo))
      DvLoader.deletePath(Paths.get(dir))
    }
  }
}
