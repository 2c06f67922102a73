package graft

import java.nio.file.Files

import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQueryException}

/** The streaming state-store upgrade drill (round-7 verdict item 8):
  * DEPLOYMENT.md's stateful-op upgrade rule says a changed state case
  * class cannot restore an old checkpoint and prescribes checkpoint
  * reset + log replay. This spec PROVES all three sides of that rule on
  * `stream_computed_sat`:
  *
  *  1. restoring a live checkpoint under an upgraded state class (an
  *     appended Option field — the gentlest possible change) fails
  *     LOUDLY at the state-schema check, it never restores garbage;
  *  2. the failure is non-destructive: the ORIGINAL class resumes the
  *     same checkpoint and finishes the log with batch-twin parity;
  *  3. the prescribed migration — reset + full replay under the new
  *     class — converges to the batch twin with the new field filled.
  */
object StreamUpgradeSpec {
  // ---- the "upgraded" operator's types: BvState + first_order_ms ----
  // (top-level so Spark can derive encoders without an outer scope)
  final case class BvStateV2(order_cnt: Long, total_cents: Long,
                             last_order_ms: Long, first_order_ms: Option[Long])
  final case class BvVersionV2(o_custkey: Long, order_cnt: Long, total_cents: Long,
                               last_order_ms: Long, first_order_ms: Option[Long], hd: String)
}

class StreamUpgradeSpec extends SparkSpec {
  import StreamUpgradeSpec._

  private def computedSatStreamV2(orders: DataFrame): Dataset[BvVersionV2] = {
    import orders.sparkSession.implicits._
    orders.as[Streams.OrderEv]
      .groupByKey(_.o_custkey)
      .flatMapGroupsWithState[BvStateV2, BvVersionV2](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (ck, evs, state: GroupState[BvStateV2]) =>
          var st = state.getOption.getOrElse(BvStateV2(0L, 0L, Long.MinValue, None))
          val sorted = evs.toSeq.sortBy(e => (e.order_ms, e.o_orderkey))
          val out = sorted.map { e =>
            st = BvStateV2(st.order_cnt + 1L, st.total_cents + e.total_cents,
              math.max(st.last_order_ms, e.order_ms),
              Some(st.first_order_ms.fold(e.order_ms)(math.min(_, e.order_ms))))
            // hd stays the V1 recipe — the upgrade adds an attribute, it
            // must not rewrite history's hash-diffs
            val hd = java.security.MessageDigest.getInstance("SHA-256")
              .digest(s"${st.order_cnt},${st.total_cents},${st.last_order_ms}"
                .getBytes("UTF-8")).map(b => f"$b%02x").mkString
            BvVersionV2(ck, st.order_cnt, st.total_cents, st.last_order_ms,
              st.first_order_ms, hd)
          }
          state.update(st)
          out.iterator
      }
  }

  private def orderLog(): Array[Streams.OrderEv] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long").as("total_cents"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms"))
      .as[Streams.OrderEv].collect().sortBy(e => (e.order_ms, e.o_orderkey))
  }

  private def batchTwin(): Map[String, (Long, Long, Long, String)] =
    SparkEntry.queries("dv_computed_sat")(spark, sfDir).collect()
      .map(r => r.getAs[String]("hub_customer_hk") ->
        (r.getAs[Long]("order_cnt"), r.getAs[Long]("total_cents"),
          r.getAs[Long]("last_order_ms"), r.getAs[String]("sat_customer_bv_hd"))).toMap

  private val sha = (s: String) => java.security.MessageDigest.getInstance("SHA-256")
    .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("upgraded state class cannot restore a live checkpoint; old class resumes it to parity") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_upgrade").toString
    val src = s"$tmp/incoming"; val ckpt = s"$tmp/ckpt"
    val outV1 = s"$tmp/out_v1"; val outV2 = s"$tmp/out_v2"
    val ords = orderLog()
    val (b1, b2) = ords.splitAt(ords.length / 2)
    b1.toSeq.toDS().write.mode("append").parquet(src)
    def fileStream = spark.readStream
      .schema(b1.toSeq.toDS().schema).parquet(src)

    // phase 1: pre-upgrade stream consumes slice A against the checkpoint
    // (foreachBatch parquet sink — the recoverable-sink shape the vault
    // loaders use; memory sinks cannot restore a checkpoint at all)
    val q1 = Streams.computedSatStream(fileStream).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: Dataset[Streams.BvVersion], _: Long) =>
        b.write.mode("append").parquet(outV1))
      .outputMode("append").start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(outV1).count() == b1.length)

    // slice B lands while the operator is being "upgraded"
    b2.toSeq.toDS().write.mode("append").parquet(src)

    // phase 2: the upgraded class against the SAME checkpoint — the
    // state-schema check must reject the restore loudly
    val q2 = computedSatStreamV2(fileStream).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: Dataset[BvVersionV2], _: Long) =>
        b.write.mode("append").parquet(outV2))
      .outputMode("append").start()
    val ex = intercept[StreamingQueryException] { q2.processAllAvailable() }
    q2.stop()
    val msg = Option(ex.getCause).map(_.toString).getOrElse(ex.toString).toLowerCase
    assert(msg.contains("schema") || msg.contains("compatible"),
      s"restore failed for an unexpected reason: $msg")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(outV2)) ||
      spark.read.parquet(outV2).isEmpty, "rejected restore still emitted rows")

    // phase 3: non-destructive — the ORIGINAL class resumes the same
    // checkpoint, consumes slice B, and the combined chain matches the
    // batch twin exactly
    val q3 = Streams.computedSatStream(fileStream).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: Dataset[Streams.BvVersion], _: Long) =>
        b.write.mode("append").parquet(outV1))
      .outputMode("append").start()
    q3.processAllAvailable(); q3.stop()
    val all = spark.read.parquet(outV1).as[Streams.BvVersion].collect()
    assert(all.length == ords.length,
      s"resume re-emitted or dropped versions: ${all.length} for ${ords.length} orders")
    val last = all.groupBy(_.o_custkey)
      .map { case (ck, vs) => ck -> vs.maxBy(_.order_cnt) }
    val batch = batchTwin()
    assert(last.nonEmpty)
    last.foreach { case (ck, v) =>
      val b = batch(sha(ck.toString))
      assert((v.order_cnt, v.total_cents, v.last_order_ms, v.hd) == b,
        s"customer $ck diverges from dv_computed_sat after resume: $v vs $b")
    }
  }

  test("prescribed migration: checkpoint reset + replay under the upgraded class hits batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ords = orderLog()
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.OrderEv]
    val q = computedSatStreamV2(mem.toDF()).writeStream
      .format("memory").queryName("up_v2_replay").outputMode("append").start()
    val (b1, b2) = ords.splitAt(ords.length / 2)
    mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
    mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val versions = spark.table("up_v2_replay").as[BvVersionV2].collect()
    assert(versions.length == ords.length)
    val batch = batchTwin()
    val firstMs = ords.groupBy(_.o_custkey)
      .map { case (ck, es) => ck -> es.map(_.order_ms).min }
    versions.groupBy(_.o_custkey).foreach { case (ck, vs) =>
      val v = vs.maxBy(_.order_cnt)
      val b = batch(sha(ck.toString))
      assert((v.order_cnt, v.total_cents, v.last_order_ms, v.hd) == b,
        s"customer $ck diverges from dv_computed_sat under V2: $v vs $b")
      // the upgraded attribute is genuinely computed, not a dead field
      assert(v.first_order_ms.contains(firstMs(ck)),
        s"customer $ck first_order_ms ${v.first_order_ms} != ${firstMs(ck)}")
    }
  }
}
