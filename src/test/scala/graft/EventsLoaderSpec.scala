package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the schema-adaptive events loader (Tables.loadEvents) under every
  * physical `ts` shape the driver has shipped or could ship:
  *   - epoch-nanos BIGINT (what parquet TIMESTAMP(NANOS) reads as under
  *     spark.sql.legacy.parquet.nanosAsLong — the round-1..4 testdata),
  *   - TIMESTAMP_NTZ (parquet TIMESTAMP(MICROS, adjustToUtc=false) — the
  *     round-5 testdata),
  *   - TIMESTAMP (LTZ — plausible next drift).
  * All three must produce the SAME canonical `tms` for the same instant
  * (sessions are pinned UTC, so NTZ wall clock == UTC instant), and the raw
  * `ts` must be gone from the loaded frame.
  */
class EventsLoaderSpec extends SparkSpec {

  // 2024-01-15T06:30:00Z and one sub-second instant exercising truncation.
  private val instantsMs = Seq(1705300200000L, 1705300200123L)

  private def writeEvents(dir: java.nio.file.Path, tsCol: org.apache.spark.sql.Column,
                          tsType: DataType): Unit = {
    import spark.implicits._
    val base = instantsMs.zipWithIndex
      .map { case (ms, i) => (i.toLong, ms, i.toLong + 100, "view", 1.5, "{}") }
      .toDF("event_id", "ms", "user_id", "event_type", "value", "props")
    val df = base.withColumn("ts", tsCol).drop("ms")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(df.schema("ts").dataType == tsType, s"fixture must be $tsType")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def tmsOf(dir: java.nio.file.Path): Seq[Long] = {
    val loaded = Tables.loadEvents(spark, dir.toString)
    assert(!loaded.columns.contains("ts"), "raw ts must be dropped")
    assert(loaded.schema("tms").dataType == LongType)
    loaded.orderBy("event_id").select("tms").collect().map(_.getLong(0)).toSeq
  }

  test("loadEvents normalizes nanos-LONG, TIMESTAMP_NTZ, and TIMESTAMP to one tms") {
    val root = java.nio.file.Files.createTempDirectory("graft_events_shapes")
    val longDir = root.resolve("long"); val ntzDir = root.resolve("ntz"); val ltzDir = root.resolve("ltz")
    writeEvents(longDir, (col("ms") * 1000000L).cast(LongType), LongType)
    writeEvents(ntzDir, timestamp_millis(col("ms")).cast(TimestampNTZType), TimestampNTZType)
    writeEvents(ltzDir, timestamp_millis(col("ms")), TimestampType)
    assert(tmsOf(longDir) == instantsMs)
    assert(tmsOf(ntzDir) == instantsMs)
    assert(tmsOf(ltzDir) == instantsMs)
  }

  test("the live testdata loads through loadEvents with plausible 2024 tms") {
    val ev = Tables.loadEvents(spark, sfDir)
    val mm = ev.agg(min("tms"), max("tms")).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // generator writes 2024 activity; a unit slip (s/us/ns) moves the
    // bounds by 1000x and fails loudly here
    assert(lo > 1577836800000L && hi < 1893456000000L, s"tms bounds off: [$lo, $hi]")
  }

  test("tmsFromTs rejects an unreasoned physical type by name") {
    val e = intercept[IllegalStateException](Tables.tmsFromTs(StringType))
    assert(e.getMessage.contains("unsupported physical type"))
  }
}
