package graft

import java.nio.file.{Files, Path, Paths}

import graft.dv.{DvGo, DvLoader, DvMaintenance}
import org.apache.spark.sql.functions._

/** Failure-injection proof for the compaction staged-and-swap (round-7
  * verdict item 5). CrashRecoverySpec's method: construct the EXACT
  * on-disk state each crash leaves — not a hand-wired partial run — then
  * call compactBucketed again (the documented recovery action is
  * "retry") and require the object's queryable content unchanged and the
  * layout fully compacted. The mid-swap case is the one that mattered:
  * the r7 pre-clean deleted `<obj>__old` before checking whether the
  * live object still existed, so a retry after a crash between the two
  * swap renames would have destroyed the only copy of the data.
  */
class DvMaintenanceSpec extends SparkSpec {

  private def copyDir(src: Path, dst: Path): Unit = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.walk(src)) { w =>
      w.iterator().asScala.foreach { p =>
        val t = dst.resolve(src.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else { Files.createDirectories(t.getParent); Files.copy(p, t) }
      }
    }
  }

  /** Fragmented bucketed repo fixture; returns (repoDir, tableName). */
  private def fragmentedRepo(tag: String): (String, String) = {
    val out = Files.createTempDirectory(s"graft_compact_$tag").toString
    DvGo.go(spark, sfDir, out, include = Set("hub_customer"), bucketed = true, buckets = 4)
    val prefix = DvLoader.readSchema(spark, out).bucketing.get.tablePrefix
    val cust = Tables.load(spark, sfDir, "customer")
    DvLoader.streamTableLoadBatch(spark,
      cust.withColumn("c_custkey", col("c_custkey") + 1000000L), "customer", out, "b1")
    (out, s"${prefix}hub_customer")
  }

  private def contentHash(table: String): (Long, Long) = {
    val r = spark.table(table)
      .agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("hub_customer_hk"))), lit(0L)))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("retry recovers a crash between stage write and swap") {
    val (out, table) = fragmentedRepo("a")
    try {
      val want = contentHash(table)
      // crash state A: staged copy fully written, swap not begun — the
      // live object and its catalog entry are untouched
      copyDir(Paths.get(s"$out/hub_customer"), Paths.get(s"$out/hub_customer__compact"))
      val (_, after) = DvMaintenance.compactBucketed(spark, out, "hub_customer")
      assert(after == 4, s"expected one file per bucket, files=$after")
      assert(contentHash(table) == want, "object content changed across recovery")
      assert(!Files.exists(Paths.get(s"$out/hub_customer__compact")))
      assert(!Files.exists(Paths.get(s"$out/hub_customer__old")))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      DvLoader.deletePath(Paths.get(out))
    }
  }

  test("retry recovers a crash between the two swap renames (object set aside)") {
    val (out, table) = fragmentedRepo("b")
    try {
      val want = contentHash(table)
      // crash state B: the dangerous window — live object renamed to
      // __old, staged copy not yet moved in, catalog entries dropped.
      // __old holds the ONLY copy of the data.
      copyDir(Paths.get(s"$out/hub_customer"), Paths.get(s"$out/hub_customer__compact"))
      spark.sql(s"DROP TABLE IF EXISTS $table")
      Files.move(Paths.get(s"$out/hub_customer"), Paths.get(s"$out/hub_customer__old"))
      val (_, after) = DvMaintenance.compactBucketed(spark, out, "hub_customer")
      assert(after == 4, s"expected one file per bucket, files=$after")
      // a reader now sees exactly the pre-crash rows — never a mix, never
      // a loss — and the debris is gone
      assert(contentHash(table) == want, "mid-swap recovery lost or duplicated rows")
      assert(!Files.exists(Paths.get(s"$out/hub_customer__compact")))
      assert(!Files.exists(Paths.get(s"$out/hub_customer__old")))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      DvLoader.deletePath(Paths.get(out))
    }
  }

  test("retry recovers a crash between swap and old-copy cleanup") {
    val (out, table) = fragmentedRepo("c")
    try {
      val want = contentHash(table)
      // crash state C: swap complete (live object is the compacted copy —
      // simulated by the object itself), stale __old copy not yet deleted,
      // catalog entry already re-registered
      copyDir(Paths.get(s"$out/hub_customer"), Paths.get(s"$out/hub_customer__old"))
      val (_, after) = DvMaintenance.compactBucketed(spark, out, "hub_customer")
      assert(after == 4, s"expected one file per bucket, files=$after")
      assert(contentHash(table) == want, "object content changed across recovery")
      assert(!Files.exists(Paths.get(s"$out/hub_customer__old")))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      DvLoader.deletePath(Paths.get(out))
    }
  }
}
