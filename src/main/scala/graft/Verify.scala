package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failures are LOUD, never absence (the round-4 lesson: 16 ops crashed at
  * analysis time and silently vanished from the correctness artifact): a
  * failed op leaves a `<name>._error` sidecar carrying the exception, the
  * run prints a FAILED summary line, and the process exits non-zero.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = VerifyShared.session(sfDir)
    new java.io.File(outDir).mkdirs()
    val failed = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        Files.writeString(Paths.get(s"$outDir/$name._error"),
          s"${e.getClass.getName}: ${e.getMessage}")
        Some(name)
      }
    }
    VerifyShared.writeOracleJson(outDir)
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[verify] ${failed.size} op(s) FAILED: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}

/** The load-bearing pieces Verify and VerifyOne must share: ONE escaper
  * (an unescaped control char in builder-authored SQL would silently zero
  * the round's correctness — a fix must never land in only one copy), ONE
  * oracle_sql.json writer, ONE session bootstrap.
  */
private[graft] object VerifyShared {
  def session(dataDirs: String*): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = Tables.applyConfs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"), dataDirs: _*)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20).
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def writeOracleJson(outDir: String): Unit = {
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
