package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round isolation bench (guide §1.4): times NAMED queries in
  * a fresh quiet session through the NOOP sink — every column of every row
  * computed, no output cost, no cross-query session-cache contamination
  * beyond the explicit warm pass. Bench.scala stays the driver-comparable
  * artifact (same `.count()` action as every prior round); this tool is for
  * before/after deltas while iterating on one operator.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BenchOne name1 [name2 ...]"
  *   GRAFT_BENCH_REPS (default 3) passes per query; all passes printed.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne name1 [name2 ...]")
    val names = args.toSeq
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "3").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.applyConfs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"), sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    // Bench's warm methodology: codegen + reader paths at the smallest SF.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val warmDir = {
      val w = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
      if (new java.io.File(w).isDirectory) w else sfDir
    }
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    def f4(x: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, x)
    val parts = names.map { n =>
      spark.sparkContext.setJobDescription(s"benchone: $n")
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(n)(spark, sfDir).write
            .format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[benchone] $n FAILED: ${e.getClass.getName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString)
          None
        }
      }
      spark.sparkContext.setJobDescription(null)
      val ok = ts.flatten
      val best = if (ok.nonEmpty) f4(ok.min) else "null"
      s""""$n":{"best":$best,"passes":[${ok.map(f4).mkString(",")}]}"""
    }
    println(s"""{"metric":"benchone","unit":"sec","sf":"$sfDir","queries":{${parts.mkString(",")}}}""")
    spark.stop()
  }
}
