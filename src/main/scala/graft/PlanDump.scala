package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round instrumentation (guide §1.2/§7.2): dumps the
  * `explain("formatted")` physical plan of every registered query (or a
  * named subset) to one file per query, so plan-shape claims (Exchange
  * count, join strategy, PushedFilters/ReadSchema) are checkable artifacts
  * rather than prose. E2E lifecycle ops (dv_go_*, dv_build_history, ...)
  * run their side-effecting build while CONSTRUCTING the frame, so their
  * dump shows only the final summary frame — their plan claims live in the
  * specs that pin the internal shapes instead.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PlanDump <outDir> [name ...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.applyConfs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"), sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.foreach { n =>
      val text =
        try SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"ERROR: ${e.getClass.getName}: ${e.getMessage}" }
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/$n.txt"), text)
      println(s"[plandump] $n -> $outDir/$n.txt")
    }
    spark.stop()
  }
}
