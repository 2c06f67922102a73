package graft

/** Subset variant of [[Verify]] for fast local iteration: dumps only the
  * named queries (plus the full oracle_sql.json, which verify_local.py
  * filters to the dumped subset by directory listing). Shares the escaper
  * / writer / session bootstrap with Verify via [[VerifyShared]].
  *
  *   sbt "runMain graft.VerifyOne <sfDir> <outDir> name1 name2 ..."
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSeq
    val spark = VerifyShared.session(sfDir)
    new java.io.File(outDir).mkdirs()
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
    }
    VerifyShared.writeOracleJson(outDir)
    spark.stop()
  }
}
