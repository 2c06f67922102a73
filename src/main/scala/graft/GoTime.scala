package graft
import org.apache.spark.sql.SparkSession
object GoTime {
  def main(args: Array[String]): Unit = {
    val spark = Tables.applyConfs(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val out = java.nio.file.Files.createTempDirectory("gotime").toString
    import graft.dv._, graft.dv.DvPlanner._
    val builds: Seq[(String, org.apache.spark.sql.DataFrame)] =
      hubs.map(h => s"hub_${h.name}" -> DvBuild.hub(spark, dir, h)) ++ Seq(
        "sat_customer" -> DvBuild.sat(spark, dir, satCustomer),
        "sat_customer_sensitive" -> DvBuild.sat(spark, dir, satCustomerSensitive),
        "link_orders" -> DvBuild.link(spark, dir, linkOrders),
        "link_lineitem" -> DvBuild.link(spark, dir, linkLineitem))
    builds.foreach { case (n, df) =>
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$out/$n")
      println(f"${(System.nanoTime()-t0)/1e9}%8.2f  $n")
    }
    spark.stop()
  }
}
