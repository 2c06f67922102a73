package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the headline queries so the
  * pushdown/broadcast/codegen claims in SURVEY.md §6 stay audited.
  * Run: sbt "runMain graft.PlanAudit [queryName ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Tables.applyConfs(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.nonEmpty) args.toSet
      else Set("q5_local_supplier", "q1_pricing_summary", "dv_hub_customer", "knn_cosine",
        "dedup_minhash_lsh", "dedup_embed_cosine", "ann_cosine_ivf",
        "q6_forecast_revenue", "q10_returned_item", "text_tfidf", "events_retention",
        "dedup_cluster", "decontaminate", "text_lm_score", "mm_dedup",
        "q21_waiting_supplier", "events_anomaly",
        "dedup_embed_cosine_prod", "ann_cosine_lsh", "events_approx_stats",
        "dv_reclassify_drift", "range_join_events", "emb_pq_codes", "ann_l2_pq",
        "dedup_incremental", "dedup_keep_best", "knn_label_vote", "corpus_pack",
        "dv_replan_drift", "dedup_substring", "dedup_span_mask", "corpus_ngrams",
        "search_hybrid", "orders_rfm", "events_attribution", "corpus_source_stats",
        "ann_ivf_pq",
        // r6 additions
        "events_heavy_hitters", "orders_basket_pairs", "events_path_conversion",
        "text_feature_hash", "dv_computed_sat", "emb_covariance", "knn_recall_report",
        // r9 additions
        "ann_cosine_ivf_probe", "corpus_token_budget")
    SparkEntry.modules.flatMap(_.defs).filter(d => wanted(d.name)).foreach { d =>
      println(s"\n========== ${d.name} ==========")
      println(d.run(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
