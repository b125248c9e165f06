package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = Seq("vdb_knn_filtered", "q3_join", "q1_agg", "q_topk_price",
      "vdb_filter_json", "sim_knn_batch", "dedup_exact", "text_profile",
      "q_asof_join", "q_range_join", "sim_containment", "q_window_topn",
      "layout_zorder", "text_chunk", "vdb_insert_bloom", "pipeline_e2e",
      "q_concurrency", "agg_bitmap_distinct", "dedup_components",
      "sim_decontaminate", "sim_ann_ivfpq", "search_bm25",
      "sim_ann_bq", "text_bpe_apply", "text_langid_ngram", "q_gapfill")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
