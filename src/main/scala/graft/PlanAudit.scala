package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted physical plans for scale-critical queries so
  * pushdown / broadcast / codegen can be audited. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "p3_projection", "p5_inlist_filter", "j1_inner_join", "j4_broadcast_hint",
      "j6_asof_join", "a5_two_key_summary", "o5_top_n", "d3_minhash_lsh",
      "sim1_cosine_topk", "u1_welford_stats", "mm2_decode_features")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
