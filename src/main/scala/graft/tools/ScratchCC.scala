package graft.tools
import org.apache.spark.sql.SparkSession
object ScratchCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.llm.LanguageModel.trigramPerplexity(
      graft.Tables.documents(spark, "/root/testdata/sf0.1"))
    val p = df.queryExecution.executedPlan.toString
    println(p.split("\n").map(_.take(110)).take(70).mkString("\n"))
    spark.stop()
  }
}
