package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
/** Dev scratchpad main for quick local experiments (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val plan = emb.select(dot_product(col("embedding"), col("embedding")).as("n2"))
      .queryExecution.executedPlan.toString
    println("projection WSC: " + plan.contains("WholeStageCodegen"))
    println(plan.linesIterator.take(4).mkString("\n"))
    spark.stop()
  }
}
