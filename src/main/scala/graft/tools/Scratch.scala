package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
/** Dev scratchpad main for quick local experiments (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-24s ${(System.nanoTime()-t0)/1e9}%6.2f s  ($n rows)")
    }
    for (i <- 1 to 2) {
      time(s"hof shingles $i") { graft.llm.Dedup.shingles(docs).count() }
      val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      time(s"window shingles $i") {
        docs.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "w")))
          .select(col("doc_id"),
            concat_ws(" ", col("w"), lead(col("w"),1).over(w), lead(col("w"),2).over(w)).as("s"),
            lead(col("w"),2).over(w).as("guard"))
          .filter(col("guard").isNotNull).select(col("doc_id"), col("s")).distinct().count()
      }
    }
    spark.stop()
  }
}
