package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev scratchpad main for quick local experiments (not part of the API). */
object Scratch {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.selectExpr("event_id","ts","cast(ts as double) as epoch","hour(ts) as h").show(3, false)
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    em.printSchema()
    spark.stop()
  }
}
