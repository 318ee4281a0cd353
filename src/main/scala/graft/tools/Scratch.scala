package graft.tools
import org.apache.spark.sql.SparkSession
import graft.streaming.EventsStream
/** Dev scratchpad main for quick local experiments (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("batch1.parquet"))
    val sess = EventsStream.sessionize(spark,
      EventsStream.readEvents(spark, dir.toString), 1800)
    val q = sess.writeStream.outputMode("append").format("memory")
      .queryName("s").start()
    q.processAllAvailable()
    val n1 = spark.sql("SELECT count(*) FROM s").collect()(0).getLong(0)
    val batch = graft.llm.EventsAnalytics.sessions(
      graft.Tables.events(spark, "/root/testdata/sf0.001"), 1800).count()
    val users = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id").distinct().count()
    println(s"emitted=$n1 batchSessions=$batch users=$users (old NoTimeout behavior was ${batch - users})")
    q.stop()
    // null-element propagation through SQL surface
    graft.functions.VectorFunctions.register(spark)
    spark.sql("SELECT dot_product(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 1.0D)) AS d").show()
    spark.stop()
  }
}
