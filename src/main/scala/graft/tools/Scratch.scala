package graft.tools
import org.apache.spark.sql.SparkSession
import graft.streaming.EventsStream
/** Dev scratchpad main for quick local experiments (not part of the API). */
object Scratch {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // stage events parquet into a streaming source dir
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("batch1.parquet"))
    val agg = EventsStream.tumblingHourly(EventsStream.readEvents(spark, dir.toString))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("out").start()
    q.processAllAvailable()
    println("after batch1: " + spark.sql("SELECT count(*) AS windows, sum(n) AS events FROM out").collect().mkString)
    // second micro-batch arrives: same file under a new name → counts double
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("batch2.parquet"))
    q.processAllAvailable()
    println("after batch2: " + spark.sql("SELECT count(*) AS windows, sum(n) AS events FROM out").collect().mkString)
    q.stop()
    val sess = EventsStream.sessionize(spark,
      EventsStream.readEvents(spark, dir.toString), 1800)
    val q2 = sess.writeStream.outputMode("append").format("memory")
      .queryName("sess").start()
    q2.processAllAvailable()
    println("sessions emitted: " + spark.sql("SELECT count(*), sum(n_events) FROM sess").collect().mkString)
    q2.stop()
    spark.stop()
  }
}
