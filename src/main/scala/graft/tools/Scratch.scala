package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev scratchpad main for quick local experiments (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def docs(n: Int) = {
      val d = spark.read.parquet(s"$sf/documents.parquet")
      if (n <= 1) d else d.repartition(n)
    }
    def time(label: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-40s best=${runs.min}%.3f  (${runs.map(r => f"$r%.2f").mkString("/")})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm
    noop(graft.llm.Dedup.simhash32Signatures(docs(1)))
    for (n <- Seq(1, 4, 8, 32)) {
      time(s"simhash sigs, repartition($n)") {
        noop(graft.llm.Dedup.simhash32Signatures(docs(n)))
      }
    }
    // isolate: just the tokenize+hash map stage, no agg
    for (n <- Seq(1, 32)) {
      time(s"tok+md5hash only, repartition($n)") {
        noop(docs(n).select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("w"))
          .withColumn("v", expr((1 to 8).map { p =>
            s"(CAST(instr('0123456789abcdef', substr(md5(w), $p, 1)) - 1" +
              s" AS BIGINT) * ${1L << (4 * (8 - p))})"
          }.mkString("(", " + ", ")"))))
      }
      time(s"tok only, repartition($n)") {
        noop(docs(n).select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("w")))
      }
      time(s"agg only after tok+hash, repartition($n)") {
        val tok = docs(n).select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("w"))
          .withColumn("v", xxhash64(col("w")))
        val bitAggs = (0 until 32).map { j =>
          sum(when(expr(s"(v div ${1L << j}) % 2") === 1, 1).otherwise(-1))
            .as(s"s$j") }
        noop(tok.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*))
      }
    }
    spark.stop()
  }
}
