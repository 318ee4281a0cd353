package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val docs = graft.Tables.documents(spark, sf)
    // instrumented CC: how many double-rounds does sf0.1 need, and
    // what does each cost?
    val pairs = graft.llm.Dedup.simhashNearDup(docs, 3, 64)
      .select(col("d1"), col("d2"))
    val bidir0 = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .unionByName(pairs.select(col("d2").as("a"), col("d1").as("b")))
    val bidir = graft.tools.Materialize(bidir0)
    var lbl = bidir.groupBy(col("a"))
      .agg(min(col("b")).as("mb"))
      .select(col("a").as("node"), least(col("a"), col("mb")).as("label"))
      .transform(graft.tools.Materialize(_))
    println(s"nodes=${lbl.count()} edges=${bidir.count()}")
    def step(l: DataFrame): DataFrame = {
      val viaEdges = bidir
        .join(l.select(col("node").as("b"), col("label")), "b")
        .select(col("a").as("node"), col("label"),
          lit(null).cast("long").as("old"))
      val prop = l.unionByName(viaEdges)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"), max(col("old")).as("old"))
      val hop = prop.select(col("node").as("ln"), col("label").as("ll"))
      prop.join(hop, col("label") === col("ln"), "left")
        .select(col("node"),
          coalesce(col("ll"), col("label")).as("label"), col("old"))
    }
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 25) {
      val t0 = System.nanoTime()
      val next = step(step(lbl.withColumn("old", col("label"))))
        .transform(graft.tools.Materialize(_))
      changed = next.filter(!(col("label") <=> col("old"))).count()
      lbl = next.drop("old")
      iter += 2
      println(f"round ${iter / 2}%d (2 steps): changed=$changed%d  " +
        f"${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    println(s"converged after $iter steps")
    spark.stop()
  }
}
