package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Property tests for the distributed ordering operators: on random
  * key distributions (including heavy ties and constant keys) the
  * bucketed implementations must equal their single-partition window
  * references exactly. Case counts are kept small because each case
  * runs Spark jobs.
  */
object OperatorProps extends Properties("operators") {
  import SparkTestSession._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val genKeys: Gen[List[Double]] = for {
    n <- Gen.choose(1, 300)
    dup <- Gen.choose(1, 10) // duplication factor: ties
    keys <- Gen.listOfN(n, Gen.choose(0, n / dup + 1).map(_.toDouble))
  } yield keys

  property("OrderedRank ntile == window ntile on random ties") =
    forAll(genKeys, Gen.choose(1, 9)) { (keys: List[Double], k: Int) =>
      import spark.implicits._
      val df = keys.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val global = df.withColumn("tile",
          ntile(k).over(Window.orderBy(col("t"), col("id"))))
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      val dist = graft.ts.OrderedRank
        .withNtile(df, col("t"), col("id"), k, "tile", buckets = 4)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      Prop(global == dist)
    }

  property("OrderedLag == window lag on random ties") =
    forAll(genKeys, Gen.choose(1, 12)) { (keys: List[Double], lagN: Int) =>
      import spark.implicits._
      val df = keys.zipWithIndex.map { case (t, i) => (i.toLong, t, i * 1.0) }
        .toDF("id", "t", "v")
      val global = df.withColumn("l",
          lag(col("v"), lagN).over(Window.orderBy(col("t"), col("id"))))
        .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
      val dist = graft.ts.OrderedLag
        .withLags(df, col("t"), col("id"), "v", Seq(lagN), buckets = 4)
        .select(col("id"), col(s"v_lag$lagN"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      Prop(global == dist)
    }
}
