package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("as-of semantics: latest at-or-before match per key, else null") {
    import spark.implicits._
    val left = Seq(
      (1, 10.0, 100L), // before any right row -> null
      (1, 20.0, 101L), // exactly at right t=20 -> inclusive match 2.0
      (1, 25.0, 102L), // between 20 and 30 -> 2.0
      (1, 35.0, 103L), // after 30 -> 3.0
      (2, 50.0, 104L)) // key with no right rows -> null
      .toDF("k", "t", "ev")
    val right = Seq((1, 20.0, 2.0), (1, 30.0, 3.0))
      .toDF("k", "t", "v")
    val out = AsofJoin.leftAsof(left, right, "k", "t", "v", "m")
      .select(col("ev"), col("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(100L).isEmpty)
    assert(out(101L).contains(2.0))
    assert(out(102L).contains(2.0))
    assert(out(103L).contains(3.0))
    assert(out(104L).isEmpty)
    assert(out.size == 5)
  }

  test("no single-partition exchange in the as-of plan") {
    import spark.implicits._
    val left = Seq((1, 1.0, 1L)).toDF("k", "t", "ev")
    val right = Seq((1, 1.0, 1.0)).toDF("k", "t", "v")
    val plan = AsofJoin.leftAsof(left, right, "k", "t", "v", "m")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.linesIterator
      .filter(_.contains("SinglePartition")).mkString("\n"))
  }
}
