package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends AnyFunSuite {

  test("session built with GraftExtensions has the functions in SQL") {
    // extensions bind at session build time; getOrCreate would hand
    // back the shared test session, so force a genuinely new session
    // (same SparkContext, fresh SessionState) and restore after
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c"""
          .stripMargin).collect()(0)
      assert(r.getDouble(0) == 11.0)
      assert(r.getDouble(1) == 1.0)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
