package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empty-corpus sweep: at 100 TB, empty partitions, empty filters,
  * and freshly-created empty tables are routine — a query that
  * crashes on zero rows crashes in production. Every declared query
  * must plan and execute against a fully empty (0-row, full-schema)
  * copy of the harness tables, either returning an empty/degenerate
  * result or raising a DOCUMENTED contract error (none currently do).
  */
class EmptyInputSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("empty-sf").toString
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    names.foreach { n =>
      spark.read.parquet(s"$sf/$n.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    // events must stay a raw INT64 nanos column so Tables.eventsNanos'
    // `ts div 1000` conversion still applies on the empty fixture
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** 10 rows per table: below every k/tile/batch/window parameter the
    * declared queries use, so each n<k degenerate path runs.
    */
  lazy val tinyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("tiny-sf").toString
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    names.foreach { n =>
      spark.read.parquet(s"$sf/$n.parquet").limit(10)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet").limit(10)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def sweep(dir: String, label: String): Unit = {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch {
          case e: Throwable =>
            Some(s"$name: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(1).mkString.take(160)}")
        }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} queries crash on $label input:\n" +
        failures.mkString("\n"))
  }

  test("every declared query executes against a fully empty corpus") {
    sweep(emptyDir, "empty")
  }

  test("every declared query executes against a 10-row corpus") {
    sweep(tinyDir, "tiny")
  }
}
