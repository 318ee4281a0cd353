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

  /** N rows per table, generically: the band JUST ABOVE a guard
    * threshold is where incomplete guards hide (n=25 events gives
    * nTest=24 and a 1-row train set — past the `n <= nTest` check,
    * still unfittable).
    */
  private def limitedDir(rows: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"lim$rows-sf").toString
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    names.foreach { n =>
      spark.read.parquet(s"$sf/$n.parquet").limit(rows)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet").limit(rows)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** One document / one embedding / one event: every pairwise,
    * windowed, and rank operator sees a corpus with no second row.
    */
  lazy val singleDir: String = limitedDir(1)

  /** All-identical documents: every doc the same text (and every
    * embedding the same vector) — dedup collapses to one cluster,
    * every similarity is 1, every rank order is pure tie-break, and
    * quantile bounds all coincide.
    */
  lazy val identicalDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("ident-sf").toString
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem")
    names.foreach { n =>
      spark.read.parquet(s"$sf/$n.parquet").limit(50)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val oneText = org.apache.spark.sql.functions.lit(
      "the same document text repeated in every row of this corpus")
    docs.withColumn("text", oneText)
      .withColumn("n_chars", org.apache.spark.sql.functions.length(oneText))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val one = emb.orderBy("vec_id").limit(1)
      .select("embedding").collect()(0).getSeq[Float](0)
    emb.limit(50).withColumn("embedding",
      org.apache.spark.sql.functions.typedLit(one))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet").limit(50)
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

  test("every declared query executes against a 1-row corpus") {
    sweep(singleDir, "single-row")
  }

  test("every declared query executes in the band just above the " +
    "train/test guard (25 and 30 rows)") {
    sweep(limitedDir(25), "25-row")
    sweep(limitedDir(30), "30-row")
  }

  test("every declared query executes against an all-identical corpus") {
    sweep(identicalDir, "all-identical")
  }
}
