package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Diagnostics, EventsAnalytics}

/** Semantic checks for the round-9 observability/versioning
  * operators: snapshot diff (x101), column profile (x102), and the
  * winsorization report (x103).
  */
class ObservabilitySpec extends AnyFunSuite {
  import SparkTestSession._

  test("winsorize: exact percentile bounds and clipped sum on a " +
    "closed-form value distribution") {
    import spark.implicits._
    // one type: 0.01 once, 1.00 x98, 100.00 once -> p1 bound is the
    // low outlier itself (ceil semantics), p99 bound 1.00, exactly
    // one value clipped high, winsorized sum known to the cent
    val vals = Seq(0.01) ++ Seq.fill(98)(1.00) ++ Seq(100.00)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, 1L, "click", v)
    }.toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("event_id")))
    val r = EventsAnalytics.winsorizeReport(ev).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("p_lo_cents") == 1L)
    assert(row.getAs[Long]("p_hi_cents") == 100L)
    assert(row.getAs[Long]("n_clip_low") == 0L)
    assert(row.getAs[Long]("n_clip_high") == 1L)
    assert(row.getAs[Long]("sum_w_cents") == 1L + 98L * 100L + 100L)
  }

  test("column profile: nulls, ndv, and cent bounds are exact; " +
    "string and numeric columns report on their own axes") {
    import spark.implicits._
    val df = Seq(
      (Some(1.5), Some("a")),
      (Some(2.25), Some("b")),
      (None: Option[Double], Some("a")),
      (Some(1.5), None: Option[String]))
      .toDF("v", "s")
    val out = Diagnostics.columnProfile(df, numCols = Seq("v"),
      strCols = Seq("s")).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    val v = out("v")
    assert(v.getAs[Long]("n_vals") == 3L)
    assert(v.getAs[Long]("n_null") == 1L)
    assert(v.getAs[Long]("ndv") == 2L)
    assert(v.getAs[Long]("min_cents") == 150L)
    assert(v.getAs[Long]("max_cents") == 225L)
    assert(v.isNullAt(v.fieldIndex("min_str")))
    val s = out("s")
    assert(s.getAs[Long]("n_vals") == 3L)
    assert(s.getAs[Long]("n_null") == 1L)
    assert(s.getAs[Long]("ndv") == 2L)
    assert(s.getAs[String]("min_str") == "a")
    assert(s.getAs[String]("max_str") == "b")
    assert(s.isNullAt(s.fieldIndex("min_cents")))
  }

  test("snapshot diff: statuses match a direct recomputation from " +
    "the operator's own hash slices") {
    val docs = Tables.documents(spark, sf).limit(200)
    val base = docs
      .select(col("doc_id"), col("source"), col("text"),
        expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 4), " +
          "16, 10) as int)").as("hb"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3)))
    val expected = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    base.foreach { case (_, src, text, hb) =>
      val inOld = hb % 19 != 0
      val inNew = hb % 17 != 0
      val changed = hb % 13 == 0 && text.toUpperCase != text
      val status =
        if (inOld && inNew) { if (changed) "changed" else "same" }
        else if (inNew) "added"
        else if (inOld) "removed"
        else null
      if (status != null) expected((src, status)) += 1L
    }
    val got = Dedup.snapshotDiff(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("status")) ->
        r.getAs[Long]("n")).toMap
    assert(got == expected.toMap, s"diff mismatch")
    assert(got.keys.map(_._2).toSet.contains("changed"))
    assert(got.keys.map(_._2).toSet.contains("removed"))
    assert(got.keys.map(_._2).toSet.contains("added"))
  }
}
