package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed quality-classifier training (SURVEY.md §2.9 X3) — the
  * fastText-style filter step of a pretraining pipeline (GPT-3 /
  * LLaMA lineage): fit a logistic regression from cheap text
  * statistics to a weak label, then score every document with the
  * trained model.
  *
  * Training is full-batch gradient descent: each iteration is ONE
  * hash aggregation over the standardized feature table (map-side
  * partial sums, no shuffle of rows) producing the d+1-dimensional
  * gradient — the only driver transfer, bounded by the feature count,
  * exactly the treeAggregate shape MLlib uses. The feature table is
  * computed once and pinned (graft.tools.Materialize); T iterations are T cheap
  * jobs regardless of corpus size.
  *
  * Float discipline (the oracle replays the same loop in SQL): the
  * feature means/sds and each iteration's gradient are rounded to 9dp
  * on both sides, so the weight vector stays bit-identical across
  * engines — per-row model scores then differ only by libm ulps,
  * absorbed by the 6dp output rounding.
  */
object QualityClassifier {

  val lr = 2.0
  val iters = 8

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Train on `lang == 'en'` as the positive label and return the
    * model: (feature means, feature sds, weights [bias, w1..w4]).
    * Features: ln token count, mean word length, unique-token ratio,
    * stopword ratio. `trainScore` composes this with a scoring pass;
    * the streaming twin (DocumentsStream.applyClassifier) serves the
    * same model on a document feed.
    */
  def trainedModel(docs: DataFrame)
      : (Array[Double], Array[Double], Array[Double]) = {
    val (mu, sd, w, _) = trainedModelWithFrame(docs)
    (mu, sd, w)
  }

  /** The per-document feature projection (map-only; shared by the
    * training pass and the serve path so the two build z from the
    * IDENTICAL expressions).
    */
  private def rawFeatures(docs: DataFrame): DataFrame = {
    val swArray = TextAnalysis.stopwords.map(s => s"'$s'")
      .mkString("array(", ", ", ")")
    docs
      .withColumn("t", split(col("text"), " "))
      .withColumn("nt", size(col("t")))
      .select(col("doc_id"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
        log(lit(1) + col("nt")).as("x1"),
        ((length(col("text")) - (col("nt") - 1)).cast("double") /
          col("nt")).as("x2"),
        (size(array_distinct(col("t"))).cast("double") / col("nt")).as("x3"),
        (expr(s"size(filter(t, w -> array_contains($swArray, w)))")
          .cast("double") / col("nt")).as("x4"))
  }

  /** Standardize raw features with mu/sd as LITERALS — both the
    * trained and the served model inject the same 9dp-rounded doubles,
    * so z is bit-identical on the two paths.
    */
  private def standardized(raw: DataFrame, mu: Array[Double],
      sd: Array[Double]): DataFrame =
    raw.select(col("doc_id") +: col("y") +: (1 to 4).map(j =>
      ((col(s"x$j") - lit(mu(j - 1))) / lit(sd(j - 1))).as(s"z$j")): _*)

  private def trainedModelWithFrame(docs: DataFrame)
      : (Array[Double], Array[Double], Array[Double], DataFrame) = {
    val raw = rawFeatures(docs)
    val statAggs = (1 to 4).flatMap { j =>
      Seq(avg(col(s"x$j")).as(s"m$j"),
        avg(col(s"x$j") * col(s"x$j")).as(s"q$j"))
    }
    val st = raw.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    val mu = (1 to 4).map(j => round9(st.getAs[Double](s"m${j}"))).toArray
    // a constant feature has sd 0 (and carries no signal): divide by 1
    // instead so z is 0 everywhere, mirrored in the oracle's CASE;
    // the variance clamps at 0 against catastrophic-cancellation NaN
    val sd = (1 to 4).map { j =>
      val ax = st.getAs[Double](s"m${j}")
      val ax2 = st.getAs[Double](s"q${j}")
      val s = round9(math.sqrt(math.max(ax2 - ax * ax, 0.0)))
      if (s == 0.0) 1.0 else s
    }.toArray
    val z = standardized(raw, mu, sd)
      .transform(graft.tools.Materialize(_))
    val w = Array.fill(5)(0.0) // bias, z1..z4
    for (_ <- 1 to iters) {
      val p = lit(1.0) / (lit(1.0) + exp(-margin(w)))
      val gradAggs = avg(p - col("y")).as("g0") +: (1 to 4).map(j =>
        avg((p - col("y")) * col(s"z$j")).as(s"g$j"))
      val g = z.agg(gradAggs.head, gradAggs.tail: _*).collect()(0)
      for (j <- 0 to 4)
        w(j) = round9(w(j) - lr * round9(g.getAs[Double](s"g$j")))
    }
    (mu, sd, w, z)
  }

  /** Shared by batch scoring and the streaming twin so both build the
    * margin with the IDENTICAL float association order (expects
    * standardized feature columns z1..z4).
    */
  private[graft] def margin(wv: Array[Double]): Column =
    lit(wv(0)) + (1 to 4).map(j => lit(wv(j)) * col(s"z$j")).reduce(_ + _)

  /** The scoring projection over a standardized frame — shared by
    * [[trainScore]] and [[serveScore]] so the two paths cannot drift.
    */
  private def scored(z: DataFrame, w: Array[Double]): DataFrame = {
    val p = lit(1.0) / (lit(1.0) + exp(-margin(w)))
    z.select(col("doc_id"), col("y"), round(p, 6).as("prob"),
        (round(p, 6) > 0.5).as("pred"))
      .orderBy(col("doc_id"))
  }

  /** Train and score every document: (doc_id, y, prob, pred). */
  def trainScore(docs: DataFrame): DataFrame = {
    val (_, _, w, z) = trainedModelWithFrame(docs)
    scored(z, w)
  }

  /** The trained model as ONE persistable row — (m1..m4, s1..s4,
    * c0..c4), all 9dp-rounded doubles so a parquet round-trip is
    * bit-exact. Training runs in full; the GD loop's only driver
    * transfers are the per-iteration 1-row gradients, same as
    * [[trainScore]].
    */
  def modelFrame(docs: DataFrame): DataFrame = {
    val (mu, sd, w) = trainedModel(docs)
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((mu(0), mu(1), mu(2), mu(3), sd(0), sd(1), sd(2), sd(3),
      w(0), w(1), w(2), w(3), w(4)))
      .toDF("m1", "m2", "m3", "m4", "s1", "s2", "s3", "s4",
        "c0", "c1", "c2", "c3", "c4")
  }

  /** Classifier SERVE path (train-once/serve-many,
    * [[graft.tools.ModelStore]]): the 13-double model row is trained +
    * persisted on first use and read back — NO gradient loop, no
    * feature statistics pass — on every later one; scoring is then a
    * single map-only projection over the corpus. Bit-identical to
    * [[trainScore]] because mu/sd/w round-trip parquet exactly and the
    * feature/standardize/score expressions are shared.
    */
  def serveScore(docs: DataFrame, modelPath: String): DataFrame = {
    val row = graft.tools.ModelStore.ensure(modelPath,
      modelFrame(docs), spec = "modelFrame v1")
      .collect()(0) // bounded: the 13-double model row
    val mu = (1 to 4).map(j => row.getAs[Double](s"m$j")).toArray
    val sd = (1 to 4).map(j => row.getAs[Double](s"s$j")).toArray
    val w = (0 to 4).map(j => row.getAs[Double](s"c$j")).toArray
    scored(standardized(rawFeatures(docs), mu, sd), w)
  }

  /** X3/ML-ops: classifier RELIABILITY table (calibration curve) —
    * the gate a pipeline checks before trusting the classifier's
    * probabilities as sampling weights: predictions bucket into
    * `bins` equal-width probability bands; per band the mean
    * predicted probability sits next to the observed positive rate,
    * and the |gap| is the per-band calibration error (the reliability
    * diagram's vertical distance; a well-calibrated model has
    * gap ≈ 0 everywhere it has mass). One extra |bins|-row hash
    * aggregate over the x43 scoring output — nothing beyond the
    * training plan's own cost.
    */
  def calibration(docs: DataFrame, bins: Int = 10): DataFrame =
    trainScore(docs)
      .withColumn("bucket",
        least(floor(col("prob") * bins), lit((bins - 1).toLong))
          .cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("prob")), 6).as("avg_prob"),
        round(avg(col("y")), 6).as("obs_rate"))
      .withColumn("gap",
        round(abs(col("avg_prob") - col("obs_rate")), 6))
      .orderBy(col("bucket"))

  def calibrationSql(bins: Int = 10): String =
    s"""SELECT CAST(LEAST(floor(prob * $bins), ${bins - 1}) AS INT)
       |    AS bucket,
       |  CAST(count(*) AS BIGINT) AS n,
       |  round(avg(prob), 6) AS avg_prob,
       |  round(avg(y), 6) AS obs_rate,
       |  round(abs(round(avg(prob), 6) - round(avg(y), 6)), 6) AS gap
       |FROM ($trainScoreSql) s
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB oracle: the identical GD loop as chained CTEs — one
    * (gradient, weight-update) pair per iteration, every aggregate
    * rounded to 9dp exactly as the engine rounds.
    */
  def trainScoreSql: String = {
    val swList = TextAnalysis.stopwords.map(s => s"'$s'")
      .mkString("[", ", ", "]")
    val sb = new StringBuilder
    sb.append(
      s"""raw AS MATERIALIZED (
         |  SELECT doc_id,
         |         CAST(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END
         |              AS DOUBLE) AS y,
         |         ln(1 + len(t)) AS x1,
         |         CAST(len(text) - (len(t) - 1) AS DOUBLE) / len(t) AS x2,
         |         CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS x3,
         |         CAST(len(list_filter(t, w -> list_contains($swList, w)))
         |              AS DOUBLE) / len(t) AS x4
         |  FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS t
         |        FROM documents)
         |), st0 AS (
         |  SELECT ${(1 to 4).map(j =>
              s"round(avg(x$j), 9) AS m$j, " +
                s"round(sqrt(greatest(avg(x$j * x$j) " +
                s"- avg(x$j) * avg(x$j), 0)), 9) AS s$j")
              .mkString(",\n         ")}
         |  FROM raw
         |), st AS (
         |  SELECT ${(1 to 4).map(j =>
              s"m$j, CASE WHEN s$j = 0 THEN 1.0 ELSE s$j END AS s$j")
              .mkString(", ")}
         |  FROM st0
         |), z AS MATERIALIZED (
         |  SELECT doc_id, y, ${(1 to 4).map(j =>
              s"(x$j - m$j) / s$j AS z$j").mkString(", ")}
         |  FROM raw CROSS JOIN st
         |), w0 AS (SELECT 0.0 AS c0, 0.0 AS c1, 0.0 AS c2, 0.0 AS c3,
         |                 0.0 AS c4)""".stripMargin)
    val m = "(c0 + c1 * z1 + c2 * z2 + c3 * z3 + c4 * z4)"
    val p = s"(1.0 / (1.0 + exp(-$m)))"
    for (t <- 1 to iters) {
      val prev = s"w${t - 1}"
      sb.append(s""",
        |g$t AS (
        |  SELECT round(avg($p - y), 9) AS g0,
        |         ${(1 to 4).map(j =>
             s"round(avg(($p - y) * z$j), 9) AS g$j").mkString(",\n         ")}
        |  FROM z CROSS JOIN $prev
        |),
        |w$t AS (
        |  SELECT ${(0 to 4).map(j =>
             s"round(c$j - $lr * g$j, 9) AS c$j").mkString(", ")}
        |  FROM $prev CROSS JOIN g$t
        |)""".stripMargin)
    }
    s"""WITH ${sb.toString}
       |SELECT doc_id, y, round($p, 6) AS prob,
       |       round($p, 6) > 0.5 AS pred
       |FROM z CROSS JOIN w$iters
       |ORDER BY doc_id""".stripMargin
  }
}
