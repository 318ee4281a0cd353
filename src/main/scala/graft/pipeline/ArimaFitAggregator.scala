package graft.pipeline

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.arima.{ArimaFit, Sarima2Ar}

/** The chunk fit as a typed `Aggregator` (SURVEY.md §4.2's optional
  * UDAF form): makes a DARIMA fit expressible inside `agg(...)` on a
  * KeyValueGroupedDataset, composable with other aggregates in one
  * pass. Semantically identical to the `flatMapGroups` path in
  * [[Darima.fitChunkCoefs]] — buffer collects (time, value) pairs,
  * finish sorts and fits.
  *
  * The buffer is O(chunk) like the flatMapGroups path (a fit needs
  * the whole series); Kryo-encoded so spill still works.
  */
final case class CoefRow(coef: String, lag_idx: Int, value: Double,
    weight: Double, n: Long)

class ArimaFitAggregator(cfg: DarimaConfig)
    extends Aggregator[(Double, Double),
      scala.collection.mutable.ArrayBuffer[(Double, Double)],
      Array[CoefRow]] with Serializable {

  type Buf = scala.collection.mutable.ArrayBuffer[(Double, Double)]

  override def zero: Buf = scala.collection.mutable.ArrayBuffer.empty

  override def reduce(b: Buf, a: (Double, Double)): Buf = { b += a; b }

  override def merge(b1: Buf, b2: Buf): Buf = { b1 ++= b2; b1 }

  override def finish(b: Buf): Array[CoefRow] = {
    val values = b.sortBy(_._1).map(_._2).toArray
    val mod = cfg.fitter match {
      case "arma" => ArimaFit.fit(values, cfg.freq, cfg.maxP, cfg.maxQ)
      case _ => ArimaFit.fitLongAr(values, cfg.freq, cfg.maxLag)
    }
    val ar = Sarima2Ar.toAr(mod, cfg.tol)
    val w = ar.n.toDouble / math.max(ar.sigma2, 1e-12)
    val base = Array(
      CoefRow("beta0", -2, ar.beta0, w, ar.n),
      CoefRow("beta1", -1, ar.beta1, w, ar.n),
      CoefRow("sigma2", Int.MaxValue, ar.sigma2, w, ar.n))
    base ++ ar.pi.zipWithIndex.map { case (p, i) =>
      CoefRow(s"ar${i + 1}", i + 1, p, w, ar.n)
    }
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]

  override def outputEncoder: Encoder[Array[CoefRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[CoefRow]]()
}
