package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.ZonesEval

/** The zones regression gate's flag + detection logic (the pipeline
  * run itself is exercised by the per-round ZonesEval invocation):
  * strict is the DEFAULT, only GRAFT_ZONES_STRICT=0 downgrades, and
  * detection compares within one fitter config with the > 5% MASE
  * threshold exclusive at the boundary.
  */
class ZonesGateSpec extends AnyFunSuite {

  test("strict is the default; only '0' downgrades to warn-only") {
    assert(ZonesEval.strictEnabled(_ => None))
    assert(ZonesEval.strictEnabled(_ => Some("1")))
    assert(ZonesEval.strictEnabled(_ => Some("")))
    assert(!ZonesEval.strictEnabled(_ => Some("0")))
  }

  private val prior =
    """[
      |  {"zone":"CT","fitter":"longar","mase":1.0000,"smape":0.1,"msis_80":5.0,"msis_95":7.0},
      |  {"zone":"VT","fitter":"sarima","mase":0.9000,"smape":0.1,"msis_80":5.0,"msis_95":7.0},
      |  {"zone":"ME","mase":2.0000,"smape":0.1,"msis_80":5.0,"msis_95":7.0}
      |]""".stripMargin

  test("detection: > 5% regression flags, <= 5% does not, and only " +
      "the matching fitter's prior rows are compared") {
    // exactly +5% is NOT a regression (threshold is exclusive)
    assert(ZonesEval.regressions(prior, "longar",
      Seq("CT" -> 1.05)).isEmpty)
    assert(ZonesEval.regressions(prior, "longar",
      Seq("CT" -> 1.0501)).map(_._1) == Seq("CT"))
    // VT's prior is a sarima row: a longar run must not compare to it
    assert(ZonesEval.regressions(prior, "longar",
      Seq("VT" -> 99.0)).isEmpty)
    assert(ZonesEval.regressions(prior, "sarima",
      Seq("VT" -> 0.9500)).map(_._1) == Seq("VT"))
    // a fitter-less (pre-r7) row counts as longar
    assert(ZonesEval.regressions(prior, "longar",
      Seq("ME" -> 2.2)).map(_._1) == Seq("ME"))
    assert(ZonesEval.regressions(prior, "sarima",
      Seq("ME" -> 2.2)).isEmpty)
    // an unknown zone has no prior: never flagged
    assert(ZonesEval.regressions(prior, "longar",
      Seq("RI" -> 99.0)).isEmpty)
  }
}
