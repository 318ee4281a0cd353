package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.arima._
import graft.forecast.Forecast
import graft.eval.Metrics

/** Property-based checks for the model math (SURVEY.md §5: fit
  * recovery, pi-weight summability, metric identities, interval
  * monotonicity).
  */
object ArimaProps extends Properties("arima") {

  private val phiGen = Gen.choose(-0.95, 0.95)
  private val thetaGen = Gen.choose(-0.95, 0.95)

  property("pi expansion reconstructs AR poly through MA poly") =
    forAll(phiGen, thetaGen) { (phi, theta) =>
      val m = SarimaModel(Array(phi), 0, Array(theta), Array.empty, 0,
        Array.empty, 1, 0.0, 0.0, 1.0, 100)
      val ar = Sarima2Ar.toAr(m, 200)
      val recon = Polynomial.multiply(1.0 +: ar.pi.map(-_),
        Array(1.0, theta))
      val want = Array(1.0, -phi)
      // leading coefficients must match; the rest is truncation tail
      math.abs(recon(0) - want(0)) < 1e-9 &&
        math.abs(recon(1) - want(1)) < 1e-9 &&
        (2 until 50).forall(i => math.abs(recon(i)) < 1e-6)
    }

  property("invertible MA gives summable pi weights") =
    forAll(Gen.choose(-0.9, 0.9)) { theta =>
      val m = SarimaModel(Array.empty, 0, Array(theta), Array.empty, 0,
        Array.empty, 1, 0.0, 0.0, 1.0, 100)
      val ar = Sarima2Ar.toAr(m, 400)
      math.abs(ar.pi(399)) < 0.05 // geometric decay
    }

  property("psi weights of AR(1) are phi^j") =
    forAll(phiGen) { phi =>
      val psi = Forecast.psiWeights(Array(phi), 20)
      (0 until 20).forall(j => math.abs(psi(j) - math.pow(phi, j)) < 1e-9)
    }

  property("divideSeries inverts multiply") =
    forAll(Gen.listOfN(4, Gen.choose(-0.5, 0.5)),
      Gen.listOfN(3, Gen.choose(-0.4, 0.4))) { (a0, b0) =>
      val a = (1.0 +: a0).toArray
      val b = (1.0 +: b0).toArray
      val prod = Polynomial.multiply(a, b)
      val back = Polynomial.divideSeries(prod, b, a.length)
      a.indices.forall(i => math.abs(back(i) - a(i)) < 1e-9)
    }

  property("forecast intervals widen with level") =
    forAll(phiGen, Gen.choose(0.5, 10.0)) { (phi, sigma2) =>
      val model = ArLinearModel(0.0, 0.0, Array(phi), sigma2, 100)
      val x = Array.tabulate(50)(i => math.sin(i * 0.3))
      val fc = Forecast.forecast(model, x, 10, Array(80, 95))
      (0 until 10).forall { i =>
        fc.upper(1)(i) - fc.lower(1)(i) >=
          fc.upper(0)(i) - fc.lower(0)(i)
      }
    }

  property("forecast s.e. is non-decreasing in horizon") =
    forAll(phiGen) { phi =>
      val model = ArLinearModel(0.0, 0.0, Array(phi), 1.0, 100)
      val x = Array.fill(30)(1.0)
      val fc = Forecast.forecast(model, x, 15, Array(95))
      (1 until 15).forall(i => fc.se(i) >= fc.se(i - 1) - 1e-12)
    }

  property("MASE of seasonal-naive on train is exactly 1 in mean") =
    forAll(Gen.choose(2, 12), Gen.choose(1L, 10000L)) { (m, seed) =>
      val rnd = new scala.util.Random(seed)
      val train = Array.fill(m * 20)(rnd.nextDouble() * 100)
      val preds = Array.tabulate(train.length - m)(i => train(i))
      val tests = Array.tabulate(train.length - m)(i => train(i + m))
      val mase = Metrics.mean(Metrics.mase(train, tests, preds, m))
      math.abs(mase - 1.0) < 1e-9
    }

  property("Yule-Walker AR(1) estimate stays in the stationary region") =
    forAll(Gen.choose(-0.9, 0.9), Gen.choose(1L, 1000L)) { (phi, seed) =>
      val rnd = new scala.util.Random(seed)
      val n = 2000
      val x = new Array[Double](n)
      var t = 1
      while (t < n) { x(t) = phi * x(t - 1) + rnd.nextGaussian(); t += 1 }
      val (phis, _) = ArFit.levinsonDurbin(ArFit.autocovariances(x, 1), 1)
      math.abs(phis(1)(0)) < 1.0
    }

  property("Kalman AR(1) innovation variance converges to 1") =
    forAll(phiGen) { phi =>
      val y = Array.tabulate(80)(t => math.sin(t * 0.7) + 0.1 * t % 3)
      Kalman.innovations(y, 0.0, Array(phi), Array.empty) match {
        case Some((_, f)) =>
          math.abs(f(0) - 1.0 / (1.0 - phi * phi)) < 1e-6 &&
            math.abs(f(79) - 1.0) < 1e-6
        case None => false
      }
    }

  property("Kalman exact likelihood is finite for stationary ARMA(1,1)") =
    forAll(phiGen, thetaGen) { (phi, theta) =>
      val e = Array.tabulate(121)(t => math.cos(t * 1.3))
      val y = Array.tabulate(120)(t =>
        e(t + 1) + theta * e(t) + (if (t > 0) phi * e(t) else 0.0))
      val ll = Kalman.negTwoLogLik(y, 0.0, Array(phi), Array(theta))
      !ll.isNaN && !ll.isInfinite
    }
}
