package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.GraftRandom

/**
 * ScalaCheck properties over the RNG core (SURVEY.md §5 item 2): bounds
 * for arbitrary (min <= max) pairs including Long extremes, seed
 * determinism, and distribution supports — properties the reference's
 * tests only sample at fixed constants.
 */
object GraftRandomPropertySpec extends Properties("GraftRandom") {

  private val seeds = Gen.chooseNum(Long.MinValue, Long.MaxValue)
  private val longPairs = for {
    a <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    b <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
  } yield if (a <= b) (a, b) else (b, a)

  property("uniform bounds hold for arbitrary ranges incl. extremes") =
    Prop.forAll(seeds, longPairs) { (seed, p) =>
      val rng = new GraftRandom(seed, 0)
      (0 until 50).forall { _ =>
        val v = rng.nextLongInclusive(p._1, p._2)
        v >= p._1 && v <= p._2
      }
    }

  property("same (seed, partition) reproduces; different partition differs") =
    Prop.forAll(seeds) { seed =>
      val a = new GraftRandom(seed, 3)
      val b = new GraftRandom(seed, 3)
      val c = new GraftRandom(seed, 4)
      val sa = Seq.fill(20)(a.nextLong())
      sa == Seq.fill(20)(b.nextLong()) && sa != Seq.fill(20)(c.nextLong())
    }

  property("min > max always throws") =
    Prop.forAll(seeds, longPairs) { (seed, p) =>
      p._1 == p._2 || {
        val rng = new GraftRandom(seed, 0)
        Prop.throws(classOf[IllegalArgumentException]) {
          rng.nextLongInclusive(p._2, p._1)
        }
      }
    }

  property("zipf support is [1, n]") =
    Prop.forAll(seeds, Gen.chooseNum(1L, 1000000L),
        Gen.chooseNum(0.1, 4.0)) { (seed, n, s) =>
      val rng = new GraftRandom(seed, 0)
      (0 until 20).forall { _ =>
        val v = rng.nextZipf(n, s)
        v >= 1L && v <= n
      }
    }

  property("distribution supports: bernoulli/exponential/pareto/poisson/geometric") =
    Prop.forAll(seeds) { seed =>
      val rng = new GraftRandom(seed, 0)
      (0 until 20).forall { _ =>
        !rng.nextBernoulli(0.0) && rng.nextBernoulli(1.0) &&
          rng.nextExponential(2.0) >= 0.0 &&
          rng.nextPareto(1.5, 2.0) >= 1.5 &&
          rng.nextPoisson(3.0) >= 0L &&
          rng.nextGeometric(0.5) >= 0L
      }
    }

  property("degenerate range returns the single value") =
    Prop.forAll(seeds, Gen.chooseNum(Long.MinValue, Long.MaxValue)) {
      (seed, x) => new GraftRandom(seed, 0).nextLongInclusive(x, x) == x
    }

  property("weighted index lands in bounds and never on a zero weight") =
    Prop.forAll(seeds, Gen.nonEmptyListOf(Gen.chooseNum(0.0, 10.0))) {
      (seed, ws0) =>
        // Ensure a positive total; track which indexes are selectable.
        val ws = (1.0 :: ws0).toArray
        val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ws.map(x => x: Any))
        val rng = new GraftRandom(seed, 0)
        (0 until 30).forall { _ =>
          val i = rng.nextWeightedIndex(arr)
          i >= 0 && i < ws.length && ws(i) > 0.0
        }
    }

  property("normal pair: degenerate rho = +-1 collapses to z2 = +-z1; bad rho throws") =
    Prop.forAll(seeds) { seed =>
      val rng = new GraftRandom(seed, 0)
      val plus = rng.nextGaussianPair(1.0)
      val minus = rng.nextGaussianPair(-1.0)
      math.abs(plus.getDouble(1) - plus.getDouble(0)) < 1e-12 &&
        math.abs(minus.getDouble(1) + minus.getDouble(0)) < 1e-12 &&
        Prop.throws(classOf[IllegalArgumentException]) {
          rng.nextGaussianPair(1.5)
        } &&
        Prop.throws(classOf[IllegalArgumentException]) {
          rng.nextGaussianPair(Double.NaN)
        }
    }

  property("normal pair: empirical correlation tracks rho within 5 sigma") =
    Prop.forAll(seeds, Gen.chooseNum(-0.9, 0.9)) { (seed, rho) =>
      val rng = new GraftRandom(seed, 0)
      val n = 20000
      var (sx, sy, sxx, syy, sxy) = (0.0, 0.0, 0.0, 0.0, 0.0)
      (0 until n).foreach { _ =>
        val p = rng.nextGaussianPair(rho)
        val (x, y) = (p.getDouble(0), p.getDouble(1))
        sx += x; sy += y; sxx += x * x; syy += y * y; sxy += x * y
      }
      val corr = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      // Fisher-z sd ~ 1/sqrt(n-3); 5 sigma on the correlation scale.
      math.abs(corr - rho) < 5.0 * (1.0 - rho * rho) / math.sqrt(n - 3.0)
    }

  property("uuid stream is reproducible per (seed, partition) and decorrelated") =
    Prop.forAll(seeds) { seed =>
      val a = new GraftRandom(seed, 3)
      val b = new GraftRandom(seed, 3)
      val c = new GraftRandom(seed, 4)
      val sa = (0 until 10).map(_ => a.nextUuidString())
      val sb = (0 until 10).map(_ => b.nextUuidString())
      val sc = (0 until 10).map(_ => c.nextUuidString())
      sa == sb && sa != sc
    }
}
