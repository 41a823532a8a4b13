package graft.core

import org.scalatest.funsuite.AnyFunSuite
import S2DistancePredicates.Excluded

/** Golden cases for EdgeCircumcenterSign and GetVoronoiSiteExclusion,
  * ported from the reference's coverage tests
  * (/root/reference/src/s2/s2predicates_test.cc:1395-1547,1549-1700).
  * Cases the reference resolves in the long-double tier resolve here in
  * the exact tier; final values are identical. */
class S2CircumcenterVoronoiSpec extends AnyFunSuite {
  private val Eps = 2.220446049250313e-16

  private def n(x: Double, y: Double, z: Double): V3 = {
    val p = V3(x, y, z)
    if (math.abs(p.norm2 - 1.0) <= 5 * Eps) p else p.normalize
  }

  private def checkCircum(x0: V3, x1: V3, a: V3, b: V3, c: V3, want: Int): Unit =
    assert(S2DistancePredicates.edgeCircumcenterSign(x0, x1, a, b, c) == want,
      s"edgeCircumcenterSign($x0,$x1,$a,$b,$c)")

  test("EdgeCircumcenterSign coverage (test.cc:1436-1474)") {
    checkCircum(n(1, 0, 0), n(1, 1, 0),
      n(0, 0, 1), n(1, 0, 1), n(0, 1, 1), 1)
    checkCircum(n(1, 0, 0), n(1, 1, 0),
      n(0, 0, -1), n(1, 0, -1), n(0, 1, -1), -1)
    checkCircum(n(1, -1, 0), n(1, 1, 0),
      n(1, -1e-5, 1), n(1, 1e-5, -1), n(1, 1 - 1e-5, 1e-5), -1)
    checkCircum(n(1, -1, 0), n(1, 1, 0),
      n(1, -1e-5, 1), n(1, 1e-5, -1), n(1, 1 - 1e-9, 1e-5), -1)
    checkCircum(n(1, -1, 0), n(1, 1, 0),
      n(1, -1e-5, 1), n(1, 1e-5, -1), n(1, 1 - 1e-15, 1e-5), -1)
    // symbolic tiers
    checkCircum(n(1, -1, 0), n(1, 1, 0),
      n(1, -1e-5, 1), n(1, 1e-5, -1), n(1, 1, 1e-5), 1)
    checkCircum(n(1, -1, 0), n(1, 1, 0),
      n(0, -1, 0), n(0, 0, -1), n(0, 0, 1), -1)
    checkCircum(n(0, -1, 1), n(0, 1, 1),
      n(0, 1, 0), n(0, -1, 0), n(1, 0, 0), -1)
  }

  private def rad(r: Double): Double = S1ChordAngle.fromRadians(r)

  private def checkVoronoi(a: V3, b: V3, x0: V3, x1: V3, r2: Double,
                           want: Excluded): Unit = {
    assert(S2DistancePredicates.voronoiSiteExclusion(a, b, x0, x1, r2) == want,
      s"voronoi($a,$b)")
    // swapping the sites swaps FIRST and SECOND (reference harness does
    // the same symmetric check) — valid only when the swapped preconditions
    // hold, i.e. b is strictly closer to x0
    if (S2DistancePredicates.compareDistances(x0, b, a) < 0) {
      val swapped = want match {
        case Excluded.First => Excluded.Second
        case Excluded.Second => Excluded.First
        case other => other
      }
      assert(S2DistancePredicates.voronoiSiteExclusion(b, a, x0, x1, r2) == swapped,
        s"voronoi swapped($b,$a)")
    }
  }

  test("VoronoiSiteExclusion coverage (test.cc:1600-1700)") {
    // both sites closest to X0 / X1
    checkVoronoi(n(1, -1e-5, 0), n(1, -2e-5, 0),
      n(1, 0, 0), n(1, 1, 0), rad(1e-3), Excluded.Second)
    checkVoronoi(V3(1, 1, 1e-30).normalize, V3(1, 1, -1e-20).normalize,
      n(1, 0, 0), n(1, 1, 0), rad(1e-10), Excluded.Second)
    // neither excluded
    checkVoronoi(n(1, -1e-10, 1e-5), n(1, 1e-10, -1e-5),
      n(1, -1, 0), n(1, 1, 0), rad(1e-4), Excluded.Neither)
    checkVoronoi(n(1, -1e-10, 1e-5), n(1, 1e-10, -1e-5),
      n(1, -1, 0), n(1, 1, 0), rad(1e-5), Excluded.Neither)
    checkVoronoi(n(1, -1e-17, 1e-5), n(1, 1e-17, -1e-5),
      n(1, -1, 0), n(1, 1, 0), rad(1e-4), Excluded.Neither)
    checkVoronoi(n(1, -1e-20, 1e-5), n(1, 1e-20, -1e-5),
      n(1, -1, 0), n(1, 1, 0), rad(1e-5), Excluded.Neither)
    // first site excluded
    checkVoronoi(n(1, -1e-6, 1.0049999999e-5), n(1, 0, -1e-5),
      n(1, -1, 0), n(1, 1, 0), rad(1.005e-5), Excluded.First)
    checkVoronoi(n(1, -1.00105e-6, 1.0049999999e-5), n(1, 0, -1e-5),
      n(1, -1, 0), n(1, 1, 0), rad(1.005e-5), Excluded.First)
    checkVoronoi(n(1, -1e-6, 1.005e-5), n(1, 0, -1e-5),
      n(1, -1, 0), n(1, 1, 0), rad(1.005e-5), Excluded.First)
    checkVoronoi(n(1, -1e-31, 1.005e-30), n(1, 0, -1e-30),
      n(1, -1, 0), n(1, 1, 0), rad(1.005e-30), Excluded.First)
  }

  test("VoronoiSiteExclusion d < 0 cases (test.cc long-edge section)") {
    // Pi/2 < d(X0,X1) + r < Pi, one site kept
    checkVoronoi(n(1, -1e-5, 1e-4), n(1, -1.00000001e-5, 0),
      n(-1, -1, 0), n(1, 0, 0), rad(1), Excluded.First)
    checkVoronoi(n(1, 1e-10, 0.1), n(1, -1e-10, 1e-8),
      n(-1, -1, 0), n(1, 0, 0), rad(1), Excluded.First)
    checkVoronoi(n(1, 2e-10, 0.1), n(1, 1e-10, 0),
      n(-1, -1, 0), n(1, 0, 0), rad(1), Excluded.First)
    checkVoronoi(n(1, 1.1, 0), n(1, 1.01, 0.01),
      n(-1, -1, 0), n(1, 0, 0), rad(1), Excluded.First)
    // d(X0,X1) + r > Pi, sin(d) < 0 handled before cos(d) < 0
    checkVoronoi(n(1, 1.1, 0), n(1, -1, 0),
      n(-1, 0, 0), n(1, -1e-10, 0), S1ChordAngle.fromDegrees(70), Excluded.First)
    // both kept
    checkVoronoi(n(-1, 0.1, 0.001), n(1, 1.1, 0),
      n(-1, -1, 0), n(1, 0, 0), rad(1), Excluded.Neither)
  }
}
