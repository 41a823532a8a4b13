package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases ported from the reference's own predicate coverage tests
  * (/root/reference/src/s2/s2predicates_test.cc:605-860): every
  * double/exact/symbolic tier is exercised. The long-double tier does not
  * exist on the JVM, so cases the reference resolves at long-double
  * precision resolve here in the exact tier — final signs are identical. */
class S2DistancePredicatesSpec extends AnyFunSuite {
  private val Eps = 2.220446049250313e-16 // DBL_EPSILON

  // mirror the reference harness: normalize only when not unit length, so
  // points differing only in magnitude stay unnormalized
  private def n(x: Double, y: Double, z: Double): V3 = {
    val p = V3(x, y, z)
    if (math.abs(p.norm2 - 1.0) <= 5 * Eps) p else p.normalize
  }

  private def rad(r: Double): Double = S1ChordAngle.fromRadians(r)

  private def checkCompareDistances(x: V3, a: V3, b: V3, want: Int): Unit = {
    assert(S2DistancePredicates.compareDistances(x, a, b) == want,
      s"compareDistances($x, $a, $b)")
    assert(S2DistancePredicates.compareDistances(x, b, a) == -want,
      "reversal must negate")
  }

  test("CompareDistances coverage (s2predicates_test.cc:638-694)") {
    // TriageCompareSin2Distances tier
    checkCompareDistances(n(1, 1, 1), n(1, 1 - 1e-15, 1), n(1, 1, 1 + 2e-15), -1)
    checkCompareDistances(n(1, 1, 0), n(1, 1 - 1e-15, 1e-21), n(1, 1 - 1e-15, 0), 1)
    checkCompareDistances(n(2, 0, 0), n(2, -1, 0), n(2, 1, 1e-8), -1)
    checkCompareDistances(n(2, 0, 0), n(2, -1, 0), n(2, 1, 1e-100), -1)
    checkCompareDistances(n(1, 0, 0), n(1, -1, 0), n(1, 1, 0), 1) // symbolic
    checkCompareDistances(n(1, 0, 0), n(1, 0, 0), n(1, 0, 0), 0)
    // TriageCompareCosDistances tier
    checkCompareDistances(n(1, 1, 1), n(1, -1, 0), n(-1, 1, 3e-15), 1)
    checkCompareDistances(n(1, 0, 0), n(1, 1e-30, 0), n(-1, 1e-40, 0), -1)
    checkCompareDistances(n(1, 1, 1), n(1, -1, 0), n(-1, 1, 3e-18), 1)
    checkCompareDistances(n(1, 1, 1), n(1, -1, 0), n(-1, 1, 1e-100), 1)
    checkCompareDistances(n(1, 1, 1), n(1, -1, 0), n(-1, 1, 0), -1) // symbolic
    checkCompareDistances(n(1, 1, 1), n(1, -1, 0), n(1, -1, 0), 0)
    // distances greater than 90 degrees (negated sin2 path)
    checkCompareDistances(n(1, 1, 0), n(-1, -1 + 1e-15, 0), n(-1, -1, 0), -1)
    checkCompareDistances(n(-1, -1, 0), n(1, 1 - 1e-15, 0), n(1, 1 - 1e-15, 1e-21), 1)
    checkCompareDistances(n(-1, -1, 0), n(2, 1, 0), n(2, 1, 1e-8), 1)
    checkCompareDistances(n(-1, -1, 0), n(2, 1, 0), n(2, 1, 1e-30), 1)
    checkCompareDistances(n(-1, -1, 0), n(2, 1, 0), n(1, 2, 0), -1) // symbolic
  }

  private def checkCompareDistance(x: V3, y: V3, r2: Double, want: Int): Unit =
    assert(S2DistancePredicates.compareDistance(x, y, r2) == want,
      s"compareDistance($x, $y, $r2)")

  test("CompareDistance coverage (s2predicates_test.cc:728-760)") {
    // TriageCompareSin2Distance tier
    checkCompareDistance(n(1, 1, 1), n(1, 1 - 1e-15, 1), rad(1e-15), -1)
    checkCompareDistance(n(1, 0, 0), n(1, 1, 0), rad(math.Pi / 4), -1)
    checkCompareDistance(V3(1, 1e-40, 0), V3(1 + Eps, 1e-40, 0),
      rad(0.9 * Eps * 1e-40), 1)
    checkCompareDistance(V3(1, 1e-40, 0), V3(1 + Eps, 1e-40, 0),
      rad(1.1 * Eps * 1e-40), -1)
    checkCompareDistance(V3(1, 0, 0), V3(1 + Eps, 0, 0), 0.0, 0)
    // TriageCompareCosDistance tier
    checkCompareDistance(n(1, 0, 0), n(1, 1e-8, 0), rad(1e-7), -1)
    checkCompareDistance(n(1, 0, 0), n(-1, 1e-8, 0), rad(math.Pi - 1e-7), 1)
    checkCompareDistance(n(1, 1, 0), n(1, -1 - 2 * Eps, 0), S1ChordAngle.Right, 1)
    checkCompareDistance(n(1, 1, 0), n(1, -1 - Eps, 0), S1ChordAngle.Right, 1)
    checkCompareDistance(n(1, 1, 0), n(1, -1, 1e-30), S1ChordAngle.Right, 0)
    // exactly 60 degrees
    checkCompareDistance(n(1, 1, 0), n(0, 1, 1), 1.0, 0)
  }

  private def checkCompareEdgeDistance(x: V3, a0: V3, a1: V3, r2: Double,
                                       want: Int): Unit =
    assert(S2DistancePredicates.compareEdgeDistance(x, a0, a1, r2) == want,
      s"compareEdgeDistance($x, $a0, $a1, $r2)")

  test("CompareEdgeDistance coverage (s2predicates_test.cc:788-846)") {
    // TriageCompareLineSin2Distance tier
    checkCompareEdgeDistance(n(1, 1e-10, 1e-15), n(1, 0, 0), n(0, 1, 0),
      rad(1e-15 + Eps), -1)
    checkCompareEdgeDistance(n(1, 1, 1e-15), n(1, 0, 0), n(0, 1, 0),
      rad(1e-15 + Eps), -1)
    checkCompareEdgeDistance(n(1, 1, 1e-40), n(1, 0, 0), n(0, 1, 0),
      rad(1e-40), -1)
    checkCompareEdgeDistance(n(1, 1, 0), n(1, 0, 0), n(0, 1, 0), 0.0, 0)
    // TriageCompareLineCos2Distance tier
    checkCompareEdgeDistance(n(1e-15, 0, 1), n(1, 0, 0), n(0, 1, 0),
      rad(math.Pi / 2 - 1e-15 - 3 * Eps), 1)
    checkCompareEdgeDistance(n(1e-15, 0, 1), n(1, 0, 0), n(0, 1, 0),
      rad(math.Pi / 2 - 1e-15 - Eps), 1)
    checkCompareEdgeDistance(n(1e-40, 0, 1), n(1, 0, 0), n(0, 1, 0),
      S1ChordAngle.Right, -1)
    checkCompareEdgeDistance(n(0, 0, 1), n(1, 0, 0), n(0, 1, 0),
      S1ChordAngle.Right, 0)
    // closest point is an edge endpoint
    checkCompareEdgeDistance(n(1e-15, -1, 0), n(1, 0, 0), n(1, 1, 0),
      S1ChordAngle.Right, -1)
    checkCompareEdgeDistance(n(-1, -1, 1), n(1, 0, 0), n(1, 1, 0),
      S1ChordAngle.Right, 1)
    checkCompareEdgeDistance(n(1e-18, -1, 0), n(1, 0, 0), n(1, 1, 0),
      S1ChordAngle.Right, -1)
    checkCompareEdgeDistance(n(1e-100, -1, 0), n(1, 0, 0), n(1, 1, 0),
      S1ChordAngle.Right, -1)
    checkCompareEdgeDistance(n(0, -1, 0), n(1, 0, 0), n(1, 1, 0),
      S1ChordAngle.Right, 0)
    // x == -a0 or x == -a1
    checkCompareEdgeDistance(n(-1, 0, 0), n(1, 0, 0), n(1, 1, 0),
      S1ChordAngle.Right, 1)
    checkCompareEdgeDistance(n(-1, 0, 0), n(1, 0, 0), n(1e-18, 1, 0),
      S1ChordAngle.Right, 1)
    checkCompareEdgeDistance(n(-1, 0, 0), n(1, 0, 0), n(1e-100, 1, 0),
      S1ChordAngle.Right, 1)
    checkCompareEdgeDistance(n(0, -1, 0), n(1, 0, 0), n(0, 1, 0),
      S1ChordAngle.Right, 0)
  }

  test("CompareEdgePairDistance coverage (s2predicates_test.cc:848-886)") {
    import S2DistancePredicates.compareEdgePairDistance
    val x = V3(1, 0, 0); val y = V3(0, 1, 0); val z = V3(0, 0, 1)
    val a = V3(1, 1e-100, 1e-99); val b = V3(1, 1e-100, -1e-99)
    // interior crossing
    assert(compareEdgePairDistance(x, y, a, b, 0.0) == 0)
    assert(compareEdgePairDistance(x, y, a, b, rad(1)) == -1)
    assert(compareEdgePairDistance(x, y, a, b, -1.0) == 1)
    // shared endpoint
    assert(compareEdgePairDistance(x, y, x, z, 0.0) == 0)
    assert(compareEdgePairDistance(x, y, z, x, 0.0) == 0)
    assert(compareEdgePairDistance(y, x, x, z, 0.0) == 0)
    assert(compareEdgePairDistance(y, x, z, x, 0.0) == 0)
    // one degenerate edge
    assert(compareEdgePairDistance(x, x, x, y, 0.0) == 0)
    assert(compareEdgePairDistance(x, y, x, x, 0.0) == 0)
    assert(compareEdgePairDistance(x, x, y, z, rad(1)) == 1)
    assert(compareEdgePairDistance(y, z, x, x, rad(1)) == 1)
    // both degenerate
    assert(compareEdgePairDistance(x, x, x, x, 0.0) == 0)
    assert(compareEdgePairDistance(x, x, y, y, rad(1)) == 1)
    // minimum achieved at each endpoint
    val kHi = rad(1e-100 + 1e-115)
    val kLo = rad(1e-100 - 1e-115)
    assert(compareEdgePairDistance(a, y, x, z, kHi) == -1)
    assert(compareEdgePairDistance(a, y, x, z, kLo) == 1)
    assert(compareEdgePairDistance(y, a, x, z, kHi) == -1)
    assert(compareEdgePairDistance(y, a, x, z, kLo) == 1)
    assert(compareEdgePairDistance(x, z, a, y, kHi) == -1)
    assert(compareEdgePairDistance(x, z, a, y, kLo) == 1)
    assert(compareEdgePairDistance(x, z, y, a, kHi) == -1)
    assert(compareEdgePairDistance(x, z, y, a, kLo) == 1)
  }

  test("compareDistances is self-consistent on equidistant triples") {
    // points symmetric about x: exact tier returns 0, symbolic breaks it
    val x = V3(1, 0, 0)
    val a = V3(1, 1, 0).normalize
    val b = V3(1, -1, 0).normalize
    val ab = S2DistancePredicates.compareDistances(x, a, b)
    val ba = S2DistancePredicates.compareDistances(x, b, a)
    assert(ab != 0 && ab == -ba)
  }
}
