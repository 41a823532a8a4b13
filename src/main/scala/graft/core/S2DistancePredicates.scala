package graft.core

import java.math.{BigDecimal => BigD}
import S2Predicates.{XV3, toExact}

/** Exact distance-comparison predicates — the reference's
  * CompareDistances / CompareDistance / CompareEdgeDistance /
  * CompareEdgePairDistance / CompareEdgeDirections ladder
  * (/root/reference/src/s2/s2predicates.h:103-314, .cc:316-800)
  * re-expressed in Scala: a double-precision triage tier with certified
  * error bounds, falling through to exact BigDecimal arithmetic (closed
  * under +,-,× — all the exact tier needs), and symbolic perturbation for
  * CompareDistances so the result is non-zero whenever A != B.
  *
  * The JVM has no long double, so the reference's optional long-double
  * middle tier is skipped (the reference itself supports
  * kHasLongDouble=false); results are still exact because every uncertain
  * triage falls through to the BigDecimal tier.
  *
  * All results are "as if reprojected to the unit sphere" — identical to
  * the reference's guarantees, so kNN / closest-edge ties resolve exactly
  * the way the reference resolves them.
  */
object S2DistancePredicates {
  private val DblErr = 1.1102230246251565e-16 // DBL_ERR = epsilon/2
  private val Sqrt3 = math.sqrt(3.0)
  // S1ChordAngle(45 degrees).length2
  private val K45Len2 = S1ChordAngle.fromDegrees(45.0)

  // ---- lexicographic point order (reference S2Point operator<) ----------
  private def lexCompare(a: V3, b: V3): Int = {
    if (a.x != b.x) return if (a.x < b.x) -1 else 1
    if (a.y != b.y) return if (a.y < b.y) -1 else 1
    if (a.z != b.z) return if (a.z < b.z) -1 else 1
    0
  }

  // ---- cos / sin^2 distance measures with certified error ----------------
  // (s2predicates.cc:316-351)
  @inline private def cosDistance(x: V3, y: V3): (Double, Double) = {
    val c = x.dot(y)
    (c, 9.5 * DblErr * math.abs(c) + 1.5 * DblErr)
  }

  @inline private def sin2Distance(x: V3, y: V3): (Double, Double) = {
    val n = (x - y).cross(x + y)
    val d2 = 0.25 * n.norm2
    val err = (21 + 4 * Sqrt3) * DblErr * d2 +
      32 * Sqrt3 * DblErr * DblErr * math.sqrt(d2) +
      768 * DblErr * DblErr * DblErr * DblErr
    (d2, err)
  }

  // ---- CompareDistances(x, a, b): sign of AX - BX ------------------------
  private def triageCompareCosDistances(x: V3, a: V3, b: V3): Int = {
    val (cosAx, cosAxErr) = cosDistance(a, x)
    val (cosBx, cosBxErr) = cosDistance(b, x)
    val diff = cosAx - cosBx
    val error = cosAxErr + cosBxErr
    if (diff > error) -1 else if (diff < -error) 1 else 0
  }

  private def triageCompareSin2Distances(x: V3, a: V3, b: V3): Int = {
    val (sin2Ax, sin2AxErr) = sin2Distance(a, x)
    val (sin2Bx, sin2BxErr) = sin2Distance(b, x)
    val diff = sin2Ax - sin2Bx
    val error = sin2AxErr + sin2BxErr
    if (diff > error) 1 else if (diff < -error) -1 else 0
  }

  private def norm2(p: XV3): BigD = p.dot(p)

  private def exactCompareDistances(x: XV3, a: XV3, b: XV3): Int = {
    // tests x·normalize(a) < x·normalize(b) reformulated without division
    // (s2predicates.cc:393-411)
    val cosAx = x.dot(a)
    val cosBx = x.dot(b)
    val aSign = cosAx.signum(); val bSign = cosBx.signum()
    if (aSign != bSign) return if (aSign > bSign) -1 else 1
    val cmp = cosBx.multiply(cosBx).multiply(norm2(a))
      .subtract(cosAx.multiply(cosAx).multiply(norm2(b)))
    aSign * cmp.signum()
  }

  /** Symbolic tie-break: pedestal model — lexicographically smaller points
    * sit on higher pedestals, so if a < b then AX > BX
    * (s2predicates.cc:414-434). */
  private def symbolicCompareDistances(a: V3, b: V3): Int = {
    val c = lexCompare(a, b)
    if (c < 0) 1 else if (c > 0) -1 else 0
  }

  /** -1/0/+1 as AX < / == / > BX; non-zero whenever a != b (symbolic
    * perturbation), self-consistent across calls. */
  def compareDistances(x: V3, a: V3, b: V3): Int = {
    var sign = triageCompareCosDistances(x, a, b)
    if (sign != 0) return sign
    if (a == b) return 0
    val cosAx = a.dot(x)
    if (cosAx > math.sqrt(0.5)) sign = triageCompareSin2Distances(x, a, b)
    else if (cosAx < -math.sqrt(0.5)) sign = -triageCompareSin2Distances(x, a, b)
    if (sign != 0) return sign
    sign = exactCompareDistances(toExact(x), toExact(a), toExact(b))
    if (sign != 0) return sign
    symbolicCompareDistances(a, b)
  }

  // ---- CompareDistance(x, y, r): sign of XY - r --------------------------
  private def triageCompareCosDistance(x: V3, y: V3, r2: Double): Int = {
    val (cosXy, cosXyErr) = cosDistance(x, y)
    val cosR = 1 - 0.5 * r2
    val cosRErr = 2 * DblErr * cosR
    val diff = cosXy - cosR
    val error = cosXyErr + cosRErr
    if (diff > error) -1 else if (diff < -error) 1 else 0
  }

  private def triageCompareSin2Distance(x: V3, y: V3, r2: Double): Int = {
    // only valid for r < 90 degrees
    val (sin2Xy, sin2XyErr) = sin2Distance(x, y)
    val sin2R = r2 * (1 - 0.25 * r2)
    val sin2RErr = 3 * DblErr * sin2R
    val diff = sin2Xy - sin2R
    val error = sin2XyErr + sin2RErr
    if (diff > error) 1 else if (diff < -error) -1 else 0
  }

  private def exactCompareDistance(x: XV3, y: XV3, r2: BigD): Int = {
    // compares cos(XY) against cos(r) without division
    // (s2predicates.cc:505-521)
    val cosXy = x.dot(y)
    val cosR = BigD.ONE.subtract(r2.multiply(new BigD(0.5)))
    val xySign = cosXy.signum(); val rSign = cosR.signum()
    if (xySign != rSign) return if (xySign > rSign) -1 else 1
    val cmp = cosR.multiply(cosR).multiply(norm2(x)).multiply(norm2(y))
      .subtract(cosXy.multiply(cosXy))
    xySign * cmp.signum()
  }

  /** -1/0/+1 as XY < / == / > r (r = squared chord length). */
  def compareDistance(x: V3, y: V3, r2: Double): Int = {
    var sign = triageCompareCosDistance(x, y, r2)
    if (sign != 0) return sign
    if (r2 == 0 && x == y) return 0
    if (r2 < K45Len2) {
      sign = triageCompareSin2Distance(x, y, r2)
      if (sign != 0) return sign
    }
    exactCompareDistance(toExact(x), toExact(y), new BigD(r2))
  }

  // combined double-precision triage used inside edge-distance triage
  private def triageCompareDistance(x: V3, y: V3, r2: Double): Int = {
    var sign = triageCompareCosDistance(x, y, r2)
    if (sign == 0 && r2 < K45Len2) sign = triageCompareSin2Distance(x, y, r2)
    sign
  }

  // ---- CompareEdgeDistance(x, a0, a1, r) ---------------------------------
  // (s2predicates.cc:563-706)
  private def triageCompareLineSin2Distance(x: V3, a0: V3, a1: V3, r2: Double,
                                            n: V3, n1: Double, n2: Double): Int = {
    if (r2 >= 2.0) return -1 // distance to edge interior < 90 deg <= limit
    val n2sin2R0 = n2 * r2 * (1 - 0.25 * r2)
    var n2sin2RErr = 6 * DblErr * n2sin2R0
    val (closest, ax2) = closestVertex(x, a0, a1)
    val xDn = (x - closest).dot(n)
    val xDn2 = xDn * xDn
    val c1 = ((3.5 + 2 * Sqrt3) * n1 + 32 * Sqrt3 * DblErr) * DblErr * math.sqrt(ax2)
    val xDn2Err = 4 * DblErr * xDn2 + (2 * math.abs(xDn) + c1) * c1
    // double precision: x is unit to within 4 * DBL_ERR
    n2sin2RErr += 8 * DblErr * n2sin2R0
    val diff = xDn2 - n2sin2R0
    val error = xDn2Err + n2sin2RErr
    if (diff > error) 1 else if (diff < -error) -1 else 0
  }

  private def triageCompareLineCos2Distance(x: V3, a0: V3, a1: V3, r2: Double,
                                            n: V3, n1: Double, n2: Double): Int = {
    if (r2 >= 2.0) return -1
    val cosR = 1 - 0.5 * r2
    val n2cos2R0 = n2 * cosR * cosR
    var n2cos2RErr = 7 * DblErr * n2cos2R0
    val m2 = x.cross(n).norm2
    val m1 = math.sqrt(m2)
    val m1Err = ((1 + 8 / Sqrt3) * n1 + 32 * Sqrt3 * DblErr) * DblErr
    val m2Err = 3 * DblErr * m2 + (2 * m1 + m1Err) * m1Err
    n2cos2RErr += 8 * DblErr * n2cos2R0
    val diff = m2 - n2cos2R0
    val error = m2Err + n2cos2RErr
    if (diff > error) -1 else if (diff < -error) 1 else 0
  }

  private def closestVertex(x: V3, a0: V3, a1: V3): (V3, Double) = {
    val a0x2 = (a0 - x).norm2
    val a1x2 = (a1 - x).norm2
    if (a0x2 < a1x2 || (a0x2 == a1x2 && lexCompare(a0, a1) < 0)) (a0, a0x2)
    else (a1, a1x2)
  }

  private def triageCompareLineDistance(x: V3, a0: V3, a1: V3, r2: Double,
                                        n: V3, n1: Double, n2: Double): Int =
    if (r2 < K45Len2) triageCompareLineSin2Distance(x, a0, a1, r2, n, n1, n2)
    else triageCompareLineCos2Distance(x, a0, a1, r2, n, n1, n2)

  private def triageCompareEdgeDistance(x: V3, a0: V3, a1: V3, r2: Double): Int = {
    // decide endpoint-vs-interior via the perpendicular plane through x
    val n = (a0 - a1).cross(a0 + a1)
    val m = n.cross(x)
    val a0Dir = a0 - x
    val a1Dir = a1 - x
    val a0Sign = a0Dir.dot(m)
    val a1Sign = a1Dir.dot(m)
    val n2 = n.norm2
    val n1 = math.sqrt(n2)
    val n1Err = ((3.5 + 8 / Sqrt3) * n1 + 32 * Sqrt3 * DblErr) * DblErr
    val a0SignErr = n1Err * math.sqrt(a0Dir.norm2)
    val a1SignErr = n1Err * math.sqrt(a1Dir.norm2)
    if (a0Sign < a0SignErr && a1Sign > -a1SignErr) {
      if (a0Sign > -a0SignErr || a1Sign < a1SignErr) {
        // uncertain endpoint-vs-interior: both must agree, else fall through
        val vertexSign = math.min(triageCompareDistance(x, a0, r2),
          triageCompareDistance(x, a1, r2))
        val lineSign = triageCompareLineDistance(x, a0, a1, r2, n, n1, n2)
        if (vertexSign == lineSign) lineSign else 0
      } else triageCompareLineDistance(x, a0, a1, r2, n, n1, n2)
    } else {
      math.min(triageCompareDistance(x, a0, r2),
        triageCompareDistance(x, a1, r2))
    }
  }

  /** Exact sign of (a0 x a1)·(b0 x b1) — CompareEdgeDirections without the
    * triage tier (used only on the already-rare exact path; also exposed
    * for direct use). Does not use symbolic perturbation. */
  def compareEdgeDirections(a0: V3, a1: V3, b0: V3, b1: V3): Int = {
    val na = toExact(a0).cross(toExact(a1))
    val nb = toExact(b0).cross(toExact(b1))
    na.dot(nb).signum()
  }

  /** Exact sign of a·b (reference SignDotProd; REQUIRES |a|^2, |b|^2 <= 2). */
  def signDotProd(a: V3, b: V3): Int = {
    val d = a.dot(b)
    // conservative triage: 3-term dot product rounding bound
    val err = 4 * DblErr * (math.abs(a.x * b.x) + math.abs(a.y * b.y) +
      math.abs(a.z * b.z))
    if (math.abs(d) > err) { if (d > 0) 1 else -1 }
    else toExact(a).dot(toExact(b)).signum()
  }

  // REQUIRES: closest point to x is in the interior of (a0, a1)
  private def exactCompareLineDistance(x: XV3, a0: XV3, a1: XV3, r2d: Double): Int = {
    if (r2d >= 2.0) return -1
    val r2 = new BigD(r2d)
    val n = a0.cross(a1)
    val sinD = x.dot(n)
    val sin2R = r2.multiply(BigD.ONE.subtract(r2.multiply(new BigD(0.25))))
    val cmp = sinD.multiply(sinD)
      .subtract(sin2R.multiply(norm2(x)).multiply(norm2(n)))
    cmp.signum()
  }

  private def exactCompareEdgeDistance(x: V3, a0: V3, a1: V3, r2: Double): Int = {
    // endpoint-vs-interior decided exactly; the line-distance itself is the
    // only part always evaluated in exact arithmetic
    if (a0 != -x && a1 != -x &&
        compareEdgeDirections(a0, a1, a0, x) > 0 &&
        compareEdgeDirections(a0, a1, x, a1) > 0) {
      exactCompareLineDistance(toExact(x), toExact(a0), toExact(a1), r2)
    } else {
      math.min(compareDistance(x, a0, r2), compareDistance(x, a1, r2))
    }
  }

  /** -1/0/+1 as d(x, edge a0a1) < / == / > r (r = squared chord length).
    * REQUIRES a0 != -a1 (no antipodal edges). */
  def compareEdgeDistance(x: V3, a0: V3, a1: V3, r2: Double): Int = {
    val sign = triageCompareEdgeDistance(x, a0, a1, r2)
    if (sign != 0) return sign
    if (a0 == a1) return compareDistance(x, a0, r2)
    exactCompareEdgeDistance(x, a0, a1, r2)
  }

  /** -1/0/+1 as d(edge A, edge B) < / == / > r (r = squared chord). */
  def compareEdgePairDistance(a0: V3, a1: V3, b0: V3, b1: V3, r2: Double): Int = {
    // crossing or shared endpoint -> distance zero (UpdateEdgePairMinDistance)
    if (S2EdgeCrossings.crossingSign(a0, a1, b0, b1) >= 0) {
      return if (r2 > 0) -1 else if (r2 < 0) 1 else 0
    }
    math.min(
      math.min(compareEdgeDistance(a0, b0, b1, r2),
        compareEdgeDistance(a1, b0, b1, r2)),
      math.min(compareEdgeDistance(b0, a0, a1, r2),
        compareEdgeDistance(b1, a0, a1, r2)))
  }
}
