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

  // ---- EdgeCircumcenterSign (s2predicates.cc:1086-1345) ------------------
  // Sign(X0, X1, Z) where Z is the circumcenter of triangle ABC, with
  // symbolic perturbations so the result is non-zero unless X or the
  // triangle is degenerate.

  /** Sign without symbolic perturbation (reference UnperturbedSign):
    * triage → stable → exact with perturb=false. */
  private def unperturbedSign(a: V3, b: V3, c: V3): Int = {
    val s = S2Predicates.triageSign(a, b, c, a.cross(b))
    if (s != 0) s else S2Predicates.expensiveSign(a, b, c, perturb = false)
  }

  // circumcenter of CCW triangle ABC (negated for CW), with error bound
  // (s2predicates.cc:1086-1118)
  private def circumcenter(a: V3, b: V3, c: V3): (V3, Double) = {
    val abDiff = a - b; val abSum = a + b
    val bcDiff = b - c; val bcSum = b + c
    val nab = abDiff.cross(abSum)
    val nabLen = math.sqrt(nab.norm2)
    val abLen = math.sqrt(abDiff.norm2)
    val nbc = bcDiff.cross(bcSum)
    val nbcLen = math.sqrt(nbc.norm2)
    val bcLen = math.sqrt(bcDiff.norm2)
    val mab = nab.cross(abSum)
    val mbc = nbc.cross(bcSum)
    val err = ((16 + 24 * Sqrt3) * DblErr +
        8 * DblErr * (abLen + bcLen)) * nabLen * nbcLen +
      128 * Sqrt3 * DblErr * DblErr * (nabLen + nbcLen) +
      3 * 4096 * DblErr * DblErr * DblErr * DblErr
    (mab.cross(mbc), err)
  }

  private def triageEdgeCircumcenterSign(x0: V3, x1: V3, a: V3, b: V3, c: V3,
                                         abcSign: Int): Int = {
    val (z, zErr) = circumcenter(a, b, c)
    val nx = (x0 - x1).cross(x0 + x1)
    val result = abcSign * nx.dot(z)
    val zLen = math.sqrt(z.norm2)
    val nxLen = math.sqrt(nx.norm2)
    val nxErr = ((1 + 2 * Sqrt3) * nxLen + 32 * Sqrt3 * DblErr) * DblErr
    val resultErr = (3 * DblErr * nxLen + nxErr) * zLen + zErr * nxLen
    if (result > resultErr) 1 else if (result < -resultErr) -1 else 0
  }

  private def exactEdgeCircumcenterSign(x0: XV3, x1: XV3, a: XV3, b: XV3,
                                        c: XV3, abcSign: Int): Int = {
    // (s2predicates.cc:1141-1246) — square-root elimination leading to a
    // degree-20 polynomial predicate; BigDecimal is closed under all the
    // operations used
    val nxXf = x0.cross(x1)
    val isDegenerate =
      nxXf.x.signum == 0 && nxXf.y.signum == 0 && nxXf.z.signum == 0
    if (isDegenerate) return 0
    val dab = nxXf.dot(a.cross(b))
    val dbc = nxXf.dot(b.cross(c))
    val dca = nxXf.dot(c.cross(a))
    val abc2 = norm2(a).multiply(dbc.multiply(dbc))
    val bca2 = norm2(b).multiply(dca.multiply(dca))
    val cab2 = norm2(c).multiply(dab.multiply(dab))
    val lhs3Sgn = dab.signum(); val rhs3Sgn = -dbc.signum()
    var lhs2Sgn = math.max(-1, math.min(1, lhs3Sgn - rhs3Sgn))
    if (lhs2Sgn == 0 && lhs3Sgn != 0)
      lhs2Sgn = cab2.subtract(abc2).signum() * lhs3Sgn
    val rhs2Sgn = -dca.signum()
    var result = math.max(-1, math.min(1, lhs2Sgn - rhs2Sgn))
    if (result == 0 && lhs2Sgn != 0) {
      val lhs4Sgn = dab.signum() * dbc.signum()
      val rhs4 = bca2.subtract(cab2).subtract(abc2)
      result = math.max(-1, math.min(1, lhs4Sgn - rhs4.signum()))
      if (result == 0 && lhs4Sgn != 0) {
        result = new BigD(4).multiply(abc2).multiply(cab2)
          .subtract(rhs4.multiply(rhs4)).signum() * lhs4Sgn
      }
      result *= lhs2Sgn
    }
    abcSign * result
  }

  private def symbolicEdgeCircumcenterSign(x0: V3, x1: V3, aArg: V3, bArg: V3,
                                           cArg: V3): Int = {
    // pedestal model: lexicographically smallest triangle vertex has the
    // largest perturbation (s2predicates.cc:1252-1317)
    if (aArg == bArg || bArg == cArg || cArg == aArg) return 0
    var a = aArg; var b = bArg; var c = cArg
    if (lexCompare(b, a) < 0) { val t = a; a = b; b = t }
    if (lexCompare(c, b) < 0) { val t = b; b = c; c = t }
    if (lexCompare(b, a) < 0) { val t = a; a = b; b = t }
    var sign = unperturbedSign(x0, x1, a)
    if (sign != 0) return sign
    sign = unperturbedSign(x0, x1, b)
    if (sign != 0) return sign
    unperturbedSign(x0, x1, c)
  }

  /** +1 if the circumcenter Z of triangle ABC is to the left of edge X,
    * -1 to the right; 0 only for degenerate X or triangle. Uses symbolic
    * perturbations when Z lies exactly on X. REQUIRES x0 != -x1. */
  def edgeCircumcenterSign(x0: V3, x1: V3, a: V3, b: V3, c: V3): Int = {
    val abcSign = S2Predicates.sign(a, b, c)
    var sign = triageEdgeCircumcenterSign(x0, x1, a, b, c, abcSign)
    if (sign != 0) return sign
    if (x0 == x1 || a == b || b == c || c == a) return 0
    sign = exactEdgeCircumcenterSign(toExact(x0), toExact(x1),
      toExact(a), toExact(b), toExact(c), abcSign)
    if (sign != 0) return sign
    symbolicEdgeCircumcenterSign(x0, x1, a, b, c)
  }

  // ---- GetVoronoiSiteExclusion (s2predicates.cc:1348-1697) ---------------
  sealed trait Excluded
  object Excluded {
    case object First extends Excluded
    case object Second extends Excluded
    case object Neither extends Excluded
    case object Uncertain extends Excluded
  }

  private def triageVoronoiSiteExclusion(a: V3, b: V3, x0: V3, x1: V3,
                                         r2: Double): Excluded = {
    import Excluded._
    val n = (x0 - x1).cross(x0 + x1)
    val n2 = n.norm2
    val n1 = math.sqrt(n2)
    val dnErr = ((3.5 + 2 * Sqrt3) * n1 + 32 * Sqrt3 * DblErr) * DblErr
    val cosR = 1 - 0.5 * r2
    val sin2R = r2 * (1 - 0.25 * r2)
    val n2sin2R = n2 * sin2R

    val (closestA, ax2) = closestVertex(a, x0, x1)
    val aDn = (a - closestA).dot(n)
    val aDn2 = aDn * aDn
    val aDnErr = dnErr * math.sqrt(ax2)
    val ra2 = n2sin2R - aDn2
    val ra2Err = (8 * DblErr + 4 * DblErr) * aDn2 +
      (2 * math.abs(aDn) + aDnErr) * aDnErr + 6 * DblErr * n2sin2R
    val minRa2 = ra2 - ra2Err
    if (minRa2 < 0) return Uncertain
    val ra = math.sqrt(ra2)
    val raErr = 1.5 * DblErr * ra + 0.5 * ra2Err / math.sqrt(minRa2)

    val (closestB, bx2) = closestVertex(b, x0, x1)
    val bDn = (b - closestB).dot(n)
    val bDn2 = bDn * bDn
    val bDnErr = dnErr * math.sqrt(bx2)
    val rb2 = n2sin2R - bDn2
    val rb2Err = (8 * DblErr + 4 * DblErr) * bDn2 +
      (2 * math.abs(bDn) + bDnErr) * bDnErr + 6 * DblErr * n2sin2R
    val minRb2 = rb2 - rb2Err
    if (minRb2 < 0) return Uncertain
    val rb = math.sqrt(rb2)
    val rbErr = 1.5 * DblErr * rb + 0.5 * rb2Err / math.sqrt(minRb2)

    val lhs3 = cosR * (rb - ra)
    val absLhs3 = math.abs(lhs3)
    val lhs3Err = cosR * (raErr + rbErr) + 3 * DblErr * absLhs3

    val aXb = (a - b).cross(a + b)
    val aXb1 = math.sqrt(aXb.norm2)
    val sinD = 0.5 * aXb.dot(n)
    val sinDErr = (4 * DblErr + (2.5 + 2 * Sqrt3) * DblErr) * aXb1 * n1 +
      16 * Sqrt3 * DblErr * DblErr * (aXb1 + n1)

    val result = absLhs3 - sinD
    val resultErr = lhs3Err + sinDErr
    if (result < -resultErr) return Neither

    if (sinD < -sinDErr) {
      // d < 0: long-edge / wraparound cases (s2predicates.cc:1498-1527)
      val r90 = S1ChordAngle.Right
      val ca = triageCompareCosDistance(a, x0, r90)
      val cb = triageCompareCosDistance(b, x1, r90)
      if (ca < 0 && cb < 0) return Neither
      if (ca <= 0 && cb <= 0) return Uncertain
      return if (ca > 0) First else Second
    }
    if (sinD <= sinDErr) return Uncertain

    val cosD = a.dot(b) * n2 - aDn * bDn
    val cosDErr =
      ((8 * DblErr + 5 * DblErr) * math.abs(aDn) + aDnErr) * math.abs(bDn) +
        (math.abs(aDn) + aDnErr) * bDnErr + (8 * DblErr + 8 * DblErr) * n2
    if (cosD <= -cosDErr) return Neither
    if (cosD < cosDErr) return Uncertain

    if (result <= resultErr) return Uncertain
    if (lhs3 > 0) First else Second
  }

  private def exactVoronoiSiteExclusion(a: XV3, b: XV3, x0: XV3, x1: XV3,
                                        r2d: Double, aV: V3, bV: V3): Excluded = {
    import Excluded._
    val r2 = new BigD(r2d)
    val n = x0.cross(x1)
    val rhs2 = a.cross(b).dot(n)
    val rhs2Sgn = rhs2.signum()
    if (rhs2Sgn < 0) {
      val r90 = new BigD(S1ChordAngle.Right)
      val ca = exactCompareDistance(a, x0, r90)
      val cb = exactCompareDistance(b, x1, r90)
      if (ca < 0 && cb < 0) return Neither
      return if (ca > 0) First else Second
    }
    val n2 = norm2(n)
    val aDn = a.dot(n)
    val bDn = b.dot(n)
    val cosD = a.dot(b).multiply(n2).subtract(aDn.multiply(bDn))
    if (cosD.signum() < 0) return Neither

    val a2 = norm2(a); val b2 = norm2(b)
    val n2sin2R = r2.multiply(BigD.ONE.subtract(r2.multiply(new BigD(0.25))))
      .multiply(n2)
    val sa2 = b2.multiply(n2sin2R.multiply(a2).subtract(aDn.multiply(aDn)))
    val sb2 = a2.multiply(n2sin2R.multiply(b2).subtract(bDn.multiply(bDn)))
    val lhs2Sgn = sb2.subtract(sa2).signum()
    if (lhs2Sgn == 0) return Neither

    val cosR = BigD.ONE.subtract(r2.multiply(new BigD(0.5)))
    val cos2R = cosR.multiply(cosR)
    val lhs3 = cos2R.multiply(sa2.add(sb2)).subtract(rhs2.multiply(rhs2))
    if (lhs3.signum() < 0) return Neither

    val lhs4 = lhs3.multiply(lhs3)
    val rhs4 = new BigD(4).multiply(cos2R).multiply(cos2R)
      .multiply(sa2).multiply(sb2)
    val result = lhs4.subtract(rhs4).signum()
    if (result < 0) return Neither
    if (result == 0) {
      // shared interval endpoint exactly at distance r: symbolic rule —
      // site A is closer to an equidistant point iff A > B
      if ((lhs2Sgn > 0) == (lexCompare(aV, bV) > 0)) return Neither
    }
    if (lhs2Sgn > 0) First else Second
  }

  /** Voronoi site exclusion along edge X for sites A (closer to x0) and B
    * within distance r of X (reference GetVoronoiSiteExclusion,
    * s2predicates.h:292-313). REQUIRES r2 < Right, compareDistances(x0,a,b)
    * < 0, both sites within r of the edge, x0 != -x1. */
  def voronoiSiteExclusion(a: V3, b: V3, x0: V3, x1: V3, r2: Double): Excluded = {
    if (compareDistances(x1, a, b) < 0) return Excluded.Second // A closer to all of X
    val result = triageVoronoiSiteExclusion(a, b, x0, x1, r2)
    if (result != Excluded.Uncertain) return result
    exactVoronoiSiteExclusion(toExact(a), toExact(b), toExact(x0), toExact(x1),
      r2, a, b)
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
