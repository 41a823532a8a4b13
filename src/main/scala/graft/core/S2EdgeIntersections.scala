package graft.core

import java.math.{BigDecimal => BigD}
import S2Predicates.{XV3, toExact}

/** Intersection point of two crossing geodesic edges — the reference's
  * S2::GetIntersection (/root/reference/src/s2/s2edge_crossings.h:219-233,
  * .cc:441-790): the production ladder is GetIntersectionStable in double
  * precision (projection + interpolation with certified error bounds),
  * falling back to exact BigDecimal arithmetic. The returned point is
  * within kIntersectionError (8 * DBL_ERR radians) of the true
  * intersection, and is invariant under swapping/reversing the edges. */
object S2EdgeIntersections {
  private val DblErr = 1.1102230246251565e-16 // DBL_ERR = epsilon/2
  private val Sqrt3 = math.sqrt(3.0)

  /** kIntersectionError in radians (s2edge_crossings.cc:70-74). */
  val IntersectionErrorRadians: Double = 8 * DblErr

  private def lexLess(a: V3, b: V3): Boolean =
    a.x < b.x || (a.x == b.x && (a.y < b.y || (a.y == b.y && a.z < b.z)))

  // internal::CompareEdges (s2edge_crossings.h:57-64)
  private def compareEdges(a0: V3, a1: V3, b0: V3, b1: V3): Boolean = {
    val (pa0, pa1) = if (!lexLess(a0, a1)) (a1, a0) else (a0, a1)
    val (pb0, pb1) = if (!lexLess(b0, b1)) (b1, b0) else (b0, b1)
    lexLess(pa0, pb0) || (pa0 == pb0 && lexLess(pa1, pb1))
  }

  // GetProjection (s2edge_crossings.cc:514-555): signed distance of x to
  // the plane with normal aNorm, scaled by |aNorm|; returns (value, error)
  private def getProjection(x: V3, aNorm: V3, aNormLen: Double,
                            a0: V3, a1: V3): (Double, Double) = {
    val x0 = x - a0
    val x1 = x - a1
    val x0d2 = x0.norm2
    val x1d2 = x1.norm2
    val (dist, result) =
      if (x0d2 < x1d2 || (x0d2 == x1d2 && lexLess(x0, x1)))
        (math.sqrt(x0d2), x0.dot(aNorm))
      else (math.sqrt(x1d2), x1.dot(aNorm))
    val error = (((3.5 + 2 * Sqrt3) * aNormLen + 32 * Sqrt3 * DblErr)
      * dist + 1.5 * math.abs(result)) * DblErr
    (result, error)
  }

  // GetIntersectionStableSorted (s2edge_crossings.cc:556-622); requires
  // edge A is the longer one
  private def stableSorted(a0: V3, a1: V3, b0: V3, b1: V3): Option[V3] = {
    val aNorm = (a0 - a1).cross(a0 + a1)
    val aNormLen = math.sqrt(aNorm.norm2)
    val bLen = math.sqrt((b1 - b0).norm2)
    var (b0Dist, b0Err) = getProjection(b0, aNorm, aNormLen, a0, a1)
    var (b1Dist, b1Err) = getProjection(b1, aNorm, aNormLen, a0, a1)
    if (b0Dist < b1Dist) { b0Dist = -b0Dist; b1Dist = -b1Dist }
    val distSum = b0Dist - b1Dist
    val errSum = b0Err + b1Err
    if (distSum <= errSum) return None
    val x = (b1 * b0Dist) - (b0 * b1Dist)
    val error = bLen * math.abs(b0Dist * b1Err - b1Dist * b0Err) /
      (distSum - errSum) + 2 * DblErr * distSum
    val xLen2 = x.norm2
    if (xLen2 < java.lang.Double.MIN_NORMAL) return None
    val xLen = math.sqrt(xLen2)
    if (error > (IntersectionErrorRadians - DblErr) * xLen) return None
    Some(x * (1.0 / xLen))
  }

  // GetIntersectionStable (s2edge_crossings.cc:624-648)
  private def stable(a0: V3, a1: V3, b0: V3, b1: V3): Option[V3] = {
    val aLen2 = (a1 - a0).norm2
    val bLen2 = (b1 - b0).norm2
    if (aLen2 < bLen2 || (aLen2 == bLen2 && compareEdges(a0, a1, b0, b1)))
      stableSorted(b0, b1, a0, a1)
    else stableSorted(a0, a1, b0, b1)
  }

  /** Exact BigDecimal vector scaled into double range and normalized
    * (reference NormalizableFromExact + Normalize). Power-of-ten scaling
    * is exact in BigDecimal, so only the final doubleValue rounds. */
  private def toPointFromExact(v: XV3): V3 = {
    def e10(b: BigD): Int =
      if (b.signum == 0) Int.MinValue else b.precision - b.scale
    val m = math.max(e10(v.x), math.max(e10(v.y), e10(v.z)))
    if (m == Int.MinValue) return V3(0, 0, 0)
    def s(b: BigD): Double = b.scaleByPowerOfTen(-m).doubleValue()
    V3(s(v.x), s(v.y), s(v.z)).normalize
  }

  // GetIntersectionExact (s2edge_crossings.cc:667-712)
  private[core] def exact(a0: V3, a1: V3, b0: V3, b1: V3): V3 = {
    val aNormXf = toExact(a0).cross(toExact(a1))
    val bNormXf = toExact(b0).cross(toExact(b1))
    val xXf = aNormXf.cross(bNormXf)
    val isZero = xXf.x.signum == 0 && xXf.y.signum == 0 && xXf.z.signum == 0
    if (!isZero) {
      val sign = S2Predicates.sign(a0, a1, b1)
      val p = toPointFromExact(xXf)
      return if (sign < 0) -p else p
    }
    // Exactly collinear edges: heuristic from the reference — of the four
    // endpoints exactly two lie in the interior of the other edge; return
    // the lexicographically smallest of those.
    var aNorm = toPointFromExact(aNormXf)
    var bNorm = toPointFromExact(bNormXf)
    if (aNorm == V3(0, 0, 0)) aNorm = S2EdgeCrossings.robustCrossProd(a0, a1).normalize
    if (bNorm == V3(0, 0, 0)) bNorm = S2EdgeCrossings.robustCrossProd(b0, b1).normalize
    var x = V3(10, 10, 10)
    if (S2Predicates.orderedCCW(b0, a0, b1, bNorm) && lexLess(a0, x)) x = a0
    if (S2Predicates.orderedCCW(b0, a1, b1, bNorm) && lexLess(a1, x)) x = a1
    if (S2Predicates.orderedCCW(a0, b0, a1, aNorm) && lexLess(b0, x)) x = b0
    if (S2Predicates.orderedCCW(a0, b1, a1, aNorm) && lexLess(b1, x)) x = b1
    x
  }

  /** Intersection point of crossing edges (a0,a1) and (b0,b1).
    * REQUIRES crossingSign(a0,a1,b0,b1) > 0. */
  def getIntersection(a0: V3, a1: V3, b0: V3, b1: V3): V3 =
    stable(a0, a1, b0, b1).getOrElse(exact(a0, a1, b0, b1))
}
