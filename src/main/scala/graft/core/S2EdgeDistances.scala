package graft.core

/** Point↔geodesic-edge distances in squared-chord form, matching the
  * reference's numerical strategy exactly (conservative planar acute-angle
  * precheck, projection-plane chord decomposition XR² = XQ² + QR²;
  * /root/reference/src/s2/s2edge_distances.cc:85-245). */
object S2EdgeDistances {
  private val Eps = 2.220446049250313e-16 // DBL_EPSILON

  /** Squared-chord distance from x to the minor geodesic arc [a,b]
    * (always computed; the reference's AlwaysUpdateMinDistance<true>). */
  def distance2(x: V3, a: V3, b: V3): Double = {
    val xa2 = (x - a).norm2
    val xb2 = (x - b).norm2
    val interior = interiorDistance2(x, a, b, xa2, xb2)
    if (interior >= 0) interior else math.min(xa2, xb2)
  }

  /** Squared-chord distance to the edge *interior*, or -1 if the closest
    * point is an endpoint (conservative: errs toward returning a value). */
  def interiorDistance2(x: V3, a: V3, b: V3, xa2: Double, xb2: Double): Double = {
    // conservative planar acute-angle test |XA^2-XB^2| < AB^2 + err
    val ab2 = (a - b).norm2
    val maxError = 4.75 * Eps * (xa2 + xb2 + ab2) + 8 * Eps * Eps
    if (math.abs(xa2 - xb2) >= ab2 + maxError) return -1
    // exact wedge test via C = a x b (robust), then XR^2 = XQ^2 + QR^2
    val c = S2EdgeCrossings.robustCrossProd(a, b)
    val c2 = c.norm2
    val xDotC = x.dot(c)
    val cx = c.cross(x)
    if ((a - x).dot(cx) >= 0 || (b - x).dot(cx) <= 0) return -1
    val qr = 1 - math.sqrt(cx.norm2 / c2)
    (xDotC * xDotC / c2) + qr * qr
  }

  /** UpdateMinDistance semantics: returns new min (or old if not closer). */
  def updateMin(x: V3, a: V3, b: V3, minDist2: Double): Double =
    math.min(minDist2, distance2(x, a, b))

  /** Max-distance variant (reference UpdateMaxDistance): distance to the
    * farthest point of [a,b]. */
  def maxDistance2(x: V3, a: V3, b: V3): Double = {
    var d2 = math.max((x - a).norm2, (x - b).norm2)
    if (d2 > 2.0) { // beyond 90 degrees: farthest point may be interior
      // Straight - dist(-x, [a,b]) in exact chord space (reference
      // UpdateMaxDistance, s2edge_distances.cc:240-245; operator- per
      // s1chord_angle.cc:114-129 — with a2 = Straight = 4 the y term
      // vanishes, so this is the exact identity chord'^2 = 4 - chord^2).
      val dNeg = distance2(-x, a, b)
      d2 = S1ChordAngle.sub(S1ChordAngle.Straight, dNeg)
    }
    d2
  }

  /** Squared-chord distance from x to a closed or open chain of vertices
    * (polyline: open; loop: pass closed=true). */
  def distanceToChain2(x: V3, vertices: Array[V3], closed: Boolean): Double = {
    var best = Double.MaxValue
    val n = vertices.length
    if (n == 0) return best
    if (n == 1) return (x - vertices(0)).norm2
    var i = 0
    val last = if (closed) n else n - 1
    while (i < last) {
      val a = vertices(i)
      val b = vertices(if (i + 1 == n) 0 else i + 1)
      val d = distance2(x, a, b)
      if (d < best) best = d
      i += 1
    }
    best
  }

  /** Fraction of the closest point along edge [a,b] (reference
    * GetDistanceFraction). */
  def distanceFraction(x: V3, a: V3, b: V3): Double = {
    val da = x.angle(a)
    val db = x.angle(b)
    da / (da + db)
  }

  /** Point at parameter t ∈ [0,1] along the geodesic a→b (reference
    * Interpolate via tangent-direction ray). */
  def interpolate(a: V3, b: V3, t: Double): V3 = {
    if (t == 0) return a
    if (t == 1) return b
    val angle = a.angle(b) * t
    val dir = S2EdgeCrossings.robustCrossProd(a, b).cross(a).normalize
    // point on ray from a towards dir at angle
    (a * math.cos(angle)) + (dir * math.sin(angle))
  }

  /** Closest point on segment [a,b] to x (reference Project). */
  def project(x: V3, a: V3, b: V3): V3 = {
    val xa2 = (x - a).norm2
    val xb2 = (x - b).norm2
    if (interiorDistance2(x, a, b, xa2, xb2) >= 0) {
      // projection onto the great-circle plane, renormalized
      val c = S2EdgeCrossings.robustCrossProd(a, b)
      val p = x - c * (x.dot(c) / c.norm2)
      p.normalize
    } else if (xa2 <= xb2) a else b
  }
}
