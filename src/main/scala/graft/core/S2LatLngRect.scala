package graft.core

/** Latitude-longitude rectangle (lat: linear interval in [-Pi/2,Pi/2];
  * lng: circular interval). Matches reference s2latlng_rect.h/cc. */
final case class S2LatLngRect(lat: R1Interval, lng: S1Interval) extends S2Region {
  def isEmpty: Boolean = lat.isEmpty || lng.isEmpty
  def isFull: Boolean =
    lat == S2LatLngRect.FullLat && lng.isFull

  def latLo: Double = lat.lo
  def latHi: Double = lat.hi
  def lngLo: Double = lng.lo
  def lngHi: Double = lng.hi

  def center: (Double, Double) = (lat.center, lng.center)

  def containsLatLng(latR: Double, lngR: Double): Boolean =
    lat.contains(latR) && lng.contains(lngR)

  override def contains(p: V3): Boolean =
    containsLatLng(V3.latRadians(p), V3.lngRadians(p))

  def interiorContainsLatLng(latR: Double, lngR: Double): Boolean =
    lat.interiorContains(latR) && lng.interiorContains(lngR)

  def containsRect(o: S2LatLngRect): Boolean =
    lat.contains(o.lat) && lng.contains(o.lng)
  def interiorContainsRect(o: S2LatLngRect): Boolean =
    lat.interiorContains(o.lat) && lng.interiorContains(o.lng)
  def intersectsRect(o: S2LatLngRect): Boolean =
    lat.intersects(o.lat) && lng.intersects(o.lng)
  def interiorIntersectsRect(o: S2LatLngRect): Boolean =
    lat.interiorIntersects(o.lat) && lng.interiorIntersects(o.lng)

  def addPoint(p: V3): S2LatLngRect =
    S2LatLngRect(lat.addPoint(V3.latRadians(p)), lng.addPoint(V3.lngRadians(p)))

  def expanded(latMargin: Double, lngMargin: Double): S2LatLngRect = {
    val latE = lat.expanded(latMargin)
    val lngE = lng.expanded(lngMargin)
    if (latE.isEmpty || lngE.isEmpty) S2LatLngRect.Empty
    else S2LatLngRect(latE.intersection(S2LatLngRect.FullLat), lngE)
  }

  /** If either pole is included, include all longitudes. */
  def polarClosure: S2LatLngRect =
    if (lat.lo == -math.Pi / 2 || lat.hi == math.Pi / 2)
      S2LatLngRect(lat, S1Interval.Full)
    else this

  def union(o: S2LatLngRect): S2LatLngRect =
    S2LatLngRect(lat.union(o.lat), lng.union(o.lng))

  def intersection(o: S2LatLngRect): S2LatLngRect = {
    val latI = lat.intersection(o.lat)
    val lngI = lng.intersection(o.lng)
    if (latI.isEmpty || lngI.isEmpty) S2LatLngRect.Empty
    else S2LatLngRect(latI, lngI)
  }

  def area: Double =
    if (isEmpty) 0.0
    else lng.length * (math.sin(latHi) - math.sin(latLo))

  /** Vertex k in CCW order (lower-left, lower-right, upper-right,
    * upper-left). */
  def vertex(k: Int): V3 = {
    // CCW: (lo,lo),(lo,hi),(hi,hi),(hi,lo) in (lat, lng)
    val (la, ln) = (k & 3) match {
      case 0 => (lat.lo, lng.lo)
      case 1 => (lat.lo, lng.hi)
      case 2 => (lat.hi, lng.hi)
      case _ => (lat.hi, lng.lo)
    }
    V3.fromLatLngRadians(la, ln)
  }

  /** Distance (radians) from the point at (latR, lngR) to this rect; 0 if
    * contained (reference s2latlng_rect.cc:562-586 GetDistance(S2LatLng)).
    * The rect must be non-empty. */
  def distanceToLatLng(latR: Double, lngR: Double): Double = {
    if (lng.contains(lngR))
      return math.max(0.0, math.max(latR - lat.hi, lat.lo - latR))
    val interval = S1Interval(lng.hi, lng.complementCenter)
    val aLng = if (interval.contains(lngR)) lng.hi else lng.lo
    val lo = V3.fromLatLngRadians(lat.lo, aLng)
    val hi = V3.fromLatLngRadians(lat.hi, aLng)
    S2LatLngRect.edgeDistanceRadians(V3.fromLatLngRadians(latR, lngR), lo, hi)
  }

  /** Directed Hausdorff distance (radians) to `other`: the max over points
    * p of this rect of the distance from p to `other` (reference
    * s2latlng_rect.cc:593-686). Decomposes into the directed Hausdorff
    * distance of the lng intervals plus the two-longitudinal-edge problem,
    * whose candidate extrema are the edge endpoints, the equator crossing
    * (Voronoi case 1, lng_diff <= pi/2), or the Voronoi-bisector and
    * interior-maximum points (case 2, lng_diff > pi/2). */
  def directedHausdorffDistance(other: S2LatLngRect): Double = {
    if (isEmpty) return 0.0
    if (other.isEmpty) return math.Pi // maximum possible distance on S2
    val lngDistance = lng.directedHausdorffDistance(other.lng)
    S2LatLngRect.directedHausdorffDistance(lngDistance, lat, other.lat)
  }

  /** Undirected Hausdorff distance (radians) between the two rects
    * (reference s2latlng_rect.cc:588-591). */
  def hausdorffDistance(other: S2LatLngRect): Double =
    math.max(directedHausdorffDistance(other),
      other.directedHausdorffDistance(this))

  override def capBound: S2Cap = {
    if (isEmpty) return S2Cap.Empty
    var poleZ = 0.0; var poleAngle = 0.0
    if (lat.lo + lat.hi < 0) { poleZ = -1; poleAngle = math.Pi / 2 + lat.hi }
    else { poleZ = 1; poleAngle = math.Pi / 2 - lat.lo }
    val poleCap = S2Cap.fromCenterAngle(V3(0, 0, poleZ),
      (1 + 2 * S2Predicates.DblEpsilon) * poleAngle)
    if (lng.length <= math.Pi) {
      var midCap = S2Cap.fromPoint(V3.fromLatLngRadians(lat.center, lng.center))
      var k = 0
      while (k < 4) { midCap = midCap.addPoint(vertex(k)); k += 1 }
      if (midCap.height < poleCap.height) return midCap
    }
    poleCap
  }

  override def rectBound: S2LatLngRect = this

  override def containsCell(cell: S2Cell): Boolean =
    containsRect(cell.rectBound)

  override def mayIntersectCell(cell: S2Cell): Boolean =
    intersectsRect(cell.rectBound)

  /** Exact cell intersection test (reference s2latlng_rect.cc:459-516). */
  def intersectsCell(cell: S2Cell): Boolean = {
    if (isEmpty) return false
    if (contains(cell.centerRaw)) return true
    if (cell.containsPoint(V3.fromLatLngRadians(lat.center, lng.center)))
      return true
    if (!intersectsRect(cell.rectBound)) return false
    val cellV = new Array[V3](4)
    val cellLat = new Array[Double](4)
    val cellLng = new Array[Double](4)
    var i = 0
    while (i < 4) {
      cellV(i) = cell.vertex(i)
      cellLat(i) = V3.latRadians(cellV(i))
      cellLng(i) = V3.lngRadians(cellV(i))
      if (containsLatLng(cellLat(i), cellLng(i))) return true
      if (cell.containsPoint(vertex(i))) return true
      i += 1
    }
    i = 0
    while (i < 4) {
      val edgeLng = S1Interval.fromPointPair(cellLng(i), cellLng((i + 1) & 3))
      if (lng.intersects(edgeLng)) {
        val a = cellV(i); val b = cellV((i + 1) & 3)
        if (edgeLng.contains(lng.lo) &&
            S2LatLngRect.intersectsLngEdge(a, b, lat, lng.lo)) return true
        if (edgeLng.contains(lng.hi) &&
            S2LatLngRect.intersectsLngEdge(a, b, lat, lng.hi)) return true
        if (S2LatLngRect.intersectsLatEdge(a, b, lat.lo, lng)) return true
        if (S2LatLngRect.intersectsLatEdge(a, b, lat.hi, lng)) return true
      }
      i += 1
    }
    false
  }
}

object S2LatLngRect {
  val FullLat: R1Interval = R1Interval(-math.Pi / 2, math.Pi / 2)
  val Empty: S2LatLngRect = S2LatLngRect(R1Interval.Empty, S1Interval.Empty)
  val Full: S2LatLngRect = S2LatLngRect(FullLat, S1Interval.Full)

  def fromPointPair(lat1: Double, lng1: Double, lat2: Double, lng2: Double): S2LatLngRect =
    S2LatLngRect(R1Interval.fromPointPair(lat1, lat2),
      S1Interval.fromPointPair(lng1, lng2))

  def fromDegrees(latLo: Double, lngLo: Double, latHi: Double, lngHi: Double): S2LatLngRect =
    S2LatLngRect(
      R1Interval(math.toRadians(latLo), math.toRadians(latHi)),
      S1Interval.normalized(math.toRadians(lngLo), math.toRadians(lngHi)))

  /** Min distance (radians) from x to the geodesic segment [a, b]. */
  private[core] def edgeDistanceRadians(x: V3, a: V3, b: V3): Double = {
    val d2 = S2EdgeDistances.distance2(x, a, b)
    2 * math.asin(math.min(1.0, 0.5 * math.sqrt(d2)))
  }

  /** Directed Hausdorff distance from one longitudinal edge spanning
    * latitudes `a` (at longitude 0) to the other spanning `b` (at
    * longitude `lngDiff`), per the Voronoi-region case analysis of
    * reference s2latlng_rect.cc:610-686. */
  private def directedHausdorffDistance(lngDiff: Double, a: R1Interval,
                                        b: R1Interval): Double = {
    require(lngDiff >= 0 && lngDiff <= math.Pi, s"lngDiff $lngDiff")
    if (lngDiff == 0) return a.directedHausdorffDistance(b)
    val bLng = lngDiff
    val bLo = V3.fromLatLngRadians(b.lo, bLng)
    val bHi = V3.fromLatLngRadians(b.hi, bLng)
    val aLo = V3.fromLatLngRadians(a.lo, 0)
    val aHi = V3.fromLatLngRadians(a.hi, 0)
    // candidate A1/B1: the two endpoints of a
    var maxDistance = math.max(
      edgeDistanceRadians(aLo, bLo, bHi), edgeDistanceRadians(aHi, bLo, bHi))
    if (lngDiff <= math.Pi / 2) {
      // case A2: the equator crossing, when both edges cross the equator
      if (a.contains(0) && b.contains(0))
        maxDistance = math.max(maxDistance, lngDiff)
    } else {
      // case B2: intersection of a with the Voronoi edge E3
      val p = bisectorIntersection(b, bLng)
      val pLat = V3.latRadians(p)
      if (a.contains(pLat))
        maxDistance = math.max(maxDistance, p.angle(bLo))
      // case B3: interior maxima of the sub-edges below/above that point
      if (pLat > a.lo)
        maxDistance = math.max(maxDistance,
          interiorMaxDistance(R1Interval(a.lo, math.min(pLat, a.hi)), bLo))
      if (pLat < a.hi)
        maxDistance = math.max(maxDistance,
          interiorMaxDistance(R1Interval(math.max(pLat, a.lo), a.hi), bHi))
    }
    maxDistance
  }

  /** Intersection of longitude 0 with the perpendicular bisector of the
    * longitudinal edge at `lng` spanning `lat`
    * (reference s2latlng_rect.cc:688-706). */
  private def bisectorIntersection(lat: R1Interval, lngIn: Double): V3 = {
    val lng = math.abs(lngIn)
    val latCenter = lat.center
    // a vector orthogonal to the bisector of the given longitudinal edge
    val orthoBisector =
      if (latCenter >= 0) V3.fromLatLngRadians(latCenter - math.Pi / 2, lng)
      else V3.fromLatLngRadians(-latCenter - math.Pi / 2, lng - math.Pi)
    val orthoLng = V3(0, -1, 0) // orthogonal to longitude 0
    S2EdgeCrossings.robustCrossProd(orthoLng, orthoBisector).normalize
  }

  /** Max distance from b to the longitude-0 segment spanning `aLat`, if
    * the max occurs in the segment's interior; otherwise -1
    * (reference s2latlng_rect.cc:708-727). */
  private def interiorMaxDistance(aLat: R1Interval, b: V3): Double = {
    // longitude 0 is in the y=0 plane; b.x >= 0 implies the max does not
    // occur in the interior
    if (aLat.isEmpty || b.x >= 0) return -1.0
    // antipode of b's projection onto the y=0 plane
    val intersectionPoint = V3(-b.x, 0, -b.z).normalize
    if (aLat.interiorContains(V3.latRadians(intersectionPoint)))
      b.angle(intersectionPoint)
    else -1.0
  }

  def intersectsLngEdge(a: V3, b: V3, lat: R1Interval, lng: Double): Boolean =
    S2EdgeCrossings.crossingSign(a, b,
      V3.fromLatLngRadians(lat.lo, lng), V3.fromLatLngRadians(lat.hi, lng)) > 0

  def intersectsLatEdge(a: V3, b: V3, lat: Double, lng: S1Interval): Boolean = {
    val z0 = S2EdgeCrossings.robustCrossProd(a, b).normalize
    val z = if (z0.z < 0) -z0 else z0
    val y = S2EdgeCrossings.robustCrossProd(z, V3(0, 0, 1)).normalize
    val x = y.cross(z)
    val sinLat = math.sin(lat)
    if (math.abs(sinLat) >= x.z) return false
    val cosTheta = sinLat / x.z
    val sinTheta = math.sqrt(1 - cosTheta * cosTheta)
    val theta = math.atan2(sinTheta, cosTheta)
    val abTheta = S1Interval.fromPointPair(
      math.atan2(a.dot(y), a.dot(x)), math.atan2(b.dot(y), b.dot(x)))
    if (abTheta.contains(theta)) {
      val isect = x * cosTheta + y * sinTheta
      if (lng.contains(math.atan2(isect.y, isect.x))) return true
    }
    if (abTheta.contains(-theta)) {
      val isect = x * cosTheta - y * sinTheta
      if (lng.contains(math.atan2(isect.y, isect.x))) return true
    }
    false
  }
}

/** Accumulates a conservative lat/lng bound over geodesic edges
  * (reference s2latlng_rect_bounder.cc:16-100): unlike bounding the
  * vertices alone, accounts for latitude extrema along edge interiors. */
final class S2LatLngRectBounder {
  import S2Predicates.DblEpsilon
  private var bound = S2LatLngRect.Empty
  private var a: V3 = V3.Zero
  private var aLat = 0.0
  private var aLng = 0.0
  private var any = false

  def addPoint(b: V3): Unit = {
    val bLat = V3.latRadians(b)
    val bLng = V3.lngRadians(b)
    if (!any) {
      bound = S2LatLngRect(
        R1Interval(bLat, bLat), S1Interval.fromPoint(bLng))
      any = true
    } else {
      val n = (a - b).cross(a + b) // 2 * (a x b)
      val nNorm = n.norm
      if (nNorm < 1.91346e-15) {
        // A and B are nearly identical or antipodal.
        if (a.dot(b) < 0) bound = S2LatLngRect.Full
        else bound = bound.union(
          S2LatLngRect.fromPointPair(aLat, aLng, bLat, bLng))
      } else {
        var lngAB = S1Interval.fromPointPair(aLng, bLng)
        if (lngAB.length >= math.Pi - 2 * DblEpsilon) lngAB = S1Interval.Full
        var latAB = R1Interval.fromPointPair(aLat, bLat)
        val m = n.cross(V3(0, 0, 1))
        val mA = m.dot(a)
        val mB = m.dot(b)
        val mError = 6.06638e-16 * nNorm + 6.83174e-31
        if (mA * mB < 0 || math.abs(mA) <= mError || math.abs(mB) <= mError) {
          val maxLat = math.min(
            math.atan2(math.sqrt(n.x * n.x + n.y * n.y), math.abs(n.z)) +
              3 * DblEpsilon, math.Pi / 2)
          val latBudgetZ = 0.5 * (a - b).norm * math.sin(maxLat)
          val latBudget = 2 * math.asin(
            math.min((1 + 4 * DblEpsilon) * latBudgetZ, 1.0))
          val maxDelta = 0.5 * (latBudget - latAB.length) + DblEpsilon
          if (mA <= mError && mB >= -mError)
            latAB = latAB.setHi(math.min(maxLat, latAB.hi + maxDelta))
          if (mB <= mError && mA >= -mError)
            latAB = latAB.setLo(math.max(-maxLat, latAB.lo - maxDelta))
        }
        bound = bound.union(S2LatLngRect(latAB, lngAB))
      }
    }
    a = b; aLat = bLat; aLng = bLng
  }

  def getBound: S2LatLngRect =
    bound.expanded(2 * DblEpsilon, 0).polarClosure
}

object S2LatLngRectBounder {
  /** Expand a bound so it is guaranteed to contain the bounds of any
    * subregion (reference s2latlng_rect_bounder.cc:74-100). */
  def expandForSubregions(bound: S2LatLngRect): S2LatLngRect = {
    import S2Predicates.DblEpsilon
    if (bound.isEmpty) return bound
    val lngGap = math.max(0.0, math.Pi - bound.lng.length - 2.5 * DblEpsilon)
    val minAbsLat = math.max(bound.lat.lo, -bound.lat.hi)
    val latGap1 = math.Pi / 2 + bound.lat.lo
    val latGap2 = math.Pi / 2 - bound.lat.hi
    if (minAbsLat >= 0) {
      if (2 * minAbsLat + lngGap < 1.354e-15) return S2LatLngRect.Full
    } else if (lngGap >= math.Pi / 2) {
      if (latGap1 + latGap2 < 1.687e-15) return S2LatLngRect.Full
    } else {
      if (math.max(latGap1, latGap2) * lngGap < 1.765e-15)
        return S2LatLngRect.Full
    }
    val latExpansion = 9 * DblEpsilon
    val lngExpansion = if (lngGap <= 0) math.Pi else 0.0
    bound.expanded(latExpansion, lngExpansion).polarClosure
  }
}
