package graft.core

/** Spherical disc: center (unit vector) + radius as squared chord length.
  * Matches reference s2cap.h/cc semantics exactly, including the
  * conservative cell relations used by the coverer
  * (s2cap.cc:202-300). */
final case class S2Cap(center: V3, radius2: Double) extends S2Region {
  import S1ChordAngle._

  def isEmpty: Boolean = radius2 < 0
  def isFull: Boolean = radius2 == Straight
  def height: Double = 0.5 * radius2
  def radiusRadians: Double = toRadians(radius2)
  def area: Double = 2 * math.Pi * math.max(0.0, height)

  def complement: S2Cap =
    if (isFull) S2Cap.Empty
    else if (isEmpty) S2Cap.Full
    else S2Cap(-center, math.min(4.0, 4 - radius2))

  def containsCap(other: S2Cap): Boolean =
    if (isFull || other.isEmpty) true
    else radius2 >= add(fromPoints(center, other.center), other.radius2)

  def intersectsCap(other: S2Cap): Boolean =
    if (isEmpty || other.isEmpty) false
    else add(radius2, other.radius2) >= fromPoints(center, other.center)

  def interiorIntersectsCap(other: S2Cap): Boolean =
    if (radius2 <= 0 || other.isEmpty) false
    else add(radius2, other.radius2) > fromPoints(center, other.center)

  def addPoint(p: V3): S2Cap =
    if (isEmpty) S2Cap(p, 0.0)
    else {
      val d2 = fromPoints(center, p)
      S2Cap(center, math.max(radius2, d2))
    }

  def addCap(other: S2Cap): S2Cap =
    if (isEmpty) other
    else if (other.isEmpty) this
    else {
      val dist = add(fromPoints(center, other.center), other.radius2)
      S2Cap(center, math.max(radius2, dist))
    }

  def expanded(distanceRadians: Double): S2Cap =
    if (isEmpty) S2Cap.Empty
    else S2Cap(center, add(radius2, fromRadians(distanceRadians)))

  override def contains(p: V3): Boolean = // allocation-free (hot refine path)
    fromPointsXYZ(center.x, center.y, center.z, p.x, p.y, p.z) <= radius2

  def interiorContains(p: V3): Boolean =
    isFull || fromPoints(center, p) < radius2

  /** True if the cap intersects any point of `cell` other than its
    * (already-tested) vertices. */
  private def intersectsCellExcludingVertices(cell: S2Cell, vertices: Array[V3]): Boolean = {
    if (radius2 >= Right) return false
    if (isEmpty) return false
    if (cell.containsPoint(center)) return true
    val sin2Angle = sin2(radius2)
    var k = 0
    while (k < 4) {
      val edge = cell.edgeRaw(k)
      val dot = center.dot(edge)
      if (dot <= 0) {
        if (dot * dot > sin2Angle * edge.norm2) return false
        val dir = edge.cross(center)
        if (dir.dot(vertices(k)) < 0 && dir.dot(vertices((k + 1) & 3)) > 0)
          return true
      }
      k += 1
    }
    false
  }

  override def containsCell(cell: S2Cell): Boolean = {
    val vertices = new Array[V3](4)
    var k = 0
    while (k < 4) {
      vertices(k) = cell.vertex(k)
      if (!contains(vertices(k))) return false
      k += 1
    }
    !complement.intersectsCellExcludingVertices(cell, vertices)
  }

  override def mayIntersectCell(cell: S2Cell): Boolean = {
    val vertices = new Array[V3](4)
    var k = 0
    while (k < 4) {
      vertices(k) = cell.vertex(k)
      if (contains(vertices(k))) return true
      k += 1
    }
    intersectsCellExcludingVertices(cell, vertices)
  }

  override def capBound: S2Cap = this

  override def rectBound: S2LatLngRect = {
    if (isEmpty) return S2LatLngRect.Empty
    val centerLat = V3.latRadians(center)
    val centerLng = V3.lngRadians(center)
    val capAngle = radiusRadians
    var allLongitudes = false
    var latLo = centerLat - capAngle
    var latHi = centerLat + capAngle
    var lngLo = -math.Pi
    var lngHi = math.Pi
    if (latLo <= -math.Pi / 2) { latLo = -math.Pi / 2; allLongitudes = true }
    if (latHi >= math.Pi / 2) { latHi = math.Pi / 2; allLongitudes = true }
    if (!allLongitudes) {
      val sinA = S1ChordAngle.sin(radius2)
      val sinC = math.cos(centerLat)
      if (sinA <= sinC) {
        val angleA = math.asin(sinA / sinC)
        lngLo = math.IEEEremainder(centerLng - angleA, 2 * math.Pi)
        lngHi = math.IEEEremainder(centerLng + angleA, 2 * math.Pi)
      }
    }
    S2LatLngRect(R1Interval(latLo, latHi), S1Interval.normalized(lngLo, lngHi))
  }

  /** Loose ≤4-cell bound (reference s2cap.cc:202-223): the 4 cells at the
    * deepest level whose cells are wide enough to need only the vertex
    * neighborhood of the center's leaf cell. */
  override def cellUnionBound: Array[Long] = {
    val level = S2Metrics.MinWidth.levelForMinValue(radiusRadians) - 1
    if (level < 0) {
      Array.tabulate(6)(f => S2CellId.fromFace(f))
    } else {
      val leaf = S2CellId.fromPoint(center.x, center.y, center.z)
      S2CellId.vertexNeighbors(leaf, level)
    }
  }
}

object S2Cap {
  val Empty: S2Cap = S2Cap(V3(1, 0, 0), -1.0)
  val Full: S2Cap = S2Cap(V3(1, 0, 0), 4.0)
  def fromPoint(p: V3): S2Cap = S2Cap(p, 0.0)
  def fromCenterAngle(center: V3, radiusRadians: Double): S2Cap =
    S2Cap(center, S1ChordAngle.fromRadians(radiusRadians))
  def fromCenterHeight(center: V3, height: Double): S2Cap =
    S2Cap(center, math.min(4.0, 2 * height))
  def fromCenterArea(center: V3, area: Double): S2Cap =
    fromCenterHeight(center, area / (2 * math.Pi))
}
