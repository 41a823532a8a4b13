package graft.core

/** A cell decoded into (face, level, uv-rect) form, giving exact vertices,
  * edges, bounds and point-containment (reference s2cell.cc:64-320). */
final class S2Cell private (val id: Long, val face: Int, val level: Int,
                            val orientation: Int,
                            val uLo: Double, val uHi: Double,
                            val vLo: Double, val vHi: Double)
    extends Serializable {
  import S2Coords._

  /** Vertex k (CCW order: lower-left, lower-right, upper-right,
    * upper-left in (u,v) space), normalized. */
  def vertexRaw(k: Int): V3 = {
    // R2Rect::GetVertex CCW bit twiddle: (i, j) = (k>>1 ^ (k&1), k>>1)
    val j = (k >> 1) & 1
    val i = j ^ (k & 1)
    val u = if (i == 0) uLo else uHi
    val v = if (j == 0) vLo else vHi
    val p = faceUVtoXYZ(face, u, v)
    V3(p(0), p(1), p(2))
  }
  def vertex(k: Int): V3 = vertexRaw(k).normalize

  /** Inward-facing normal of edge k (bottom, right, top, left); not
    * normalized. */
  def edgeRaw(k: Int): V3 = {
    val p = (k & 3) match {
      case 0 => vNorm(face, vLo)
      case 1 => uNorm(face, uHi)
      case 2 => vNorm(face, vHi).map(-_)
      case _ => uNorm(face, uLo).map(-_)
    }
    V3(p(0), p(1), p(2))
  }
  def edge(k: Int): V3 = edgeRaw(k).normalize

  def centerRaw: V3 = {
    val p = S2CellId.toPointRaw(id)
    V3(p(0), p(1), p(2))
  }
  def center: V3 = centerRaw.normalize

  def containsPoint(p: V3): Boolean = {
    // Project onto this face; reject the back hemisphere.
    val w = face match {
      case 0 => p.x; case 1 => p.y; case 2 => p.z
      case 3 => -p.x; case 4 => -p.y; case _ => -p.z
    }
    if (w <= 0) return false
    val u = validFaceXYZtoU(face, p.x, p.y, p.z)
    val v = validFaceXYZtoV(face, p.x, p.y, p.z)
    // Expanded so that S2Cell(S2CellId(p)).contains(p) always holds.
    val eps = (5.0 / 3.0) * S2Predicates.DblEpsilon
    u >= uLo - eps && u <= uHi + eps && v >= vLo - eps && v <= vHi + eps
  }

  def containsCell(other: S2Cell): Boolean = S2CellId.contains(id, other.id)
  def mayIntersectCell(other: S2Cell): Boolean = S2CellId.intersects(id, other.id)

  def averageArea: Double = S2Metrics.AvgArea.value(level)

  def approxArea: Double = {
    if (level < 2) return averageArea
    val flatArea = 0.5 * (vertex(2) - vertex(0)).cross(vertex(3) - vertex(1)).norm
    flatArea * 2 / (1 + math.sqrt(1 - math.min(flatArea / math.Pi, 1.0)))
  }

  def exactArea: Double = {
    val v0 = vertex(0); val v1 = vertex(1); val v2 = vertex(2); val v3 = vertex(3)
    S2Measures.area(v0, v1, v2) + S2Measures.area(v0, v2, v3)
  }

  def capBound: S2Cap = {
    val c = faceUVtoXYZ(face, 0.5 * (uLo + uHi), 0.5 * (vLo + vHi))
    var cap = S2Cap.fromPoint(V3(c(0), c(1), c(2)).normalize)
    var k = 0
    while (k < 4) { cap = cap.addPoint(vertex(k)); k += 1 }
    cap
  }

  private def latitudeAt(i: Int, j: Int): Double = {
    val p = faceUVtoXYZ(face, if (i == 0) uLo else uHi, if (j == 0) vLo else vHi)
    V3.latRadians(V3(p(0), p(1), p(2)))
  }
  private def longitudeAt(i: Int, j: Int): Double = {
    val p = faceUVtoXYZ(face, if (i == 0) uLo else uHi, if (j == 0) vLo else vHi)
    V3.lngRadians(V3(p(0), p(1), p(2)))
  }

  def rectBound: S2LatLngRect = {
    val eps = S2Predicates.DblEpsilon
    if (level > 0) {
      val u = uLo + uHi
      val v = vLo + vHi
      val i = if (uvwAxis(face, 0)(2) == 0) { if (u < 0) 1 else 0 }
              else { if (u > 0) 1 else 0 }
      val j = if (uvwAxis(face, 1)(2) == 0) { if (v < 0) 1 else 0 }
              else { if (v > 0) 1 else 0 }
      val lat = R1Interval.fromPointPair(latitudeAt(i, j), latitudeAt(1 - i, 1 - j))
      val lng = S1Interval.fromPointPair(longitudeAt(i, 1 - j), longitudeAt(1 - i, j))
      S2LatLngRect(lat, lng).expanded(2 * eps, 2 * eps).polarClosure
    } else {
      val poleMinLat = math.asin(math.sqrt(1.0 / 3)) - 0.5 * eps
      val piQ = math.Pi / 4; val piH = math.Pi / 2
      val bound = face match {
        case 0 => S2LatLngRect(R1Interval(-piQ, piQ), S1Interval(-piQ, piQ))
        case 1 => S2LatLngRect(R1Interval(-piQ, piQ), S1Interval(piQ, 3 * piQ))
        case 2 => S2LatLngRect(R1Interval(poleMinLat, piH), S1Interval.Full)
        case 3 => S2LatLngRect(R1Interval(-piQ, piQ), S1Interval(3 * piQ, -3 * piQ))
        case 4 => S2LatLngRect(R1Interval(-piQ, piQ), S1Interval(-3 * piQ, -piQ))
        case _ => S2LatLngRect(R1Interval(-piH, -poleMinLat), S1Interval.Full)
      }
      bound.expanded(eps, 0)
    }
  }
}

object S2Cell {
  def apply(id: Long): S2Cell = {
    val ij = new Array[Int](3)
    val face = S2CellId.toFaceIJOrientation(id, ij, wantOrientation = true)
    val level = S2CellId.level(id)
    val uv = S2CellId.ijLevelToBoundUV(ij(0), ij(1), level)
    new S2Cell(id, face, level, ij(2), uv(0), uv(1), uv(2), uv(3))
  }
}

/** Spherical triangle / angle measures
  * (reference s2measures.cc:30-90). */
object S2Measures {
  def angle(a: V3, b: V3, c: V3): Double =
    S2EdgeCrossings.robustCrossProd(a, b).angle(S2EdgeCrossings.robustCrossProd(c, b))

  def turnAngle(a: V3, b: V3, c: V3): Double = {
    val angle = S2EdgeCrossings.robustCrossProd(a, b)
      .angle(S2EdgeCrossings.robustCrossProd(b, c))
    if (S2Predicates.sign(a, b, c) > 0) angle else -angle
  }

  /** Cancellation-free angle between unit vectors. */
  def stableAngle(a: V3, b: V3): Double =
    2 * math.atan2((a - b).norm, (a + b).norm)

  /** Area of spherical triangle ABC via the Girard/L'Huilier hybrid
    * (reference s2measures.cc:49-90). */
  def area(a: V3, b: V3, c: V3): Double = {
    val sa = stableAngle(b, c)
    val sb = stableAngle(c, a)
    val sc = stableAngle(a, b)
    val s = 0.5 * (sa + sb + sc)
    if (s >= 3e-4) {
      // Consider whether Girard's formula is more accurate.
      val s2 = s * s
      val dmin = s - math.max(sa, math.max(sb, sc))
      if (dmin < 1e-2 * s * s2 * s2) {
        val area = girardArea(a, b, c)
        if (dmin < s * (0.1 * (area + 5e-15))) return area
      }
    }
    4 * math.atan(math.sqrt(math.max(0.0,
      math.tan(0.5 * s) * math.tan(0.5 * (s - sa)) *
        math.tan(0.5 * (s - sb)) * math.tan(0.5 * (s - sc)))))
  }

  def girardArea(a: V3, b: V3, c: V3): Double = {
    val ab = S2EdgeCrossings.robustCrossProd(a, b)
    val bc = S2EdgeCrossings.robustCrossProd(b, c)
    val ac = S2EdgeCrossings.robustCrossProd(a, c)
    val area = ab.angle(ac) - ab.angle(bc) + bc.angle(ac)
    math.max(0.0, area)
  }

  def signedArea(a: V3, b: V3, c: V3): Double =
    S2Predicates.sign(a, b, c) * area(a, b, c)
}
