package graft.core

/** Immutable 3-vector of doubles (an S2Point when unit length).
  * Mirrors the reference's Vector3_d semantics
  * (/root/reference/src/s2/s2point.h:36). */
final case class V3(x: Double, y: Double, z: Double) {
  @inline def +(o: V3): V3 = V3(x + o.x, y + o.y, z + o.z)
  @inline def -(o: V3): V3 = V3(x - o.x, y - o.y, z - o.z)
  @inline def *(s: Double): V3 = V3(x * s, y * s, z * s)
  @inline def unary_- : V3 = V3(-x, -y, -z)
  @inline def dot(o: V3): Double = x * o.x + y * o.y + z * o.z
  @inline def cross(o: V3): V3 =
    V3(y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x)
  @inline def norm2: Double = x * x + y * y + z * z
  @inline def norm: Double = math.sqrt(norm2)
  def normalize: V3 = {
    val n = norm
    if (n != 0) V3(x / n, y / n, z / n) else this
  }
  @inline def apply(i: Int): Double = i match {
    case 0 => x; case 1 => y; case _ => z
  }
  def largestAbsComponent: Int =
    S2Coords.largestAbsComponent(x, y, z)
  /** Lexicographic < (the C++ Vector3 operator<). */
  def lexLess(o: V3): Boolean =
    if (x != o.x) x < o.x
    else if (y != o.y) y < o.y
    else z < o.z
  def angle(o: V3): Double = math.atan2(cross(o).norm, dot(o))
}

object V3 {
  val Zero: V3 = V3(0, 0, 0)

  def fromLatLngRadians(lat: Double, lng: Double): V3 = {
    val cosLat = math.cos(lat)
    V3(math.cos(lng) * cosLat, math.sin(lng) * cosLat, math.sin(lat))
  }
  def fromLatLngDegrees(lat: Double, lng: Double): V3 =
    fromLatLngRadians(math.toRadians(lat), math.toRadians(lng))

  def latRadians(p: V3): Double =
    math.atan2(p.z, math.sqrt(p.x * p.x + p.y * p.y))
  def lngRadians(p: V3): Double = math.atan2(p.y, p.x)
  def latDegrees(p: V3): Double = math.toDegrees(latRadians(p))
  def lngDegrees(p: V3): Double = math.toDegrees(lngRadians(p))
}
