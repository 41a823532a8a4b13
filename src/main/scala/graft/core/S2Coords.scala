package graft.core

/** Cube-face / (s,t) / (u,v) / (i,j) coordinate system of the S2 grid.
  *
  * Semantics match the reference library's quadratic projection exactly
  * (see /root/reference/src/s2/s2coords.h:322-356 and
  * s2coords_internal.h:38-129); every function here uses only IEEE-exact
  * double ops (+,-,*,/ ,sqrt, comparisons) so results are bit-reproducible
  * across platforms and across engines (Spark vs DuckDB oracles).
  */
object S2Coords {
  final val MaxCellLevel = 30
  final val LimitIJ = 1 << MaxCellLevel       // 2^30
  final val MaxSiTi: Long = 1L << (MaxCellLevel + 1) // 2^31

  // Hilbert sub-cell traversal masks.
  final val SwapMask = 0x01
  final val InvertMask = 0x02

  /** ijToPos(orientation)(ij): traversal position of subcell (i,j). */
  val IjToPos: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2),
    Array(0, 3, 1, 2),
    Array(2, 3, 1, 0),
    Array(2, 1, 3, 0))

  /** posToIj(orientation)(pos): subcell (i<<1|j) at traversal position. */
  val PosToIj: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2),
    Array(0, 2, 3, 1),
    Array(3, 2, 0, 1),
    Array(3, 1, 0, 2))

  /** XOR modifier applied to the parent orientation per child position. */
  val PosToOrientation: Array[Int] = Array(SwapMask, 0, 0, InvertMask + SwapMask)

  /** Per-face (u,v,w) axes as unit vectors; w = face normal. */
  val FaceUVWAxes: Array[Array[Array[Double]]] = Array(
    Array(Array(0, 1, 0), Array(0, 0, 1), Array(1, 0, 0)),
    Array(Array(-1, 0, 0), Array(0, 0, 1), Array(0, 1, 0)),
    Array(Array(-1, 0, 0), Array(0, -1, 0), Array(0, 0, 1)),
    Array(Array(0, 0, -1), Array(0, -1, 0), Array(-1, 0, 0)),
    Array(Array(0, 0, -1), Array(1, 0, 0), Array(0, -1, 0)),
    Array(Array(0, 1, 0), Array(1, 0, 0), Array(0, 0, -1)))

  /** Face adjacency: FaceUVWFaces(face)(axis)(direction). */
  val FaceUVWFaces: Array[Array[Array[Int]]] = Array(
    Array(Array(4, 1), Array(5, 2), Array(3, 0)),
    Array(Array(0, 3), Array(5, 2), Array(4, 1)),
    Array(Array(0, 3), Array(1, 4), Array(5, 2)),
    Array(Array(2, 5), Array(1, 4), Array(0, 3)),
    Array(Array(2, 5), Array(3, 0), Array(1, 4)),
    Array(Array(4, 1), Array(3, 0), Array(2, 5)))

  /** Quadratic projection cell-space → cube-space. */
  @inline def stToUV(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4 * s * s - 1)
    else (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))

  /** Quadratic projection cube-space → cell-space. */
  @inline def uvToST(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u)
    else 1 - 0.5 * math.sqrt(1 - 3 * u)

  /** Leaf-grid discretization: s ∈ [0,1] → i ∈ [0, 2^30). */
  @inline def stToIJ(s: Double): Int = {
    if (!(s > 0)) 0
    else math.min((LimitIJ * s).toInt, LimitIJ - 1)
  }

  /** Lower edge of leaf cell i in s-coordinates. */
  @inline def ijToSTMin(i: Int): Double = (1.0 / LimitIJ) * i

  @inline def siTiToST(si: Long): Double = (1.0 / MaxSiTi) * si

  @inline def stToSiTi(s: Double): Long = math.rint(s * MaxSiTi).toLong

  /** Face + cube coords → direction vector (not unit length). */
  def faceUVtoXYZ(face: Int, u: Double, v: Double): Array[Double] = face match {
    case 0 => Array(1, u, v)
    case 1 => Array(-u, 1, v)
    case 2 => Array(-u, -v, 1)
    case 3 => Array(-1, -v, -u)
    case 4 => Array(v, -1, -u)
    case _ => Array(v, u, -1)
  }

  /** Index (0/1/2) of the component with the largest magnitude. */
  @inline def largestAbsComponent(x: Double, y: Double, z: Double): Int = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    if (ax > ay) { if (ax > az) 0 else 2 }
    else { if (ay > az) 1 else 2 }
  }

  /** Face whose normal has the largest dot product with p. */
  @inline def face(x: Double, y: Double, z: Double): Int = {
    val axis = largestAbsComponent(x, y, z)
    val comp = axis match { case 0 => x; case 1 => y; case _ => z }
    if (comp < 0) axis + 3 else axis
  }

  /** u coordinate of p on the given (known-valid) face. */
  @inline def validFaceXYZtoU(f: Int, x: Double, y: Double, z: Double): Double =
    f match {
      case 0 => y / x
      case 1 => -x / y
      case 2 => -x / z
      case 3 => z / x
      case 4 => z / y
      case _ => -y / z
    }

  /** v coordinate of p on the given (known-valid) face. */
  @inline def validFaceXYZtoV(f: Int, x: Double, y: Double, z: Double): Double =
    f match {
      case 0 => z / x
      case 1 => z / y
      case 2 => -y / z
      case 3 => y / x
      case 4 => -x / y
      case _ => -x / z
    }

  /** p in the (u,v,w) frame of the given face. */
  def faceXYZtoUVW(f: Int, x: Double, y: Double, z: Double): Array[Double] =
    f match {
      case 0 => Array(y, z, x)
      case 1 => Array(-x, z, y)
      case 2 => Array(-x, -y, z)
      case 3 => Array(-z, -y, -x)
      case 4 => Array(-z, x, -y)
      case _ => Array(y, x, -z)
    }

  def faceSiTitoXYZ(f: Int, si: Long, ti: Long): Array[Double] =
    faceUVtoXYZ(f, stToUV(siTiToST(si)), stToUV(siTiToST(ti)))

  def norm(f: Int): Array[Double] = uvwAxis(f, 2)
  def uAxis(f: Int): Array[Double] = uvwAxis(f, 0)
  def vAxis(f: Int): Array[Double] = uvwAxis(f, 1)
  def uvwAxis(f: Int, axis: Int): Array[Double] = {
    val a = FaceUVWAxes(f)(axis); Array(a(0), a(1), a(2))
  }
  def uvwFace(f: Int, axis: Int, direction: Int): Int =
    FaceUVWFaces(f)(axis)(direction)

  /** Right-handed normal of the edge u=const on the given face. */
  def uNorm(f: Int, u: Double): Array[Double] = f match {
    case 0 => Array(u, -1, 0)
    case 1 => Array(1, u, 0)
    case 2 => Array(1, 0, u)
    case 3 => Array(-u, 0, 1)
    case 4 => Array(0, -u, 1)
    case _ => Array(0, -1, -u)
  }

  /** Right-handed normal of the edge v=const on the given face. */
  def vNorm(f: Int, v: Double): Array[Double] = f match {
    case 0 => Array(-v, 0, 1)
    case 1 => Array(0, -v, 1)
    case 2 => Array(0, -1, -v)
    case 3 => Array(v, -1, 0)
    case 4 => Array(1, v, 0)
    case _ => Array(1, 0, v)
  }
}
