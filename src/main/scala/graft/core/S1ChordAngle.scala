package graft.core

/** S1ChordAngle represented directly as its squared chord length (a
  * Double in [0,4], negative = empty sentinel, +inf = infinity), matching
  * the reference (/root/reference/src/s2/s1chord_angle.h:124-156,
  * s1chord_angle.cc:40-160). All comparisons are plain double compares on
  * length2, exactly as the reference. */
object S1ChordAngle {
  final val Zero = 0.0
  final val Right = 2.0
  final val Straight = 4.0
  final val Infinity = Double.PositiveInfinity
  final val Negative = -1.0
  final val MaxLength2 = 4.0

  /** Squared chord distance between two unit vectors. */
  @inline def fromPoints(x: V3, y: V3): Double =
    math.min(4.0, (x - y).norm2)

  @inline def fromPointsXYZ(x1: Double, y1: Double, z1: Double,
                            x2: Double, y2: Double, z2: Double): Double = {
    val dx = x1 - x2; val dy = y1 - y2; val dz = z1 - z2
    math.min(4.0, dx * dx + dy * dy + dz * dz)
  }

  def fromRadians(radians: Double): Double = {
    if (radians < 0) Negative
    else if (radians == Double.PositiveInfinity) Infinity
    else {
      val length = 2 * math.sin(0.5 * math.min(math.Pi, radians))
      length * length
    }
  }
  def fromDegrees(deg: Double): Double = fromRadians(math.toRadians(deg))

  def toRadians(length2: Double): Double = {
    if (length2 < 0) -1.0
    else if (length2 == Double.PositiveInfinity) Double.PositiveInfinity
    else 2 * math.asin(0.5 * math.sqrt(length2))
  }

  /** Conservative upper bound chord angle from a surface angle. */
  @inline def fastUpperBoundFromRadians(radians: Double): Double =
    math.min(4.0, radians * radians)

  @inline def isSpecial(l2: Double): Boolean =
    l2 < 0 || l2 == Double.PositiveInfinity

  @inline def sin2(l2: Double): Double = l2 * (1 - 0.25 * l2)
  @inline def sin(l2: Double): Double = math.sqrt(sin2(l2))
  @inline def cos(l2: Double): Double = 1 - 0.5 * l2

  /** Angle addition on squared chord lengths (one sqrt, no trig);
    * reference s1chord_angle.cc:90-112. */
  def add(a2: Double, b2: Double): Double = {
    if (b2 == 0) a2
    else if (a2 + b2 >= MaxLength2) Straight
    else {
      val x = a2 * (1 - 0.25 * b2)
      val y = b2 * (1 - 0.25 * a2)
      math.min(MaxLength2, x + y + 2 * math.sqrt(x * y))
    }
  }

  def sub(a2: Double, b2: Double): Double = {
    if (b2 == 0) a2
    else if (a2 <= b2) Zero
    else {
      val x = a2 * (1 - 0.25 * b2)
      val y = b2 * (1 - 0.25 * a2)
      val c = math.max(0.0, math.sqrt(x) - math.sqrt(y))
      c * c
    }
  }

  def successor(l2: Double): Double = {
    if (l2 >= MaxLength2) Infinity
    else if (l2 < 0.0) Zero
    else math.nextAfter(l2, 10.0)
  }

  def predecessor(l2: Double): Double = {
    if (l2 <= 0.0) Negative
    else if (l2 > MaxLength2) Straight
    else math.nextAfter(l2, -10.0)
  }

  def plusError(l2: Double, error: Double): Double =
    if (isSpecial(l2)) l2
    else math.max(0.0, math.min(MaxLength2, l2 + error))

  /** Max error of fromPoints given normalized inputs. */
  def s2PointConstructorMaxError(l2: Double): Double =
    4.5 * S2Predicates.DblEpsilon * l2 +
      16 * S2Predicates.DblEpsilon * S2Predicates.DblEpsilon
}
