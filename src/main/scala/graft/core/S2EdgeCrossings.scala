package graft.core

import S2Predicates._

/** Edge-crossing predicates and the stateful chain crosser.
  * Semantics match the reference (/root/reference/src/s2/
  * s2edge_crossings.cc:365-455, s2edge_crosser.h:340-408): crossingSign
  * returns +1 for a proper interior crossing, 0 when two edges share a
  * vertex, -1 otherwise, with symbolic perturbation guaranteeing
  * consistency ("no three points collinear"). */
object S2EdgeCrossings {

  /** A point well away from common test geometry, used as the reference
    * origin for point-in-polygon parity walks
    * (reference s2pointutil.h:98-117). */
  val Origin: V3 = V3(-0.0099994664350250197, 0.0025924542609324121,
    0.99994664350250195)

  /** A deterministic direction orthogonal to a
    * (reference s2pointutil.cc:48-60). */
  def ortho(a: V3): V3 = {
    var k = a.largestAbsComponent - 1
    if (k < 0) k = 2
    val temp = k match {
      case 0 => V3(1, 0.0053, 0.00457)
      case 1 => V3(0.012, 1, 0.00457)
      case _ => V3(0.012, 0.0053, 1)
    }
    a.cross(temp).normalize
  }
  @inline def refDir(a: V3): V3 = ortho(a)

  private final val RobustCrossProdError = 6 * DblErr

  /** (a-b)×(a+b) when its norm is certain to be accurate; None otherwise.
    * (reference s2edge_crossings.cc:98-136) */
  def stableCrossProd(a: V3, b: V3): Option[V3] = {
    val kMinNorm = (32 * Sqrt3 * DblErr) /
      (RobustCrossProdError / DblErr - (1 + 2 * Sqrt3))
    val r = (a - b).cross(a + b)
    if (r.norm2 >= kMinNorm * kMinNorm) Some(r) else None
  }

  private def isNormalizable(p: V3): Boolean =
    math.max(math.abs(p.x), math.max(math.abs(p.y), math.abs(p.z))) >=
      java.lang.Math.scalb(1.0, -242)

  private def ensureNormalizable(p: V3): V3 = {
    if (isNormalizable(p)) p
    else {
      val pMax = math.max(math.abs(p.x), math.max(math.abs(p.y), math.abs(p.z)))
      val scale = java.lang.Math.scalb(2.0, -1 - java.lang.Math.getExponent(pMax))
      p * scale
    }
  }

  /** Symbolic cross product for exactly-collinear a < b
    * (reference s2edge_crossings.cc:183-268). */
  private def symbolicCrossProdSorted(a: V3, b: V3): V3 = {
    if (b.x != 0 || b.y != 0) V3(-b.y, b.x, 0)
    else if (b.z != 0) V3(b.z, 0, 0)
    else if (a.x != 0 || a.y != 0) V3(a.y, -a.x, 0)
    else V3(1, 0, 0)
  }

  private def symbolicCrossProd(a: V3, b: V3): V3 =
    if (a.lexLess(b)) ensureNormalizable(symbolicCrossProdSorted(a, b))
    else -ensureNormalizable(symbolicCrossProdSorted(b, a))

  private def exactCrossProd(a: V3, b: V3): V3 = {
    val xa = toExact(a); val xb = toExact(b)
    val c = xa.cross(xb)
    if (c.x.signum() != 0 || c.y.signum() != 0 || c.z.signum() != 0) {
      // Round to double, scaling by a power of two first if the double
      // conversion would underflow to a non-normalizable vector.
      var d = V3(c.x.doubleValue(), c.y.doubleValue(), c.z.doubleValue())
      if (!isNormalizable(d)) {
        // Find a power-of-two scale that puts the largest magnitude near 1.
        var scalePow = 0
        var probe = d
        while (!isNormalizable(probe) && scalePow < 2200) {
          scalePow += 512
          val f = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(512))
          probe = V3(
            c.x.multiply(f.pow(scalePow / 512)).doubleValue(),
            c.y.multiply(f.pow(scalePow / 512)).doubleValue(),
            c.z.multiply(f.pow(scalePow / 512)).doubleValue())
        }
        d = probe
      }
      d
    } else symbolicCrossProd(a, b)
  }

  /** Cross product that is always nonzero and consistently oriented, even
    * for collinear or identical inputs (reference
    * s2edge_crossings.cc:147-177; the long-double tier is skipped, which
    * only makes us escalate to exact arithmetic more often — results are
    * identical). */
  def robustCrossProd(a: V3, b: V3): V3 = {
    stableCrossProd(a, b) match {
      case Some(r) => r
      case None =>
        if (a == b) ortho(a)
        else exactCrossProd(a, b)
    }
  }

  /** +1 if AB crosses CD at an interior point, 0 if they share a vertex,
    * -1 otherwise. */
  def crossingSign(a: V3, b: V3, c: V3, d: V3): Int =
    new EdgeCrosser(a, b, c).crossingSign(d)

  /** Tie-break at a shared vertex so that chained polygons partition the
    * sphere (reference s2edge_crossings.cc:372-394). */
  def vertexCrossing(a: V3, b: V3, c: V3, d: V3): Boolean = {
    if (a == b || c == d) return false
    if (a == c) return (b == d) || orderedCCW(refDir(a), d, b, a)
    if (b == d) return orderedCCW(refDir(b), c, a, b)
    if (a == d) return (b == c) || orderedCCW(refDir(a), c, b, a)
    if (b == c) return orderedCCW(refDir(b), d, a, b)
    false
  }

  def signedVertexCrossing(a: V3, b: V3, c: V3, d: V3): Int = {
    if (a == b || c == d) return 0
    if (a == c) return if ((b == d) || orderedCCW(refDir(a), d, b, a)) 1 else 0
    if (b == d) return if (orderedCCW(refDir(b), c, a, b)) 1 else 0
    if (a == d) return if ((b == c) || orderedCCW(refDir(a), c, b, a)) -1 else 0
    if (b == c) return if (orderedCCW(refDir(b), d, a, b)) -1 else 0
    0
  }

  def edgeOrVertexCrossing(a: V3, b: V3, c: V3, d: V3): Boolean = {
    val crossing = crossingSign(a, b, c, d)
    if (crossing < 0) false
    else if (crossing > 0) true
    else vertexCrossing(a, b, c, d)
  }
}

/** Stateful crosser for testing one fixed edge AB against a chain of edges
  * sharing successive vertices — amortizes the expensive orientation of A
  * relative to the chain (reference s2edge_crosser.h:69-195). */
final class EdgeCrosser(a: V3, b: V3) {
  import S2EdgeCrossings._
  import S2Predicates._

  private val aCrossB: V3 = a.cross(b)
  private var haveTangents = false
  private var aTangent: V3 = V3.Zero
  private var bTangent: V3 = V3.Zero
  private var cVert: V3 = V3.Zero
  private var hasC = false
  private var acb: Int = 0
  private var bda: Int = 0

  def this(a: V3, b: V3, c: V3) = { this(a, b); restartAt(c) }

  def c: V3 = cVert

  def restartAt(c: V3): Unit = {
    cVert = c; hasC = true
    acb = -triageSign(a, b, c, aCrossB)
  }

  def crossingSign(cArg: V3, d: V3): Int = {
    if (!hasC || cVert != cArg) restartAt(cArg)
    crossingSign(d)
  }

  def crossingSign(d: V3): Int = {
    val bdaNew = triageSign(a, b, d, aCrossB)
    if (acb == -bdaNew && bdaNew != 0) {
      cVert = d
      acb = -bdaNew
      -1
    } else {
      bda = bdaNew
      crossingSignInternal(d)
    }
  }

  def edgeOrVertexCrossing(d: V3): Boolean = {
    val c0 = cVert
    val crossing = crossingSign(d)
    if (crossing < 0) false
    else if (crossing > 0) true
    else vertexCrossing(a, b, c0, d)
  }

  def signedEdgeOrVertexCrossing(d: V3): Int = {
    val c0 = cVert
    val crossing = crossingSign(d)
    if (crossing < 0) 0
    else if (crossing > 0) acb // == Sign(ABC) when AB crosses CD
    else signedVertexCrossing(a, b, c0, d)
  }

  private def crossingSignInternal(d: V3): Int = {
    val result = crossingSignInternal2(d)
    cVert = d
    acb = -bda
    result
  }

  private def crossingSignInternal2(d: V3): Int = {
    if (!haveTangents) {
      val norm = robustCrossProd(a, b)
      aTangent = a.cross(norm)
      bTangent = norm.cross(b)
      haveTangents = true
    }
    val kError = (1.5 + 1 / math.sqrt(3)) * DblEpsilon
    if ((cVert.dot(aTangent) > kError && d.dot(aTangent) > kError) ||
        (cVert.dot(bTangent) > kError && d.dot(bTangent) > kError)) return -1

    if (a == cVert || a == d || b == cVert || b == d) return 0
    if (a == b || cVert == d) return -1

    if (acb == 0) acb = -expensiveSign(a, b, cVert)
    if (bda == 0) bda = expensiveSign(a, b, d)
    if (bda != acb) return -1

    val cCrossD = cVert.cross(d)
    val cbd = -sign(cVert, d, b, cCrossD)
    if (cbd != acb) return -1
    val dac = sign(cVert, d, a, cCrossD)
    if (dac != acb) -1 else 1
  }
}
