package graft.core

import java.math.{BigDecimal => BigD}

/** Robust orientation predicates: the triage → stable → exact → symbolic
  * escalation ladder. Semantics match the reference exactly
  * (/root/reference/src/s2/s2predicates.h:330-410, s2predicates.cc:40-296):
  * sign() never returns 0 for three distinct points, and the symbolic
  * ("simulation of simplicity") tie-break case order is identical, so
  * every verdict bit-matches the reference's unit tests.
  *
  * The exact tier uses java.math.BigDecimal, which is closed and exact
  * under +,-,× over binary doubles — the same guarantee the reference
  * gets from its bignum ExactFloat.
  */
object S2Predicates {
  final val DblEpsilon = 2.220446049250313e-16
  final val DblErr = DblEpsilon * 0.5
  final val Sqrt3 = 1.7320508075688772
  /** Max error of the plain double determinant (vectors of norm <= sqrt2). */
  final val MaxDetError = 3.6548 * DblEpsilon
  private final val StableDetErrorMultiplier = 3.2321 * DblEpsilon
  private final val MinNoUnderflowError =
    StableDetErrorMultiplier * math.sqrt(java.lang.Double.MIN_NORMAL)

  /** Fast path: sign of (a×b)·c if the result is certain, else 0. */
  def triageSign(a: V3, b: V3, c: V3, aCrossB: V3): Int = {
    val det = aCrossB.dot(c)
    if (det > MaxDetError) 1
    else if (det < -MaxDetError) -1
    else 0
  }

  /** Compensated double determinant with per-case error bound; returns 0
    * when uncertain. Permutes so the longest edge contributes the cross
    * product, exactly as the reference does. */
  def stableSign(a: V3, b: V3, c: V3): Int = {
    val ab = b - a; val bc = c - b; val ca = a - c
    val ab2 = ab.norm2; val bc2 = bc.norm2; val ca2 = ca.norm2
    var det = 0.0; var maxError = 0.0
    if (ab2 >= bc2 && ab2 >= ca2) {
      det = -(ca.cross(bc).dot(c))
      maxError = StableDetErrorMultiplier * math.sqrt(ca2 * bc2)
    } else if (bc2 >= ca2) {
      det = -(ab.cross(ca).dot(a))
      maxError = StableDetErrorMultiplier * math.sqrt(ab2 * ca2)
    } else {
      det = -(bc.cross(ab).dot(b))
      maxError = StableDetErrorMultiplier * math.sqrt(bc2 * ab2)
    }
    if (maxError < MinNoUnderflowError) 0
    else if (math.abs(det) <= maxError) 0
    else if (det > 0) 1
    else -1
  }

  // ---- exact tier ---------------------------------------------------------
  final class XV3(val x: BigD, val y: BigD, val z: BigD) {
    def cross(o: XV3): XV3 = new XV3(
      y.multiply(o.z).subtract(z.multiply(o.y)),
      z.multiply(o.x).subtract(x.multiply(o.z)),
      x.multiply(o.y).subtract(y.multiply(o.x)))
    def dot(o: XV3): BigD =
      x.multiply(o.x).add(y.multiply(o.y)).add(z.multiply(o.z))
  }
  def toExact(p: V3): XV3 =
    new XV3(new BigD(p.x), new BigD(p.y), new BigD(p.z))

  /** Symbolic perturbation tie-break ("Simulation of Simplicity",
    * Edelsbrunner & Muecke 1990); case order identical to the reference
    * (s2predicates.cc:131-224). REQUIRES a < b < c lexicographically and
    * an exactly-zero determinant. */
  private def symbolicallyPerturbedSign(a: XV3, b: XV3, c: XV3,
                                        bCrossC: XV3): Int = {
    var s = bCrossC.z.signum();                       if (s != 0) return s
    s = bCrossC.y.signum();                           if (s != 0) return s
    s = bCrossC.x.signum();                           if (s != 0) return s
    s = c.x.multiply(a.y).subtract(c.y.multiply(a.x)).signum()
    if (s != 0) return s
    s = c.x.signum();                                 if (s != 0) return s
    s = -c.y.signum();                                if (s != 0) return s
    s = c.z.multiply(a.x).subtract(c.x.multiply(a.z)).signum()
    if (s != 0) return s
    s = c.z.signum();                                 if (s != 0) return s
    s = a.x.multiply(b.y).subtract(a.y.multiply(b.x)).signum()
    if (s != 0) return s
    s = -b.x.signum();                                if (s != 0) return s
    s = b.y.signum();                                 if (s != 0) return s
    s = a.x.signum();                                 if (s != 0) return s
    1
  }

  /** Exact determinant sign via BigDecimal; ties broken symbolically when
    * `perturb`. Points must be distinct. */
  def exactSign(a: V3, b: V3, c: V3, perturb: Boolean): Int = {
    var permSign = 1
    var pa = a; var pb = b; var pc = c
    if (!pa.lexLess(pb)) { val t = pa; pa = pb; pb = t; permSign = -permSign }
    if (!pb.lexLess(pc)) { val t = pb; pb = pc; pc = t; permSign = -permSign }
    if (!pa.lexLess(pb)) { val t = pa; pa = pb; pb = t; permSign = -permSign }
    val xa = toExact(pa); val xb = toExact(pb); val xc = toExact(pc)
    val xbCrossXc = xb.cross(xc)
    var detSign = xa.dot(xbCrossXc).signum()
    if (detSign == 0 && perturb)
      detSign = symbolicallyPerturbedSign(xa, xb, xc, xbCrossXc)
    permSign * detSign
  }

  /** Slow path invoked when triage is uncertain; never 0 for distinct
    * points (when perturb). */
  def expensiveSign(a: V3, b: V3, c: V3, perturb: Boolean = true): Int = {
    if (a == b || b == c || c == a) return 0
    val s = stableSign(a, b, c)
    if (s != 0) s else exactSign(a, b, c, perturb)
  }

  /** Orientation of the triangle abc: +1 CCW, -1 CW; never 0 for distinct
    * points. */
  def sign(a: V3, b: V3, c: V3, aCrossB: V3): Int = {
    val s = triageSign(a, b, c, aCrossB)
    if (s != 0) s else expensiveSign(a, b, c)
  }
  def sign(a: V3, b: V3, c: V3): Int = sign(a, b, c, a.cross(b))

  /** True iff c lies EXACTLY on the great circle through a,b — the exact
    * (non-perturbed) determinant is zero. Unlike [[sign]], this answers
    * the non-generic question the boolean ops' degeneracy handling needs:
    * symbolic perturbation would hide true collinearity. Points bitwise
    * equal to a or b count as on-circle. Triage first: a certain nonzero
    * double determinant proves off-circle without exact arithmetic. */
  def onGreatCircle(a: V3, b: V3, aCrossB: V3, c: V3): Boolean =
    triageSign(a, b, c, aCrossB) == 0 &&
      expensiveSign(a, b, c, perturb = false) == 0

  /** For c on the great circle of the edge (a,b) (arc < π): is c strictly
    * interior to the arc? Exact dot comparison — c is between iff both
    * c·a > a·b and c·b > a·b (angles to both endpoints smaller than the
    * arc), endpoints excluded. */
  def collinearBetween(a: V3, b: V3, c: V3): Boolean = {
    if (c == a || c == b) return false
    val xa = toExact(a); val xb = toExact(b); val xc = toExact(c)
    val ab = xa.dot(xb)
    xc.dot(xa).compareTo(ab) > 0 && xc.dot(xb).compareTo(ab) > 0
  }

  /** True if the edges OA, OB, OC are encountered in that order going CCW
    * around O (reference s2predicates.cc:299-312). */
  def orderedCCW(a: V3, b: V3, c: V3, o: V3): Boolean = {
    var sum = 0
    if (sign(b, o, a) >= 0) sum += 1
    if (sign(c, o, b) >= 0) sum += 1
    if (sign(a, o, c) > 0) sum += 1
    sum >= 2
  }
}
