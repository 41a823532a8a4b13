package graft.core

import scala.collection.mutable

/** Polyline×polyline relational predicates — the reference's
  * S2Polyline::Intersects (s2polyline.cc:356-375) and
  * S2Polyline::NearlyCovers (s2polyline.cc:722-830, the "two cars"
  * non-decreasing reparameterization search), plus the
  * S2::IsEdgeBNearEdgeA edge-proximity kernel it depends on
  * (s2edge_distances.cc:421-480). */
object S2PolylineRelations {

  /** True when the two chains share any point: a proper edge crossing or
    * a vertex/edge touch (CrossingSign >= 0). Empty and single-vertex
    * chains never intersect (no edges). */
  def intersects(a: Array[V3], b: Array[V3]): Boolean = {
    if (a.length <= 1 || b.length <= 1) return false
    var i = 1
    while (i < a.length) {
      val crosser = new EdgeCrosser(a(i - 1), a(i), b(0))
      var j = 1
      while (j < b.length) {
        if (crosser.crossingSign(b(j)) >= 0) return true
        j += 1
      }
      i += 1
    }
    false
  }

  /** True when every point of edge B stays within `toleranceRad` of edge
    * A (reference S2::IsEdgeBNearEdgeA): endpoint proximity first, then
    * the inter-plane angle, with the interior-maximum check via the
    * point where circ(B) is furthest from circ(A). */
  def isEdgeBNearEdgeA(a0: V3, a1: V3, b0: V3, b1: V3,
                       toleranceRad: Double): Boolean = {
    var aOrtho = S2EdgeCrossings.robustCrossProd(a0, a1).normalize
    val aNearestB0 = S2EdgeDistances.project(b0, a0, a1)
    val aNearestB1 = S2EdgeDistances.project(b1, a0, a1)
    // orient aOrtho with the projected direction of B so oppositely
    // oriented near edges are handled (reference comment at :436)
    if (S2Predicates.sign(aOrtho, aNearestB0, aNearestB1) < 0)
      aOrtho = aOrtho * -1.0
    if (b0.angle(aNearestB0) > toleranceRad ||
        b1.angle(aNearestB1) > toleranceRad) return false
    val bOrtho = S2EdgeCrossings.robustCrossProd(b0, b1).normalize
    val planarAngle = aOrtho.angle(bOrtho)
    if (planarAngle <= toleranceRad) return true
    if (planarAngle >= math.Pi / 2) {
      // opposite hemispheres vs short-B-near-one-endpoint (reference :455)
      return (b0.angle(a0) < b0.angle(a1)) == (b1.angle(a0) < b1.angle(a1))
    }
    // interior maximum: the two points where circ(B) is furthest from
    // circ(A); B is near A iff neither lies on B's interior
    val furthest = bOrtho.cross(
      S2EdgeCrossings.robustCrossProd(aOrtho, bOrtho)).normalize
    val furthestInv = furthest * -1.0
    !((S2Predicates.sign(bOrtho, b0, furthest) > 0 &&
       S2Predicates.sign(furthest, b1, bOrtho) > 0) ||
      (S2Predicates.sign(bOrtho, b0, furthestInv) > 0 &&
       S2Predicates.sign(furthestInv, b1, bOrtho) > 0))
  }

  private final case class State(i: Int, j: Int, iInProgress: Boolean)

  /** True when `covered` lies within `maxErrorRad` of a contiguous
    * subpath of `self` under some non-decreasing reparameterization
    * (reference NearlyCovers "two cars" contract):
    *   anything.nearlyCovers(empty) = true
    *   empty.nearlyCovers(nonempty) = false
    * Stack search over (i, j, iInProgress) states with a visited set —
    * O((n+m) log(n+m)) like the reference. */
  def nearlyCovers(self: Array[V3], covered: Array[V3],
                   maxErrorRad: Double): Boolean = {
    if (covered.isEmpty) return true
    if (self.isEmpty) return false

    def nextDistinct(p: Array[V3], i: Int): Int = {
      val initial = p(i)
      var k = i
      while ({ k += 1; k < p.length && p(k) == initial }) ()
      k
    }

    val pending = mutable.ArrayBuffer.empty[State]
    val done = mutable.HashSet.empty[State]

    // starting states: every edge of self within maxError of covered(0);
    // exclude each edge's end vertex except on the last distinct edge so
    // starts are not duplicated (reference :779-784)
    var i = 0
    var nextI = nextDistinct(self, 0)
    while (nextI < self.length) {
      val nextNextI = nextDistinct(self, nextI)
      val closest = S2EdgeDistances.project(covered(0), self(i), self(nextI))
      if ((nextNextI == self.length || closest != self(nextI)) &&
          closest.angle(covered(0)) <= maxErrorRad)
        pending += State(i, 0, iInProgress = true)
      i = nextI
      nextI = nextNextI
    }

    while (pending.nonEmpty) {
      val st = pending.remove(pending.length - 1)
      if (done.add(st)) {
        val nI = nextDistinct(self, st.i)
        val nJ = nextDistinct(covered, st.j)
        if (nJ == covered.length) return true
        else if (nI != self.length) {
          var iBegin: V3 = null
          var jBegin: V3 = null
          if (st.iInProgress) {
            jBegin = covered(st.j)
            iBegin = S2EdgeDistances.project(jBegin, self(st.i), self(nI))
          } else {
            iBegin = self(st.i)
            jBegin = S2EdgeDistances.project(iBegin, covered(st.j), covered(nJ))
          }
          if (isEdgeBNearEdgeA(jBegin, covered(nJ), iBegin, self(nI), maxErrorRad))
            pending += State(nI, st.j, iInProgress = false)
          if (isEdgeBNearEdgeA(iBegin, self(nI), jBegin, covered(nJ), maxErrorRad))
            pending += State(st.i, nJ, iInProgress = true)
        }
      }
    }
    false
  }
}
