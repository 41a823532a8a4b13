package graft.core

import scala.collection.mutable

/** Polygon boolean operations — the core of the reference's
  * S2BooleanOperation (/root/reference/src/s2/s2boolean_operation.h:211-232)
  * for the Polygon model: UNION / INTERSECTION / DIFFERENCE /
  * SYMMETRIC_DIFFERENCE of valid polygons, producing polygon geometry.
  *
  * Algorithm (crossing-based clipping, the classical Weiler–Atherton walk
  * specialised to the sphere, with native degeneracy decomposition — the
  * role S2Builder graph edges play in the reference,
  * /root/reference/src/s2/s2boolean_operation.cc:52-108):
  *   1. split events between A-edges and B-edges:
  *      - proper interior crossings: computed once with
  *        [[S2EdgeIntersections.getIntersection]]; the SAME V3 instance is
  *        injected into both edges' subdivisions, so graph stitching can
  *        key on exact value equality;
  *      - a vertex of one operand lying EXACTLY in the interior of the
  *        other's edge (a T-junction, or an endpoint of a collinear
  *        overlap) splits that edge at the shared vertex instance.
  *        Collinearity is decided by the exact non-perturbed determinant
  *        ([[S2Predicates.onGreatCircle]]) — after these splits, every
  *        collinear-overlapping portion is a pair of bitwise-identical
  *        elementary segments;
  *   2. subdivide edges at their event points (ordered along the edge)
  *      into elementary directed subsegments, operand interior on the
  *      left;
  *   3. keep each elementary segment by the uniform left/right-membership
  *      rule: compute (inA, inB) for the region on each side — from edge
  *      orientation when the segment lies on that operand's boundary
  *      (including B-coincident segments, same or opposite direction),
  *      from parity containment of the geodesic midpoint otherwise — and
  *      keep the direction whose left side is in the result and right
  *      side is not. Coincident segments are emitted at most once;
  *   4. stitch kept directed sub-edges into output loops (balanced
  *      directed multigraph walk: [[LoopStitcher]] min-clockwise-turn
  *      face traversal with on-path sub-cycle extraction at pinch
  *      vertices).
  *
  * Scope: inputs must be VALID polygons (no self-intersections); shared
  * vertices, vertex-on-edge touches, and collinear overlapping edges
  * between the two operands are handled natively. Only the Polygon model
  * is implemented here (closed boundaries, degenerate outputs discarded);
  * polyline clipping lives in [[PolylineBooleanOps]].
  */
object S2BooleanOps {
  sealed trait Op
  case object Union extends Op
  case object Intersection extends Op
  case object Difference extends Op
  case object SymmetricDifference extends Op

  def union(a: S2Polygon, b: S2Polygon): S2Polygon = apply(Union, a, b)
  def intersection(a: S2Polygon, b: S2Polygon): S2Polygon = apply(Intersection, a, b)
  def difference(a: S2Polygon, b: S2Polygon): S2Polygon = apply(Difference, a, b)
  def symmetricDifference(a: S2Polygon, b: S2Polygon): S2Polygon =
    apply(SymmetricDifference, a, b)

  def apply(op: Op, a: S2Polygon, b: S2Polygon): S2Polygon = op match {
    case SymmetricDifference =>
      // disjoint boundaries by construction: (A-B) and (B-A) interiors are
      // disjoint, so parity over the union of their loop sets is correct
      new S2Polygon(apply(Difference, a, b).loops ++ apply(Difference, b, a).loops)
    case _ if a.isEmpty =>
      if (op == Union) b else S2Polygon.empty
    case _ if b.isEmpty =>
      if (op == Intersection) S2Polygon.empty else a
    case _ => clip(op, a, b)
  }

  // one directed edge of an input polygon, with its split-event points
  private final class Edge(val v0: V3, val v1: V3) {
    val x: V3 = v0.cross(v1) // triage normal for the on-circle test
    var crossings: mutable.ArrayBuffer[V3] = null
    def addCrossing(p: V3): Unit = {
      if (crossings == null) crossings = new mutable.ArrayBuffer[V3](2)
      crossings += p
    }
  }

  /** Directed edges with the polygon INTERIOR ON THE LEFT: shells (even
    * nesting depth, stored CCW) as written, holes walked in reverse. This
    * is what makes the stitching walk direction-consistent — at a crossing
    * the kept incoming and outgoing arcs always bound the same sector. */
  private def edgesOf(p: S2Polygon): Array[Array[Edge]] =
    p.loops.zipWithIndex.map { case (l, li) =>
      if (p.loopSigns(li) > 0)
        Array.tabulate(l.numVertices)(i => new Edge(l.vertex(i), l.vertex(i + 1)))
      else
        Array.tabulate(l.numVertices)(i => new Edge(l.vertex(i + 1), l.vertex(i)))
    }

  private def geodesicMidpoint(u: V3, v: V3): V3 = (u + v).normalize

  private def clip(op: Op, a: S2Polygon, b: S2Polygon): S2Polygon = {
    val aEdges = edgesOf(a)
    val bEdges = edgesOf(b)

    // 1. split events (see object scaladoc). T-junction/overlap-endpoint
    // events and proper crossings are mutually exclusive per pair: two
    // distinct great circles meet in one point per hemisphere, so an
    // endpoint-on-edge contact rules out an additional interior crossing,
    // and same-circle (collinear) pairs have no transversal crossing.
    for (la <- aEdges; ea <- la; lb <- bEdges; eb <- lb) {
      val e0 = S2Predicates.onGreatCircle(ea.v0, ea.v1, ea.x, eb.v0) &&
        S2Predicates.collinearBetween(ea.v0, ea.v1, eb.v0)
      val e1 = S2Predicates.onGreatCircle(ea.v0, ea.v1, ea.x, eb.v1) &&
        S2Predicates.collinearBetween(ea.v0, ea.v1, eb.v1)
      val f0 = S2Predicates.onGreatCircle(eb.v0, eb.v1, eb.x, ea.v0) &&
        S2Predicates.collinearBetween(eb.v0, eb.v1, ea.v0)
      val f1 = S2Predicates.onGreatCircle(eb.v0, eb.v1, eb.x, ea.v1) &&
        S2Predicates.collinearBetween(eb.v0, eb.v1, ea.v1)
      if (e0) ea.addCrossing(eb.v0)
      if (e1) ea.addCrossing(eb.v1)
      if (f0) eb.addCrossing(ea.v0)
      if (f1) eb.addCrossing(ea.v1)
      if (!e0 && !e1 && !f0 && !f1 &&
          S2EdgeCrossings.crossingSign(ea.v0, ea.v1, eb.v0, eb.v1) > 0) {
        val p = S2EdgeIntersections.getIntersection(ea.v0, ea.v1, eb.v0, eb.v1)
        ea.addCrossing(p)
        eb.addCrossing(p)
      }
    }

    // 2. elementary directed subsegments, operand interior on the left.
    final case class Sub(u: V3, v: V3)
    def subsegments(loops: Array[Array[Edge]]): mutable.ArrayBuffer[Sub] = {
      val out = new mutable.ArrayBuffer[Sub]()
      for (loop <- loops; e <- loop) {
        val pts: Array[V3] =
          if (e.crossings == null) Array(e.v0, e.v1)
          else {
            // distinct: adjacent edges of the other operand inject their
            // shared vertex once per incident edge
            val sorted = e.crossings.distinct.toArray
              .sortBy(p => (p - e.v0).norm2) // chord from start is monotone along the arc
            (e.v0 +: sorted) :+ e.v1
          }
        var i = 0
        while (i < pts.length - 1) {
          if (pts(i) != pts(i + 1)) out += Sub(pts(i), pts(i + 1))
          i += 1
        }
      }
      out
    }
    val aSubs = subsegments(aEdges)
    val bSubs = subsegments(bEdges)

    // coincidence maps over undirected elementary keys (coincident
    // segments are bitwise-identical after event splitting)
    def keyOf(u: V3, v: V3): (V3, V3) = if (u.lexLess(v)) (u, v) else (v, u)
    def dirOf(u: V3, v: V3): Int = if (u.lexLess(v)) 1 else -1
    val bByKey = new java.util.HashMap[(V3, V3), Integer](bSubs.size * 2)
    bSubs.foreach(s => bByKey.put(keyOf(s.u, s.v), Integer.valueOf(dirOf(s.u, s.v))))
    val aKeys = new java.util.HashSet[(V3, V3)](aSubs.size * 2)
    aSubs.foreach(s => aKeys.add(keyOf(s.u, s.v)))

    // 3. uniform left/right-membership selection
    def inResult(inA: Boolean, inB: Boolean): Boolean = op match {
      case Union => inA || inB
      case Intersection => inA && inB
      case Difference => inA && !inB
      case SymmetricDifference => throw new IllegalStateException("handled in apply()")
    }
    val kept = new mutable.ArrayBuffer[(V3, V3)]()
    def emit(u: V3, v: V3, leftIn: Boolean, rightIn: Boolean): Unit = {
      if (leftIn && !rightIn) kept += ((u, v))
      else if (rightIn && !leftIn) kept += ((v, u))
    }
    for (s <- aSubs) {
      val bDir = bByKey.get(keyOf(s.u, s.v))
      if (bDir != null) {
        // segment lies on BOTH boundaries: B's interior is on the left
        // exactly when the coincident B segment runs the same direction
        val sameDir = bDir.intValue == dirOf(s.u, s.v)
        emit(s.u, s.v, inResult(inA = true, inB = sameDir),
          inResult(inA = false, inB = !sameDir))
      } else {
        // strictly off B's boundary: midpoint parity is well-defined
        val inB = b.contains(geodesicMidpoint(s.u, s.v))
        emit(s.u, s.v, inResult(inA = true, inB = inB),
          inResult(inA = false, inB = inB))
      }
    }
    for (s <- bSubs) {
      if (!aKeys.contains(keyOf(s.u, s.v))) { // coincident ones already decided
        val inA = a.contains(geodesicMidpoint(s.u, s.v))
        emit(s.u, s.v, inResult(inA = inA, inB = true),
          inResult(inA = inA, inB = false))
      }
    }

    // 4. stitch directed sub-edges into loops. The kept set forms a
    // balanced directed multigraph (every vertex has equal in/out degree
    // because crossing a kept boundary flips rule membership);
    // [[LoopStitcher]] decomposes it into SIMPLE loops (min-clockwise-turn
    // face traversal at pinch vertices + on-path sub-cycle extraction —
    // see its scaladoc for why both are needed) and normalizes to the
    // parity model's small interiors.
    new S2Polygon(LoopStitcher.stitchNormalized(
      kept.toSeq,
      "boolean operation (self-intersecting operand?)"))
  }
}
