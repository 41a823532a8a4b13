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

  /** Overlap fractions between two polygons: the ratios of the area of
    * their intersection to the area of each operand, clamped to 1
    * (S2Polygon::GetOverlapFractions, /root/reference/src/s2/s2polygon.cc:600-610
    * — an empty operand yields fraction 1, matching the 0/0 >= clamp). */
  def overlapFractions(a: S2Polygon, b: S2Polygon): (Double, Double) = {
    val ia = intersection(a, b).area
    val aa = a.area
    val ba = b.area
    (if (ia >= aa) 1.0 else ia / aa, if (ia >= ba) 1.0 else ia / ba)
  }

  /** Default snap radius of the polygon-level ops — the reference's
    * S2Polygon Init* default, IdentitySnapFunction(kIntersectionMergeRadius)
    * (/root/reference/src/s2/s2polygon.h:365-366,
    * s2edge_crossings.h:233 — 2 * kIntersectionError ≈ 1.8e-15 rad). */
  val MergeRadius: Double = 2 * S2EdgeIntersections.IntersectionErrorRadians

  def apply(op: Op, a: S2Polygon, b: S2Polygon): S2Polygon =
    apply(op, a, b, MergeRadius)

  def apply(op: Op, a: S2Polygon, b: S2Polygon, snapRadius: Double): S2Polygon = op match {
    case SymmetricDifference =>
      // disjoint boundaries by construction: (A-B) and (B-A) interiors are
      // disjoint, so parity over the union of their loop sets is correct
      new S2Polygon(apply(Difference, a, b, snapRadius).loops ++
        apply(Difference, b, a, snapRadius).loops)
    case _ if a.isEmpty =>
      if (op == Union) b else S2Polygon.empty
    case _ if b.isEmpty =>
      if (op == Intersection) S2Polygon.empty else a
    case _ => clip(op, a, b, snapRadius)
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

  /** Snap phase 0 (the role the reference's IdentitySnapFunction plays
    * inside S2BooleanOperation): merge the two operands' vertices that lie
    * within `snapRadius` of each other onto one canonical instance — later
    * (b-side) vertices snap onto earlier (a-side) ones — so near-shared
    * corners become EXACT shared vertices before event detection. Returns
    * the rebuilt polygons (consecutive duplicates collapsed, loops that
    * degenerate below 3 vertices dropped). */
  private def snapOperands(a: S2Polygon, b: S2Polygon,
                           chord2: Double): (S2Polygon, S2Polygon) = {
    val canon = new mutable.ArrayBuffer[V3]()
    val canonOf = new java.util.HashMap[V3, V3]()
    def snapV(v: V3): V3 = {
      val hit = canonOf.get(v)
      if (hit != null) hit
      else {
        val c = canon.find(c => (c - v).norm2 <= chord2).getOrElse { canon += v; v }
        canonOf.put(v, c); c
      }
    }
    def rebuild(p: S2Polygon): S2Polygon = {
      val loops = p.loops.flatMap { l =>
        if (l.isEmptyOrFull) Some(l)
        else {
          val mapped = l.vertices.map(snapV)
          val dedup = new mutable.ArrayBuffer[V3](mapped.length)
          for (v <- mapped) if (dedup.isEmpty || dedup.last != v) dedup += v
          while (dedup.length > 1 && dedup.head == dedup.last) dedup.remove(dedup.length - 1)
          if (dedup.length >= 3) Some(S2Loop(dedup.toArray)) else None
        }
      }
      // common fast path: nothing moved — keep the original instance
      // (with its cached bounds/signs)
      if (loops.length == p.loops.length &&
          loops.iterator.zip(p.loops.iterator).forall { case (x, y) =>
            x.vertices.sameElements(y.vertices) }) p
      else new S2Polygon(loops)
    }
    // seed the canonical set with a's vertices so b snaps onto a
    (rebuild(a), rebuild(b))
  }

  private def clip(op: Op, a0: S2Polygon, b0: S2Polygon,
                   snapRadius: Double): S2Polygon = {
    // squared chord length of the snap radius
    val snapChord2 = {
      val s = math.sin(0.5 * math.min(math.Pi, math.max(0.0, snapRadius)))
      4 * s * s
    }
    val (a, b) = snapOperands(a0, b0, snapChord2)
    if (a.isEmpty) return (if (op == Union) b else S2Polygon.empty)
    if (b.isEmpty) return (if (op == Intersection) S2Polygon.empty else a)
    val aEdges = edgesOf(a)
    val bEdges = edgesOf(b)

    // 1. split events (see object scaladoc). T-junction/overlap-endpoint
    // events and proper crossings are mutually exclusive per pair: two
    // distinct great circles meet in one point per hemisphere, so an
    // endpoint-on-edge contact rules out an additional interior crossing,
    // and same-circle (collinear) pairs have no transversal crossing.
    // An endpoint counts as ON the other edge when it is EXACTLY collinear
    // (the original exact path) or within the snap radius of the edge's
    // interior (the snap path: the edge reroutes through the vertex, so a
    // boundary stretch that HUGS the other boundary within the snap radius
    // decomposes into bitwise-identical elementary segments and is decided
    // by the coincidence rule instead of ill-conditioned midpoint parity —
    // e.g. same-latitude edges of the two operands sharing a meridian
    // great circle with inexactly-computed vertices).
    def onEdge(e: Edge, w: V3): Boolean = {
      if (w == e.v0 || w == e.v1) false
      else if (S2Predicates.onGreatCircle(e.v0, e.v1, e.x, w) &&
        S2Predicates.collinearBetween(e.v0, e.v1, w)) true
      else if (snapChord2 > 0) {
        val xa2 = (w - e.v0).norm2
        val xb2 = (w - e.v1).norm2
        val d = S2EdgeDistances.interiorDistance2(w, e.v0, e.v1, xa2, xb2)
        d >= 0 && d <= snapChord2
      } else false
    }
    for (la <- aEdges; ea <- la; lb <- bEdges; eb <- lb) {
      val e0 = onEdge(ea, eb.v0)
      val e1 = onEdge(ea, eb.v1)
      val f0 = onEdge(eb, ea.v0)
      val f1 = onEdge(eb, ea.v1)
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
