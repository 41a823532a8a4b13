package graft.core

import scala.collection.mutable

/** Polygon boolean operations — the core of the reference's
  * S2BooleanOperation (/root/reference/src/s2/s2boolean_operation.h:211-232)
  * for the Polygon model: UNION / INTERSECTION / DIFFERENCE /
  * SYMMETRIC_DIFFERENCE of valid polygons, producing polygon geometry.
  *
  * Algorithm (crossing-based clipping, the classical Weiler–Atherton walk
  * specialised to the sphere):
  *   1. find all proper crossings between A-edges and B-edges and compute
  *      each crossing point once with [[S2EdgeIntersections.getIntersection]]
  *      (the SAME V3 instance is injected into both edges' subdivisions, so
  *      graph stitching can key on exact object equality);
  *   2. subdivide edges at their crossing points (ordered along the edge);
  *   3. keep each sub-edge according to the operation by classifying its
  *      geodesic midpoint against the OTHER polygon (parity containment);
  *      loops with no crossings are kept/dropped wholesale by classifying
  *      a representative vertex;
  *   4. stitch kept directed sub-edges into output loops: in generic
  *      position every kept vertex has exactly one outgoing kept edge, so
  *      the walk is deterministic.
  *
  * Scope (documented restriction vs the reference): inputs must be valid
  * polygons in GENERIC POSITION — all A/B boundary intersections are
  * proper interior crossings (no shared vertices, no vertex-on-edge, no
  * collinear overlapping edges). The reference handles those degeneracies
  * via S2Builder snap rounding (s2builder.cc); dirty inputs should be
  * snapped first (see graft.operators.Snap).
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

  // one directed edge of an input polygon, with its crossing points
  private final class Edge(val v0: V3, val v1: V3) {
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

    // 1. proper crossings; each intersection point computed exactly once
    for (la <- aEdges; ea <- la; lb <- bEdges; eb <- lb) {
      if (S2EdgeCrossings.crossingSign(ea.v0, ea.v1, eb.v0, eb.v1) > 0) {
        val p = S2EdgeIntersections.getIntersection(ea.v0, ea.v1, eb.v0, eb.v1)
        ea.addCrossing(p)
        eb.addCrossing(p)
      }
    }

    // 2+3. subdivide and select
    val kept = new mutable.ArrayBuffer[(V3, V3)]()
    // keepInside: keep sub-edges whose midpoint is inside `other`
    def selectEdges(loops: Array[Array[Edge]], other: S2Polygon,
                    keepInside: Boolean, reverse: Boolean): Unit = {
      for (loop <- loops) {
        val loopHasCrossings = loop.exists(_.crossings != null)
        if (!loopHasCrossings) {
          // whole-loop classification by a representative vertex
          val rep = loop(0).v0
          if (other.contains(rep) == keepInside) {
            for (e <- loop)
              kept += (if (reverse) (e.v1, e.v0) else (e.v0, e.v1))
          }
        } else {
          for (e <- loop) {
            val pts: Array[V3] =
              if (e.crossings == null) Array(e.v0, e.v1)
              else {
                val sorted = e.crossings.toArray
                  .sortBy(p => (p - e.v0).norm2) // chord from start is monotone along the arc
                (e.v0 +: sorted) :+ e.v1
              }
            var i = 0
            while (i < pts.length - 1) {
              val u = pts(i); val v = pts(i + 1)
              if (u != v && other.contains(geodesicMidpoint(u, v)) == keepInside)
                kept += (if (reverse) (v, u) else (u, v))
              i += 1
            }
          }
        }
      }
    }

    op match {
      case Intersection =>
        selectEdges(aEdges, b, keepInside = true, reverse = false)
        selectEdges(bEdges, a, keepInside = true, reverse = false)
      case Union =>
        selectEdges(aEdges, b, keepInside = false, reverse = false)
        selectEdges(bEdges, a, keepInside = false, reverse = false)
      case Difference =>
        selectEdges(aEdges, b, keepInside = false, reverse = false)
        selectEdges(bEdges, a, keepInside = true, reverse = true)
      case SymmetricDifference =>
        throw new IllegalStateException("handled in apply()")
    }

    // 4. stitch directed sub-edges into loops
    val next = new java.util.HashMap[V3, V3](kept.size * 2)
    kept.foreach { case (u, v) =>
      val prev = next.put(u, v)
      require(prev == null,
        s"non-generic input: vertex $u has two outgoing boundary edges " +
          "(shared vertices / overlapping edges require snap rounding first)")
    }
    val loops = new mutable.ArrayBuffer[S2Loop]()
    val visited = new java.util.HashSet[V3](kept.size * 2)
    kept.foreach { case (start, _) =>
      if (!visited.contains(start)) {
        val verts = new mutable.ArrayBuffer[V3]()
        var cur = start
        var guard = 0
        while (!visited.contains(cur)) {
          visited.add(cur)
          verts += cur
          val n = next.get(cur)
          require(n != null, s"open boundary chain at $cur — non-generic input")
          cur = n
          guard += 1
          require(guard <= kept.size + 1, "stitching did not close")
        }
        require(cur == start, s"chain re-entered at non-start vertex $cur")
        if (verts.length >= 3) {
          // output loops are walked with the RESULT interior on the left:
          // shells come out CCW (area <= 2pi), holes CW (area > 2pi as
          // written). Normalize holes back to small loops — the parity
          // containment model stores every loop with its small interior.
          val loop = S2Loop(verts.toArray)
          loops += (if (loop.area > 2 * math.Pi) S2Loop(verts.reverse.toArray) else loop)
        }
      }
    }
    new S2Polygon(loops.toArray)
  }
}
