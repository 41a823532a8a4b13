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

    // 2+3. subdivide and select. Each kept edge carries a source tag
    // (operand, loop index) so the stitcher can prefer same-source
    // continuation at vertices shared between loops.
    val kept = new mutable.ArrayBuffer[(V3, V3, Int)]()
    // keepInside: keep sub-edges whose midpoint is inside `other`
    def selectEdges(loops: Array[Array[Edge]], other: S2Polygon,
                    keepInside: Boolean, reverse: Boolean, tagBase: Int): Unit = {
      for ((loop, li) <- loops.zipWithIndex) {
        val tag = tagBase + li
        val loopHasCrossings = loop.exists(_.crossings != null)
        if (!loopHasCrossings) {
          // whole-loop classification by the midpoint of the first edge —
          // NOT a vertex: in vertex-touching configurations a vertex may
          // lie exactly on the other polygon's boundary, while interior
          // edge points do not
          val rep = geodesicMidpoint(loop(0).v0, loop(0).v1)
          if (other.contains(rep) == keepInside) {
            for (e <- loop)
              kept += (if (reverse) (e.v1, e.v0, tag) else (e.v0, e.v1, tag))
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
                kept += (if (reverse) (v, u, tag) else (u, v, tag))
              i += 1
            }
          }
        }
      }
    }

    op match {
      case Intersection =>
        selectEdges(aEdges, b, keepInside = true, reverse = false, 0)
        selectEdges(bEdges, a, keepInside = true, reverse = false, 1 << 20)
      case Union =>
        selectEdges(aEdges, b, keepInside = false, reverse = false, 0)
        selectEdges(bEdges, a, keepInside = false, reverse = false, 1 << 20)
      case Difference =>
        selectEdges(aEdges, b, keepInside = false, reverse = false, 0)
        selectEdges(bEdges, a, keepInside = true, reverse = true, 1 << 20)
      case SymmetricDifference =>
        throw new IllegalStateException("handled in apply()")
    }

    // 4. stitch directed sub-edges into loops. The kept set forms a
    // balanced directed multigraph (every vertex has equal in/out degree
    // because crossing a kept boundary flips rule membership), so ANY
    // edge-consuming walk decomposes it into closed loops and every
    // decomposition is parity-equivalent. At vertices shared between
    // loops (vertex-touching inputs) we prefer continuing along the same
    // source loop, which yields the touching loops separately instead of
    // a figure-eight.
    final case class Out(v: V3, tag: Int)
    val outs = new java.util.HashMap[V3, mutable.ArrayBuffer[Out]](kept.size * 2)
    kept.foreach { case (u, v, tag) =>
      var lst = outs.get(u)
      if (lst == null) { lst = new mutable.ArrayBuffer[Out](2); outs.put(u, lst) }
      lst += Out(v, tag)
    }
    def takeOut(u: V3, prefTag: Int): Out = {
      val lst = outs.get(u)
      require(lst != null && lst.nonEmpty,
        s"open boundary chain at $u — collinear/overlapping edges are not " +
          "supported (snap-round inputs first)")
      val i = {
        val j = lst.indexWhere(_.tag == prefTag)
        if (j >= 0) j else 0
      }
      val o = lst.remove(i)
      if (lst.isEmpty) outs.remove(u)
      o
    }
    val loops = new mutable.ArrayBuffer[S2Loop]()
    var remaining = kept.size
    var scanIdx = 0
    while (remaining > 0) {
      // find an unconsumed starting edge
      while (scanIdx < kept.length && {
        val lst = outs.get(kept(scanIdx)._1)
        lst == null || !lst.exists(o => o.v == kept(scanIdx)._2 && o.tag == kept(scanIdx)._3)
      }) scanIdx += 1
      require(scanIdx < kept.length, "stitch scan exhausted with edges remaining")
      val (start, _, startTag) = kept(scanIdx)
      val verts = new mutable.ArrayBuffer[V3]()
      var cur = start
      var curTag = startTag
      var guard = 0
      var done = false
      while (!done) {
        verts += cur
        val o = takeOut(cur, curTag)
        remaining -= 1
        cur = o.v; curTag = o.tag
        guard += 1
        require(guard <= kept.size + 1, "stitching did not close")
        if (cur == start) done = true
      }
      if (verts.length >= 3) {
        // output loops are walked with the RESULT interior on the left:
        // shells come out CCW (area <= 2pi), holes CW (area > 2pi as
        // written). Normalize holes back to small loops — the parity
        // containment model stores every loop with its small interior.
        val loop = S2Loop(verts.toArray)
        loops += (if (loop.area > 2 * math.Pi) S2Loop(verts.reverse.toArray) else loop)
      }
    }
    new S2Polygon(loops.toArray)
  }
}
