package graft.core

import scala.collection.mutable

/** Polyline ⋈ polygon boolean operations — the PolylineModel half of the
  * reference's S2BooleanOperation
  * (/root/reference/src/s2/s2boolean_operation.h:211-270): clip a polyline
  * against a polygon region, emitting the actual clipped polyline pieces
  * (not just a membership filter).
  *
  * Boundary models (s2boolean_operation.h PolylineModel):
  *  - OPEN:      polyline segments lying ON the polygon boundary count as
  *               outside;
  *  - CLOSED:    boundary segments count as inside;
  *  - SEMI_OPEN: a boundary segment counts as inside iff it runs in the
  *               SAME direction as the polygon's boundary edge (polygon
  *               interior on its left) — the direction-sensitive middle
  *               ground the reference defines for matched edges.
  *
  * Degeneracy handling mirrors [[S2BooleanOps]]: polyline edges split at
  * proper crossings and at polygon vertices lying exactly in their
  * interior (exact non-perturbed collinearity,
  * [[S2Predicates.onGreatCircle]]), so collinear overlaps decompose into
  * elementary subsegments that either coincide with one polygon edge or
  * sit strictly off the boundary, where midpoint parity is well-defined.
  * Point-degenerate outputs are discarded (Polygon-model DISCARD
  * semantics for degeneracies).
  */
object PolylineBooleanOps {

  sealed trait Model
  case object Open extends Model
  case object SemiOpen extends Model
  case object Closed extends Model

  /** Portions of `line` inside `poly` (maximal pieces, original order). */
  def intersection(line: Array[V3], poly: S2Polygon,
                   model: Model = Closed): Seq[Array[V3]] =
    clip(line, poly, keepInside = true, model)

  /** Portions of `line` outside `poly`. */
  def difference(line: Array[V3], poly: S2Polygon,
                 model: Model = Closed): Seq[Array[V3]] =
    clip(line, poly, keepInside = false, model)

  // ---- polyline × polyline operands (s2boolean_operation.h polyline
  // model with polyline operands): the 1-dimensional results are the
  // SHARED SUBSEGMENTS. Point contacts (crossings, touching endpoints)
  // are dimension-0 degeneracies and discarded (DISCARD policy). ----

  /** Subsegments of `a` that also lie on `b` (either direction). */
  def polylineIntersection(a: Array[V3], b: Array[V3]): Seq[Array[V3]] =
    sharedSplit(a, b, keepShared = true)

  /** Subsegments of `a` not lying on `b`. */
  def polylineDifference(a: Array[V3], b: Array[V3]): Seq[Array[V3]] =
    sharedSplit(a, b, keepShared = false)

  /** Union as a polyline collection: all of `a` plus `b` minus the shared
    * subsegments (each shared run appears once). */
  def polylineUnion(a: Array[V3], b: Array[V3]): Seq[Array[V3]] =
    Seq(a) ++ polylineDifference(b, a)

  /** Split `a`'s edges at `b`-vertices lying exactly in their interior
    * (collinear-overlap endpoints), then keep/drop elementary subsegments
    * by whether they are contained in some `b` edge. */
  private def sharedSplit(a: Array[V3], b: Array[V3],
                          keepShared: Boolean): Seq[Array[V3]] = {
    val bEdges: Array[(V3, V3, V3)] =
      (0 until b.length - 1).iterator
        .map(i => (b(i), b(i + 1)))
        .filter { case (u, v) => u != v }
        .map { case (u, v) => (u, v, u.cross(v)) }
        .toArray
    def onArcInclusive(c: V3, d: V3, w: V3): Boolean =
      w == c || w == d || S2Predicates.collinearBetween(c, d, w)
    val pieces = new mutable.ArrayBuffer[Array[V3]]()
    val current = new mutable.ArrayBuffer[V3]()
    def flush(): Unit = {
      if (current.length >= 2) pieces += current.toArray
      current.clear()
    }
    var i = 0
    while (i < a.length - 1) {
      val u = a(i); val v = a(i + 1)
      if (u != v) {
        val uxv = u.cross(v)
        var events: mutable.ArrayBuffer[V3] = null
        for ((c, d, _) <- bEdges) {
          for (w <- Iterator(c, d)) {
            if (S2Predicates.onGreatCircle(u, v, uxv, w) &&
                S2Predicates.collinearBetween(u, v, w)) {
              if (events == null) events = new mutable.ArrayBuffer[V3](2)
              events += w
            }
          }
        }
        val pts: Array[V3] =
          if (events == null) Array(u, v)
          else (u +: events.distinct.sortBy(p => (p - u).norm2).toArray) :+ v
        var k = 0
        while (k < pts.length - 1) {
          val p = pts(k); val q = pts(k + 1)
          if (p != q) {
            val shared = bEdges.exists { case (c, d, cxd) =>
              S2Predicates.onGreatCircle(c, d, cxd, p) &&
                S2Predicates.onGreatCircle(c, d, cxd, q) &&
                onArcInclusive(c, d, p) && onArcInclusive(c, d, q)
            }
            if (shared == keepShared) {
              if (current.nonEmpty && current.last == p) current += q
              else { flush(); current += p; current += q }
            } else flush()
          }
          k += 1
        }
      }
      i += 1
    }
    flush()
    pieces.toSeq
  }

  private def clip(line: Array[V3], poly: S2Polygon, keepInside: Boolean,
                   model: Model): Seq[Array[V3]] = {
    // polygon directed edges, interior on the left (holes reversed)
    val pEdges: Array[(V3, V3, V3)] = poly.loops.zipWithIndex.flatMap {
      case (l, li) =>
        val fwd = poly.loopSigns(li) > 0
        (0 until l.numVertices).map { i =>
          val a = l.vertex(i); val b = l.vertex(i + 1)
          if (fwd) (a, b) else (b, a)
        }
    }.map { case (a, b) => (a, b, a.cross(b)) }

    val pieces = new mutable.ArrayBuffer[Array[V3]]()
    val current = new mutable.ArrayBuffer[V3]()
    def flush(): Unit = {
      if (current.length >= 2) pieces += current.toArray
      current.clear()
    }

    /** inclusive on-arc test for a point already on the edge's circle */
    def onArcInclusive(c: V3, d: V3, w: V3): Boolean =
      w == c || w == d || S2Predicates.collinearBetween(c, d, w)

    var i = 0
    while (i < line.length - 1) {
      val u = line(i); val v = line(i + 1)
      if (u != v) {
        val uxv = u.cross(v)
        // split events on this polyline edge
        var events: mutable.ArrayBuffer[V3] = null
        def addEvent(p: V3): Unit = {
          if (events == null) events = new mutable.ArrayBuffer[V3](2)
          events += p
        }
        for ((c, d, cxd) <- pEdges) {
          val t0 = S2Predicates.onGreatCircle(u, v, uxv, c) &&
            S2Predicates.collinearBetween(u, v, c)
          val t1 = S2Predicates.onGreatCircle(u, v, uxv, d) &&
            S2Predicates.collinearBetween(u, v, d)
          if (t0) addEvent(c)
          if (t1) addEvent(d)
          // endpoint-on-boundary contacts rule out an interior crossing
          val uOn = S2Predicates.onGreatCircle(c, d, cxd, u) &&
            S2Predicates.collinearBetween(c, d, u)
          val vOn = S2Predicates.onGreatCircle(c, d, cxd, v) &&
            S2Predicates.collinearBetween(c, d, v)
          if (!t0 && !t1 && !uOn && !vOn &&
              S2EdgeCrossings.crossingSign(u, v, c, d) > 0)
            addEvent(S2EdgeIntersections.getIntersection(u, v, c, d))
        }
        val pts: Array[V3] =
          if (events == null) Array(u, v)
          else (u +: events.distinct.sortBy(p => (p - u).norm2).toArray) :+ v
        var k = 0
        while (k < pts.length - 1) {
          val p = pts(k); val q = pts(k + 1)
          if (p != q) {
            // boundary-coincident subsegment? (after splitting, it either
            // lies within ONE polygon edge or strictly off the boundary)
            val onEdge = pEdges.find { case (c, d, cxd) =>
              S2Predicates.onGreatCircle(c, d, cxd, p) &&
                S2Predicates.onGreatCircle(c, d, cxd, q) &&
                onArcInclusive(c, d, p) && onArcInclusive(c, d, q)
            }
            val inside = onEdge match {
              case Some((c, _, _)) => model match {
                case Closed => true
                case Open => false
                // same direction as the (interior-left) boundary edge:
                // q is farther along c->d than p
                case SemiOpen => (q - c).norm2 > (p - c).norm2
              }
              case None => poly.contains((p + q).normalize)
            }
            if (inside == keepInside) {
              if (current.nonEmpty && current.last == p) current += q
              else { flush(); current += p; current += q }
            } else flush()
          }
          k += 1
        }
      }
      i += 1
    }
    flush()
    pieces.toSeq
  }
}
