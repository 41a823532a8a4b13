package graft.core

/** Spherical convex hull — Andrew's monotone chain around an axis origin,
  * with exact Sign predicates, per the reference algorithm
  * (/root/reference/src/s2/s2convex_hull_query.cc:118-180). */
object S2ConvexHull {
  private val DblErr = 1.1102230246251565e-16 // 0.5 * DBL_EPSILON

  /** Convex hull of the points (plus a rect bound accumulated over them)
    * as a CCW loop. Degenerate inputs follow the reference conventions:
    * empty → empty loop, 1 point → tiny triangle, 2 points → edge loop,
    * bound spanning ≥ hemisphere → full loop. */
  def hull(pointsIn: Seq[V3]): S2Loop = {
    if (pointsIn.isEmpty) return S2Loop.empty
    var bound = {
      val b = new S2LatLngRectBounder
      pointsIn.foreach(b.addPoint)
      b.getBound
    }
    val cap = bound.capBound
    if (cap.height >= 1 - 10 * DblErr) return S2Loop.full

    val origin = S2EdgeCrossings.ortho(cap.center)
    // sort CCW around origin (exact predicate), dedupe
    val pts = pointsIn.distinct.sortWith((x, y) => S2Predicates.sign(origin, x, y) > 0)
    val uniq = pts.toArray

    if (uniq.length == 1) return singlePointLoop(uniq(0))
    if (uniq.length == 2) return singleEdgeLoop(uniq(0), uniq(1))

    // lower + upper monotone chains (CCW-turns-only maximal subsets)
    def chain(ps: Array[V3]): scala.collection.mutable.ArrayBuffer[V3] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[V3]
      ps.foreach { p =>
        while (out.length >= 2 &&
               S2Predicates.sign(out(out.length - 2), out.last, p) <= 0)
          out.remove(out.length - 1)
        out += p
      }
      out
    }
    val lower = chain(uniq)
    val upper = chain(uniq.reverse)
    lower.remove(lower.length - 1)
    upper.remove(upper.length - 1)
    S2Loop((lower ++ upper).toArray)
  }

  private def singlePointLoop(p: V3): S2Loop = {
    val off = 1e-15
    val d0 = S2EdgeCrossings.ortho(p)
    val d1 = p.cross(d0)
    S2Loop(Array(p, (p + d0 * off).normalize, (p + d1 * off).normalize))
  }

  private def singleEdgeLoop(a: V3, b: V3): S2Loop = {
    if (a == -b) return S2Loop.full
    val mid = S2EdgeDistances.interpolate(a, b, 0.5)
    val loop = S2Loop(Array(a, b, mid))
    if (loop.isNormalized) loop else loop.invert
  }
}
