package graft.core

/** Hausdorff distance between shape sets — S2HausdorffDistanceQuery
  * semantics (/root/reference/src/s2/s2hausdorff_distance_query.h:38-61,
  * .cc:30-165), matched exactly: the reference computes the directed
  * distance as the max over TARGET VERTICES of the closest-edge distance
  * to the source (its own comment calls this "this approximation of
  * Hausdorff distance"), with an include_interiors option that reports 0
  * for target vertices inside source polygons, and a lower-bound skip via
  * the exact CompareDistance predicate. Iteration order and the
  * strictly-greater update rule are preserved so target points bit-match.
  *
  * A chain is (vertices, closed); closed chains are polygon loops whose
  * interior counts when includeInteriors. */
object S2Hausdorff {

  final case class Chain(vertices: Array[V3], closed: Boolean) {
    @transient lazy val loop: S2Loop = if (closed) S2Loop(vertices) else null
  }

  final case class DirectedResult(dist2: Double, targetPoint: V3)

  private def distanceToSource2(p: V3, source: IndexedSeq[Chain],
                                includeInteriors: Boolean): Double = {
    var best = Double.MaxValue
    var i = 0
    while (i < source.length) {
      val c = source(i)
      val d =
        if (includeInteriors && c.closed && c.loop.contains(p)) 0.0
        else if (c.vertices.length == 1) (p - c.vertices(0)).norm2
        else S2EdgeDistances.distanceToChain2(p, c.vertices, c.closed)
      if (d < best) best = d
      i += 1
    }
    best
  }

  /** Directed result (max over target vertices of min distance to
    * source); None when either side is empty — the reference returns
    * nullopt / Infinity there. */
  def directedResult(target: IndexedSeq[Chain], source: IndexedSeq[Chain],
                     includeInteriors: Boolean = true): Option[DirectedResult] = {
    if (target.isEmpty || source.isEmpty ||
        target.forall(_.vertices.isEmpty) || source.forall(_.vertices.isEmpty))
      return None
    var maxDist2 = -1.0
    var targetPoint: V3 = null
    var sourcePoint: V3 = null
    for (chain <- target; v <- chain.vertices) {
      // Lower-bound skip (s2hausdorff_distance_query.cc:34-47): if the
      // distance from this vertex to the LAST closest source point cannot
      // exceed the current max, this vertex cannot improve it. Decided by
      // the exact predicate, like the reference.
      val skip = maxDist2 >= 0 &&
        S2DistancePredicates.compareDistance(v, sourcePoint, maxDist2) <= 0
      if (!skip) {
        val d = distanceToSource2(v, source, includeInteriors)
        // strictly-greater update, like the reference (ties keep the
        // earlier target point)
        if (d < Double.MaxValue && d > maxDist2) {
          maxDist2 = d
          targetPoint = v
          sourcePoint = closestSourcePoint(v, source, includeInteriors)
        }
      }
    }
    if (maxDist2 < 0) None else Some(DirectedResult(maxDist2, targetPoint))
  }

  private def closestSourcePoint(p: V3, source: IndexedSeq[Chain],
                                 includeInteriors: Boolean): V3 = {
    var best = Double.MaxValue
    var bestPoint = p
    for (c <- source) {
      if (includeInteriors && c.closed && c.loop.contains(p)) return p
      val vs = c.vertices
      val n = vs.length
      if (n == 1) {
        val d = (p - vs(0)).norm2
        if (d < best) { best = d; bestPoint = vs(0) }
      } else {
        val last = if (c.closed) n else n - 1
        var i = 0
        while (i < last) {
          val a = vs(i); val b = vs(if (i + 1 == n) 0 else i + 1)
          val d = S2EdgeDistances.distance2(p, a, b)
          if (d < best) { best = d; bestPoint = S2EdgeDistances.project(p, a, b) }
          i += 1
        }
      }
    }
    bestPoint
  }

  /** Directed distance (squared chord); +Infinity when undefined. */
  def directedDistance2(target: IndexedSeq[Chain], source: IndexedSeq[Chain],
                        includeInteriors: Boolean = true): Double =
    directedResult(target, source, includeInteriors)
      .map(_.dist2).getOrElse(Double.PositiveInfinity)

  /** Undirected Hausdorff distance (squared chord): max of the two
    * directed distances. */
  def distance2(a: IndexedSeq[Chain], b: IndexedSeq[Chain],
                includeInteriors: Boolean = true): Double =
    math.max(directedDistance2(a, b, includeInteriors),
      directedDistance2(b, a, includeInteriors))

  def isDirectedDistanceLess(target: IndexedSeq[Chain], source: IndexedSeq[Chain],
                             limit2: Double,
                             includeInteriors: Boolean = true): Boolean = {
    val d = directedDistance2(target, source, includeInteriors)
    d != Double.PositiveInfinity && d < limit2
  }
}
