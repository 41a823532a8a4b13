package graft.core

/** Winding-number queries over sets of directed rings —
  * S2WindingOperation semantics (/root/reference/src/s2/s2winding_operation.h:80-196):
  * given directed input loops (interior on the left) and a winding rule,
  * decide region membership by the total winding number. The reference's
  * documented identities hold here: WindingRule.POSITIVE over a stack of
  * CCW loops is their N-way union; ODD is their N-way symmetric
  * difference.
  *
  * Region materialization (`toPolygon`) is supported for ring sets whose
  * boundaries do not cross (overlapping-but-non-crossing stacks, nested
  * stacks, multiplicity > 1); ring sets with crossing boundaries must be
  * resolved pairwise through [[S2BooleanOps]] first — the reference routes
  * the same work through its S2Builder graph machinery. */
object S2Winding {

  sealed trait WindingRule { def matches(w: Int): Boolean }
  case object Positive extends WindingRule { def matches(w: Int): Boolean = w > 0 }
  case object Negative extends WindingRule { def matches(w: Int): Boolean = w < 0 }
  case object NonZero extends WindingRule { def matches(w: Int): Boolean = w != 0 }
  case object Odd extends WindingRule { def matches(w: Int): Boolean = (w & 1) != 0 }

  /** A directed ring contributes +1 to points on its interior-left side
    * when wound CCW around its small region, and -1 to points in its small
    * region when wound CW. */
  def ringWinding(ring: Array[V3], p: V3): Int = {
    val l = S2Loop(ring)
    if (l.area <= 2 * math.Pi) { if (l.contains(p)) 1 else 0 }
    else { if (!l.contains(p)) -1 else 0 }
  }

  /** Total winding number of p over all rings. */
  def windingNumber(rings: Seq[Array[V3]], p: V3): Int =
    rings.iterator.map(ringWinding(_, p)).sum

  def contains(rings: Seq[Array[V3]], rule: WindingRule, p: V3): Boolean =
    rule.matches(windingNumber(rings, p))

  /** Materialize the rule region as a parity-model polygon.
    * REQUIRES ring boundaries pairwise non-crossing (the nesting of the
    * rule region is then decidable per ring). A ring belongs to the output
    * boundary iff crossing it flips rule membership; kept rings are
    * normalized to small interiors for the parity model. */
  def toPolygon(rings: Seq[Array[V3]], rule: WindingRule): S2Polygon = {
    def cross(a: Array[V3], b: Array[V3]): Boolean = {
      var i = 0
      while (i < a.length) {
        var j = 0
        while (j < b.length) {
          if (S2EdgeCrossings.crossingSign(a(i), a((i + 1) % a.length),
              b(j), b((j + 1) % b.length)) > 0) return true
          j += 1
        }
        i += 1
      }
      false
    }
    for (i <- rings.indices; j <- i + 1 until rings.length)
      require(!cross(rings(i), rings(j)),
        s"rings $i and $j cross: resolve through S2BooleanOps first")
    // group geometrically-coincident rings into bundles (same vertex set;
    // a multiplicity-2 boundary flips the winding by its summed delta and
    // contributes at most ONE output ring)
    def key(r: Array[V3]): Set[V3] = r.toSet
    val bundles = rings.indices.groupBy(i => key(rings(i))).values.toSeq
    val keptLoops = bundles.flatMap { bundle =>
      val ring = rings(bundle.head)
      val l = S2Loop(ring)
      val small = if (l.area <= 2 * math.Pi) l else S2Loop(ring.reverse)
      val delta = bundle.map { i =>
        if (S2Loop(rings(i)).area <= 2 * math.Pi) 1 else -1
      }.sum
      val others = rings.indices.filterNot(bundle.contains).map(rings(_))
      val (pin, pout) = boundaryProbes(small)
      val wInside = windingNumber(others, pin) + delta
      val wOutside = windingNumber(others, pout)
      if (rule.matches(wInside) != rule.matches(wOutside)) Some(small) else None
    }
    new S2Polygon(keptLoops.toArray)
  }

  /** Points JUST inside and just outside the loop boundary (edge-midpoint
    * nudged by epsilon). The probes must hug the boundary — a
    * deep-interior point (e.g. the centroid) could land inside a ring
    * nested within this one and misreport the winding immediately inside
    * this boundary. */
  private def boundaryProbes(l: S2Loop): (V3, V3) = {
    val a = l.vertex(0); val b = l.vertex(1)
    val mid = (a + b).normalize
    val n = S2EdgeCrossings.robustCrossProd(a, b).normalize
    val eps = 1e-9
    val p1 = (mid * math.cos(eps)) + (n * math.sin(eps))
    val p2 = (mid * math.cos(eps)) - (n * math.sin(eps))
    if (l.contains(p1)) (p1, p2) else (p2, p1)
  }
}
