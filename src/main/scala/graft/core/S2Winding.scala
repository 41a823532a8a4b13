package graft.core

/** Winding-number queries over sets of directed rings —
  * S2WindingOperation semantics (/root/reference/src/s2/s2winding_operation.h:80-196):
  * given directed input loops (interior on the left) and a winding rule,
  * decide region membership by the total winding number. The reference's
  * documented identities hold here: WindingRule.POSITIVE over a stack of
  * CCW loops is their N-way union; ODD is their N-way symmetric
  * difference.
  *
  * Region materialization (`toPolygon`) supports ARBITRARY ring sets —
  * crossing boundaries, coincident stacks, multiplicity > 1 — via the
  * same elementary-subsegment decomposition as [[S2BooleanOps]],
  * generalized to N winding rings (the reference routes this work through
  * its S2Builder graph machinery). */
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

  /** Row-at-a-time winding evaluator with PREBUILT loops — the form to
    * close over in a UDF or mapPartitions: [[windingNumber]] rebuilds
    * each ring's S2Loop (originInside + bound) per call, which is wasted
    * work when probing millions of points against a fixed ring set. */
  final class Evaluator(rings: Seq[Array[V3]]) extends Serializable {
    private val loops: Array[S2Loop] = rings.map(S2Loop(_)).toArray
    private val smallInterior: Array[Boolean] = loops.map(_.area <= 2 * math.Pi)
    def winding(p: V3): Int = {
      var w = 0
      var i = 0
      while (i < loops.length) {
        val in = loops(i).contains(p)
        if (smallInterior(i)) { if (in) w += 1 }
        else { if (!in) w -= 1 }
        i += 1
      }
      w
    }
  }
  def evaluator(rings: Seq[Array[V3]]): Evaluator = new Evaluator(rings)

  /** Materialize the rule region as a parity-model polygon — ARBITRARY
    * ring sets, crossing boundaries included (the reference routes this
    * through its S2Builder graph machinery,
    * s2winding_operation.cc; here the same decomposition as
    * [[S2BooleanOps]] generalizes from 2 operands to N winding rings):
    *
    *  1. split every cross-ring edge pair at proper crossings and exact
    *     vertex-on-edge / collinear-overlap events → elementary
    *     subsegments (bitwise-identical where boundaries coincide);
    *  2. bundle coincident subsegments; for each bundle compute the
    *     winding number on each side: base winding of the midpoint over
    *     rings NOT passing through the segment (midpoint is strictly off
    *     their boundaries after splitting), plus each passing ring's
    *     side contribution (+1 on the small-interior side for CCW rings,
    *     −1 for CW — direction-relative);
    *  3. keep the bundle iff rule membership differs across it, directed
    *     with the rule region on the left;
    *  4. stitch the balanced directed multigraph into loops, normalized
    *     to small interiors for the parity model. */
  def toPolygon(rings: Seq[Array[V3]], rule: WindingRule): S2Polygon = {
    val ringArr = rings.toArray
    val ccw: Array[Boolean] = ringArr.map(r => S2Loop(r).area <= 2 * math.Pi)

    // directed edges as GIVEN (winding orientation preserved), with the
    // triage normal and per-edge split-event buffer
    final class E(val v0: V3, val v1: V3, val ring: Int) {
      val x: V3 = v0.cross(v1)
      var events: scala.collection.mutable.ArrayBuffer[V3] = null
      def add(p: V3): Unit = {
        if (events == null) events = new scala.collection.mutable.ArrayBuffer[V3](2)
        events += p
      }
    }
    val edges: Array[E] = ringArr.zipWithIndex.flatMap { case (r, ri) =>
      r.indices.map(i => new E(r(i), r((i + 1) % r.length), ri))
    }

    // 1. split events between edges of DIFFERENT rings (each ring is a
    // valid loop: same-ring edges interact only at shared vertices)
    for (i <- edges.indices; j <- i + 1 until edges.length) {
      val ea = edges(i); val eb = edges(j)
      if (ea.ring != eb.ring) {
        val e0 = S2Predicates.onGreatCircle(ea.v0, ea.v1, ea.x, eb.v0) &&
          S2Predicates.collinearBetween(ea.v0, ea.v1, eb.v0)
        val e1 = S2Predicates.onGreatCircle(ea.v0, ea.v1, ea.x, eb.v1) &&
          S2Predicates.collinearBetween(ea.v0, ea.v1, eb.v1)
        val f0 = S2Predicates.onGreatCircle(eb.v0, eb.v1, eb.x, ea.v0) &&
          S2Predicates.collinearBetween(eb.v0, eb.v1, ea.v0)
        val f1 = S2Predicates.onGreatCircle(eb.v0, eb.v1, eb.x, ea.v1) &&
          S2Predicates.collinearBetween(eb.v0, eb.v1, ea.v1)
        if (e0) ea.add(eb.v0)
        if (e1) ea.add(eb.v1)
        if (f0) eb.add(ea.v0)
        if (f1) eb.add(ea.v1)
        if (!e0 && !e1 && !f0 && !f1 &&
            S2EdgeCrossings.crossingSign(ea.v0, ea.v1, eb.v0, eb.v1) > 0) {
          val p = S2EdgeIntersections.getIntersection(ea.v0, ea.v1, eb.v0, eb.v1)
          ea.add(p); eb.add(p)
        }
      }
    }

    // 2. elementary subsegments bundled by undirected key
    def keyOf(u: V3, v: V3): (V3, V3) = if (u.lexLess(v)) (u, v) else (v, u)
    // bundle value: ((u,v) reference direction = key order, list of (ring, dirVsKey))
    val bundles = scala.collection.mutable.LinkedHashMap
      .empty[(V3, V3), scala.collection.mutable.ArrayBuffer[(Int, Int)]]
    for (e <- edges) {
      val pts: Array[V3] =
        if (e.events == null) Array(e.v0, e.v1)
        else (e.v0 +: e.events.distinct.sortBy(p => (p - e.v0).norm2).toArray) :+ e.v1
      var i = 0
      while (i < pts.length - 1) {
        val u = pts(i); val v = pts(i + 1)
        if (u != v) {
          val k = keyOf(u, v)
          val dir = if (u.lexLess(v)) 1 else -1
          bundles.getOrElseUpdate(k, scala.collection.mutable.ArrayBuffer.empty) +=
            ((e.ring, dir))
        }
        i += 1
      }
    }

    // 3. per-bundle side windings + selection
    val kept = new scala.collection.mutable.ArrayBuffer[(V3, V3)]()
    for (((u, v), entries) <- bundles) {
      val touching = entries.iterator.map(_._1).toSet
      val mid = (u + v).normalize
      var wBase = 0
      var r = 0
      while (r < ringArr.length) {
        if (!touching.contains(r)) wBase += ringWinding(ringArr(r), mid)
        r += 1
      }
      var wLeft = wBase; var wRight = wBase
      for ((ri, dir) <- entries) {
        // CCW ring: small interior left of its walk; CW: right of its walk
        (ccw(ri), dir) match {
          case (true, 1)   => wLeft += 1
          case (true, -1)  => wRight += 1
          case (false, 1)  => wRight -= 1
          case (false, -1) => wLeft -= 1
        }
      }
      val inL = rule.matches(wLeft); val inR = rule.matches(wRight)
      if (inL && !inR) kept += ((u, v))
      else if (inR && !inL) kept += ((v, u))
    }

    // 4. stitch (rule region on the left of every kept edge → balanced):
    // shared simple-loop decomposition (see [[LoopStitcher]])
    new S2Polygon(LoopStitcher.stitchNormalized(kept.toSeq, "winding operation"))
  }
}
