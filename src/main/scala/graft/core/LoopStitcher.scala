package graft.core

import scala.collection.mutable

/** Shared loop assembly: decompose a BALANCED directed multigraph of
  * boundary edges (region interior on the left) into SIMPLE closed loops.
  *
  * Two mechanisms cooperate (used by [[S2BooleanOps]], [[S2Winding]] and
  * the builder's polygon layer):
  *
  *  - at a multi-out (pinch) vertex, the walk continues with the MINIMUM
  *    CLOCKWISE turn from the incoming direction — face traversal with
  *    the interior on the left, which keeps vertex-touching loops apart
  *    in the common cases;
  *  - whenever the walk revisits a vertex already on the CURRENT path,
  *    the enclosed sub-cycle is extracted as its own loop and the path
  *    rolls back to the first visit. A pinched FACE (e.g. two holes
  *    meeting at a corner inside one connected region) legitimately
  *    traverses a vertex twice — no local turn rule can know that in
  *    advance — and a self-touching figure-eight loop would break the
  *    S2Loop parity machinery, so simpleness is enforced structurally.
  *    The extracted decomposition covers the same edge set, loops touch
  *    at most at vertices, and region parity is unchanged.
  *
  * Deterministic: walks start at the lexicographically smallest vertex
  * with remaining out-edges. Throws IllegalArgumentException (with
  * `context` in the message) when the graph is not balanced — the input
  * was not a closed boundary.
  */
private[graft] object LoopStitcher {

  def stitch(edgeSeq: Seq[(V3, V3)], context: String): Seq[Array[V3]] = {
    val vOrd: Ordering[V3] =
      (a: V3, b: V3) => if (a == b) 0 else if (a.lexLess(b)) -1 else 1
    val outs = mutable.HashMap.empty[V3, mutable.ArrayBuffer[V3]]
    edgeSeq.foreach { case (u, v) =>
      outs.getOrElseUpdate(u, new mutable.ArrayBuffer[V3](2)) += v
    }
    val inDeg = mutable.HashMap.empty[V3, Int]
    edgeSeq.foreach { case (_, v) => inDeg(v) = inDeg.getOrElse(v, 0) + 1 }
    for ((u, lst) <- outs)
      require(inDeg.getOrElse(u, 0) == lst.length,
        s"$context: open boundary chain at $u " +
          s"(in=${inDeg.getOrElse(u, 0)}, out=${lst.length}) — " +
          "input is not a closed boundary")
    for ((v, k) <- inDeg)
      require(outs.get(v).exists(_.length == k),
        s"$context: open boundary chain at $v — input is not a closed boundary")

    def pickOut(cur: V3, prev: V3, lst: mutable.ArrayBuffer[V3]): Int = {
      if (lst.length == 1 || prev == null) 0
      else {
        val e1 = S2EdgeCrossings.ortho(cur)
        val e2 = cur.cross(e1).normalize
        def theta(w: V3): Double = {
          val t = w - cur * cur.dot(w) // tangent-plane direction of cur->w
          math.atan2(t.dot(e2), t.dot(e1))
        }
        val back = theta(prev)
        var best = 0
        var bestCw = Double.MaxValue
        var j = 0
        while (j < lst.length) {
          var cw = back - theta(lst(j))
          while (cw <= 1e-15) cw += 2 * math.Pi
          if (cw < bestCw) { bestCw = cw; best = j }
          j += 1
        }
        best
      }
    }

    val loops = mutable.ArrayBuffer.empty[Array[V3]]
    var remaining = edgeSeq.size
    while (remaining > 0) {
      val start = outs.keysIterator.min(vOrd)
      val verts = mutable.ArrayBuffer.empty[V3]
      val posOf = mutable.HashMap.empty[V3, Int]
      var cur = start
      var prev: V3 = null
      var guard = 0
      var done = false
      while (!done) {
        posOf.get(cur) match {
          case Some(idx) =>
            // on-path revisit: extract the enclosed simple sub-cycle
            val sub = verts.slice(idx, verts.length).toArray
            if (sub.length >= 3) loops += sub
            var k = idx
            while (k < verts.length) { posOf.remove(verts(k)); k += 1 }
            verts.remove(idx, verts.length - idx)
          case None => ()
        }
        posOf(cur) = verts.length
        verts += cur
        val lst = outs(cur)
        val nxt = lst.remove(pickOut(cur, prev, lst))
        if (lst.isEmpty) outs.remove(cur)
        remaining -= 1
        prev = cur
        cur = nxt
        guard += 1
        require(guard <= edgeSeq.size + 1, s"$context: stitching did not close")
        if (cur == start) {
          done = true
          if (verts.length >= 3) loops += verts.toArray
        }
      }
    }
    loops.toSeq
  }

  /** Stitch + normalize every loop to its small interior (parity model):
    * loops walked with the region on the left come out CCW for shells and
    * CW (area > 2π as written) for holes — reverse the latter. */
  def stitchNormalized(edgeSeq: Seq[(V3, V3)], context: String): Array[S2Loop] =
    stitch(edgeSeq, context).map { vs =>
      val l = S2Loop(vs)
      if (l.area > 2 * math.Pi) S2Loop(vs.reverse) else l
    }.toArray
}
