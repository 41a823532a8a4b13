package graft.core

import scala.collection.mutable.ArrayBuffer

/** Buffer (Minkowski-sum-with-disc) operation producing polygon geometry —
  * S2BufferOperation semantics (/root/reference/src/s2/s2buffer_operation.h:39-58):
  * the result boundary approximates the set of points within `radius` of
  * the input, to within an error tolerance that controls arc tessellation
  * (the reference is likewise a tolerance-based approximation).
  *
  * Construction: each edge offsets to its parallel small circle at
  * distance r on the outward side (sampled geodesic chords); convex
  * vertices get round joins (arc around the vertex); concave vertices get
  * the EXACT corner point of the two offset circles' intersection, with
  * the adjacent edge arcs trimmed to it. Valid for 0 < r < π/2 and inputs
  * whose local feature size exceeds r (offsets must not self-intersect
  * globally — the reference resolves global overlaps through its builder
  * machinery; here they are the caller's contract).
  */
object S2Buffer {

  /** Arc sampling step (radians of turn) for a given chord-sagitta error
    * bound on a circle of angular radius r. */
  private def stepFor(radius: Double, maxError: Double): Double = {
    val sinR = math.max(1e-9, math.sin(radius))
    // sagitta of a chord subtending step a on a small circle of radius r:
    // ~ sinR * (1 - cos(a/2)); solve for a
    val a = 2 * math.acos(math.max(0.0, 1.0 - maxError / sinR))
    math.min(math.Pi / 4, math.max(0.01, a))
  }

  /** Buffer a point: spherical cap as a sampled CCW circle. */
  def bufferPoint(p: V3, radius: Double, maxError: Double = 1e-6): S2Polygon = {
    val d1 = pickOrthonormal(p)
    val d2 = p.cross(d1)
    val step = stepFor(radius, maxError)
    val n = math.max(8, math.ceil(2 * math.Pi / step).toInt)
    val verts = Array.tabulate(n) { i =>
      val phi = 2 * math.Pi * i / n
      (p * math.cos(radius)) + ((d1 * math.cos(phi) + d2 * math.sin(phi)) * math.sin(radius))
    }
    new S2Polygon(Array(S2Loop(verts)))
  }

  private def pickOrthonormal(p: V3): V3 = {
    val ref = if (math.abs(p.x) < 0.9) V3(1, 0, 0) else V3(0, 1, 0)
    p.cross(ref).normalize
  }

  /** Sample the arc around `center` from direction d1 to d2 (both unit,
    * orthogonal to center), turning CCW (positive rotation about center),
    * excluding both endpoints. */
  private def sampleJoinArc(center: V3, d1: V3, d2: V3, radius: Double,
                            step: Double, out: ArrayBuffer[V3]): Unit = {
    val e2 = center.cross(d1)
    var theta = math.atan2(d1.cross(d2).dot(center), d1.dot(d2))
    if (theta < 0) theta += 2 * math.Pi
    // a CCW sweep beyond pi means this is the INNER side of a turn (only
    // reachable from polyline inner joins): connect directly instead of
    // looping the long way around the vertex
    if (theta > math.Pi + 1e-9) return
    val k = math.ceil(theta / step).toInt
    val cosR = math.cos(radius); val sinR = math.sin(radius)
    var i = 1
    while (i < k) {
      val phi = theta * i / k
      out += (center * cosR) + ((d1 * math.cos(phi) + e2 * math.sin(phi)) * sinR)
      i += 1
    }
  }

  /** Offset arc of a geodesic from point pa to point pb (both on the edge's
    * great circle) displaced by radius away from normal n, endpoints
    * INCLUDED. */
  private def sampleEdgeOffset(pa: V3, pb: V3, n: V3, radius: Double,
                               step: Double, out: ArrayBuffer[V3]): Unit = {
    val cosR = math.cos(radius); val sinR = math.sin(radius)
    val angle = pa.angle(pb)
    val k = math.max(1, math.ceil(angle / step).toInt)
    var i = 0
    while (i <= k) {
      val p = S2EdgeDistances.interpolate(pa, pb, i.toDouble / k)
      out += (p * cosR) - (n * sinR)
      i += 1
    }
  }

  /** Buffer one loop (vertices CCW, interior left). Returns the offset
    * boundary as a CCW loop. */
  def bufferLoopBoundary(vertices: Array[V3], radius: Double,
                         maxError: Double = 1e-6): Array[V3] = {
    require(radius > 0 && radius < math.Pi / 2, "radius in (0, pi/2)")
    val n = vertices.length
    val step = stepFor(radius, maxError)
    val normals = Array.tabulate(n) { i =>
      S2EdgeCrossings.robustCrossProd(vertices(i), vertices((i + 1) % n)).normalize
    }
    val sinR = math.sin(radius)
    // per-edge trimmed endpoints on the edge's great circle (start, end)
    val starts = new Array[V3](n)
    val ends = new Array[V3](n)
    // per-vertex join: Some(miter corner) for concave, None (round) for convex
    val miter = new Array[V3](n)
    for (i <- 0 until n) {
      val prev = (i + n - 1) % n
      val a = vertices(prev); val b = vertices(i); val c = vertices((i + 1) % n)
      val convex = S2Predicates.sign(a, b, c) > 0
      if (convex) {
        ends(prev) = b; starts(i) = b
      } else {
        // exact corner: intersection of the two offset circles
        // q·n1 = q·n2 = -sin r; q = alpha (n1 + n2) + gamma (n1 x n2)
        val n1 = normals(prev); val n2 = normals(i)
        val cth = n1.dot(n2)
        val alpha = -sinR / (1 + cth)
        val base = (n1 + n2) * alpha
        val cross = n1.cross(n2)
        val g2 = (1 - base.norm2) / math.max(1e-30, cross.norm2)
        val gamma = math.sqrt(math.max(0.0, g2))
        val q1 = base + cross * gamma
        val q = if (q1.dot(b) >= (base - cross * gamma).dot(b)) q1
                else base - cross * gamma
        miter(i) = q
        // trim adjacent edges to q's projection on their great circles
        ends(prev) = (q - n1 * q.dot(n1)).normalize
        starts(i) = (q - n2 * q.dot(n2)).normalize
      }
    }
    val out = ArrayBuffer.empty[V3]
    for (i <- 0 until n) {
      val next = (i + 1) % n
      sampleEdgeOffset(starts(i), ends(i), normals(i), radius, step, out)
      if (miter(next) != null) out += miter(next)
      else sampleJoinArc(vertices(next), -normals(i), -normals(next), radius, step, out)
    }
    // drop consecutive duplicates (trimmed arcs can repeat endpoints)
    val dedup = ArrayBuffer.empty[V3]
    for (v <- out) if (dedup.isEmpty || (dedup.last - v).norm2 > 1e-28) dedup += v
    if (dedup.length > 1 && (dedup.head - dedup.last).norm2 <= 1e-28)
      dedup.remove(dedup.length - 1)
    dedup.toArray
  }

  /** Buffer a polygon (expand by radius): each shell's boundary offsets
    * outward; holes shrink (their boundary offsets INTO the hole) and
    * drop when swallowed. Parity-model polygon in, parity-model out. */
  def bufferPolygon(poly: S2Polygon, radius: Double,
                    maxError: Double = 1e-6): S2Polygon = {
    val loops = ArrayBuffer.empty[S2Loop]
    for ((l, i) <- poly.loops.zipWithIndex) {
      if (poly.loopSigns(i) > 0) {
        loops += S2Loop(bufferLoopBoundary(l.vertices, radius, maxError))
      } else {
        // hole: offset its boundary toward the hole interior = buffer the
        // REVERSED ring and keep it only if it survives (small holes are
        // swallowed when the offset ring inverts)
        val shrunk = bufferLoopBoundary(l.vertices.reverse, radius, maxError)
        // a hole survives only while its offset ring stays strictly inside
        // the original hole at distance >= r from its boundary; offsets
        // past the medial axis (r >= local half-width) mean the hole was
        // swallowed — drop it
        val holeLoop = l
        val minD2 = S1ChordAngle.fromRadians(math.max(0.0, radius - 8 * maxError))
        val survives = shrunk.length >= 3 && shrunk.forall { v =>
          holeLoop.bruteForceContains(v) &&
            S2EdgeDistances.distanceToChain2(v, l.vertices, closed = true) >= minD2
        }
        if (survives) loops += S2Loop(shrunk.reverse)
      }
    }
    new S2Polygon(loops.toArray)
  }

  /** Buffer a polyline: stadium polygon (offset both sides + round end
    * caps). */
  def bufferPolyline(vertices: Array[V3], radius: Double,
                     maxError: Double = 1e-6): S2Polygon = {
    require(vertices.length >= 2, "polyline needs >= 2 vertices")
    val step = stepFor(radius, maxError)
    val m = vertices.length
    val fwd = Array.tabulate(m - 1) { i =>
      S2EdgeCrossings.robustCrossProd(vertices(i), vertices(i + 1)).normalize
    }
    val out = ArrayBuffer.empty[V3]
    // right side going forward (offset by -n), round joins at interior
    // vertices on the outer side, miter-free simple joins otherwise
    def side(vs: Array[V3], ns: Array[V3]): Unit = {
      for (i <- ns.indices) {
        sampleEdgeOffset(vs(i), vs(i + 1), ns(i), radius, step, out)
        if (i + 1 < ns.length)
          sampleJoinArc(vs(i + 1), -ns(i), -ns(i + 1), radius, step, out)
      }
    }
    side(vertices, fwd)
    // end cap at last vertex: half circle from -n_last to +n_last
    sampleJoinArc(vertices(m - 1), -fwd(m - 2), fwd(m - 2), radius, step, out)
    // left side going backward: reversed chain, normals are +fwd reversed
    val rev = vertices.reverse
    val revN = Array.tabulate(m - 1)(i =>
      S2EdgeCrossings.robustCrossProd(rev(i), rev(i + 1)).normalize)
    side(rev, revN)
    // end cap at first vertex
    sampleJoinArc(vertices(0), -revN(m - 2), revN(m - 2), radius, step, out)
    val dedup = ArrayBuffer.empty[V3]
    for (v <- out) if (dedup.isEmpty || (dedup.last - v).norm2 > 1e-28) dedup += v
    if (dedup.length > 1 && (dedup.head - dedup.last).norm2 <= 1e-28)
      dedup.remove(dedup.length - 1)
    new S2Polygon(Array(S2Loop(dedup.toArray)))
  }
}
