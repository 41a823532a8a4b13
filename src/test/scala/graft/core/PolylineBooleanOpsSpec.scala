package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** PolylineModel boolean-operation cases (reference semantics:
  * s2boolean_operation.h:211-270 — polyline × polygon clipping with
  * open/semi-open/closed boundary models; geometric piece output). */
class PolylineBooleanOpsSpec extends AnyFunSuite {
  import PolylineBooleanOps._

  private val square = S2TextFormat.parsePolygon("0:0, 0:10, 10:10, 10:0")

  private def line(pts: (Double, Double)*): Array[V3] =
    pts.map { case (lat, lng) => V3.fromLatLngDegrees(lat, lng) }.toArray

  private def totalAngle(pieces: Seq[Array[V3]]): Double =
    pieces.map(p => p.sliding(2).map(w => w(0).angle(w(1))).sum).sum

  test("transversal crossing: inside piece + two outside pieces partition the line") {
    val l = line((5, -5), (5, 15))
    val inter = intersection(l, square)
    val diff = difference(l, square)
    assert(inter.size == 1)
    assert(diff.size == 2)
    // crossing points sit on the polygon's meridian edges (lng 0 and 10)
    val piece = inter.head
    assert(math.abs(V3.lngDegrees(piece.head) - 0) < 1e-9)
    assert(math.abs(V3.lngDegrees(piece.last) - 10) < 1e-9)
    // the pieces partition the original line exactly
    val whole = totalAngle(Seq(l))
    assert(math.abs(totalAngle(inter) + totalAngle(diff) - whole) < 1e-12)
    // midpoints classify correctly
    assert(square.contains((piece(0) + piece(1)).normalize))
    diff.foreach(p => assert(!square.contains((p(0) + p(1)).normalize)))
  }

  test("entirely inside / entirely outside") {
    val in = line((2, 2), (3, 7), (8, 8))
    assert(intersection(in, square).map(_.toSeq) == Seq(in.toSeq))
    assert(difference(in, square).isEmpty)
    val out = line((20, 20), (25, 25))
    assert(intersection(out, square).isEmpty)
    assert(difference(out, square).map(_.toSeq) == Seq(out.toSeq))
  }

  test("boundary-collinear run: OPEN drops it, CLOSED keeps it, SEMI_OPEN is directional") {
    // runs along the equator across A's bottom edge [0:0 -> 0:10]
    val l = line((0, -5), (0, 15))
    val closed = intersection(l, square, Closed)
    assert(closed.size == 1)
    // the kept piece is exactly the polygon's own edge (vertices injected)
    assert(closed.head.head == V3.fromLatLngDegrees(0, 0))
    assert(closed.head.last == V3.fromLatLngDegrees(0, 10))
    assert(intersection(l, square, Open).isEmpty)
    // bottom edge runs west->east with interior (north) on the left:
    // same-direction line is contained in SEMI_OPEN, reversed is not
    assert(intersection(l, square, SemiOpen).size == 1)
    val rev = line((0, 15), (0, -5))
    assert(intersection(rev, square, SemiOpen).isEmpty)
    assert(intersection(rev, square, Closed).size == 1)
    // difference complements per model
    assert(difference(l, square, Closed).size == 2)   // the two outside stubs
    assert(difference(l, square, Open).size == 1)     // whole line stays out
  }

  test("partial overlap entering the interior (mixed collinear + transversal)") {
    // along the equator to the boundary corner, then up through the interior
    val l = line((0, -5), (0, 5), (5, 5), (5, 15))
    val closed = intersection(l, square, Closed)
    // boundary run [0:0 -> 0:5] + interior run [0:5 -> 5:5 -> 5:10]
    assert(totalAngle(closed) > 0)
    val open = intersection(l, square, Open)
    // OPEN drops only the boundary-collinear run
    val gap = totalAngle(closed) - totalAngle(open)
    val expectedGap = V3.fromLatLngDegrees(0, 0).angle(V3.fromLatLngDegrees(0, 5))
    assert(math.abs(gap - expectedGap) < 1e-12)
    // vertical interior run is kept in both
    open.foreach(p => p.sliding(2).foreach(w =>
      assert(square.contains((w(0) + w(1)).normalize))))
  }

  test("polyline ending exactly on the boundary (T-junction endpoint)") {
    val l = line((5, -5), (5, 0)) // ends on the lng=0 edge... on the meridian edge
    // prime-meridian points are exactly on the square's left edge circle
    val inter = intersection(l, square, Closed)
    assert(inter.isEmpty) // no 2-point piece inside; degenerate endpoint discarded
    val diff = difference(l, square, Closed)
    assert(diff.size == 1)
    assert(math.abs(totalAngle(diff) - totalAngle(Seq(l))) < 1e-12)
  }

  test("hole-aware clipping: piece over the hole is cut out") {
    val donut = new S2Polygon(Array(
      S2Loop(line((0, 0), (0, 30), (30, 30), (30, 0))),
      S2Loop(line((10, 10), (10, 20), (20, 20), (20, 10)))))
    val l = line((15, -5), (15, 35))
    val inter = intersection(l, donut, Closed)
    assert(inter.size == 2) // left band + right band, hole crossing removed
    val diff = difference(l, donut, Closed)
    assert(diff.size == 3) // two outside stubs + the hole crossing
    val whole = totalAngle(Seq(l))
    assert(math.abs(totalAngle(inter) + totalAngle(diff) - whole) < 1e-12)
  }

  test("randomized: grid-walk polylines vs grid polygons (coincident runs + crossings)") {
    // polyline walks unit steps between INTEGER grid corners — segments
    // exactly coincide with cell edges (same endpoints → same geodesic) —
    // then two off-grid tail points add transversal crossings
    val rnd = new scala.util.Random(31)
    def sq(r: Int, c: Int) = S2TextFormat.parsePolygon(
      s"$r:$c, $r:${c + 1}, ${r + 1}:${c + 1}, ${r + 1}:$c")
    def totalAngle2(pieces: Seq[Array[V3]]): Double =
      pieces.map(p => p.sliding(2).map(w => w(0).angle(w(1))).sum).sum
    for (trial <- 0 until 15) {
      val cells = (0 until 25).filter(_ => rnd.nextDouble() < 0.5)
        .map(i => (i / 5, i % 5)).toSet
      if (cells.nonEmpty) {
        val poly = graft.operators.Builder.unionDisjoint(
          cells.toSeq.map { case (r, c) => sq(r, c) })
        // random unit-step walk on corners (no immediate backtracking)
        var (r, c) = (rnd.nextInt(6), rnd.nextInt(6))
        val verts = scala.collection.mutable.ArrayBuffer(
          V3.fromLatLngDegrees(r, c))
        var lastDir = -1
        for (_ <- 0 until 8) {
          val dirs = Seq((1, 0), (-1, 0), (0, 1), (0, -1)).zipWithIndex
            .filter { case ((dr, dc), i) =>
              i != (lastDir ^ 1) && r + dr >= 0 && r + dr <= 5 && c + dc >= 0 && c + dc <= 5 }
          val ((dr, dc), i) = dirs(rnd.nextInt(dirs.length))
          r += dr; c += dc; lastDir = i
          verts += V3.fromLatLngDegrees(r, c)
        }
        verts += V3.fromLatLngDegrees(rnd.nextDouble() * 7 - 1, rnd.nextDouble() * 7 - 1)
        verts += V3.fromLatLngDegrees(rnd.nextDouble() * 7 - 1, rnd.nextDouble() * 7 - 1)
        val line = verts.toArray
        val whole = totalAngle2(Seq(line))

        val interC = intersection(line, poly, Closed)
        val diffC = difference(line, poly, Closed)
        val interO = intersection(line, poly, Open)
        val diffO = difference(line, poly, Open)
        // partitions per model
        assert(math.abs(totalAngle2(interC) + totalAngle2(diffC) - whole) < 1e-11,
          s"trial $trial closed partition")
        assert(math.abs(totalAngle2(interO) + totalAngle2(diffO) - whole) < 1e-11,
          s"trial $trial open partition")
        // boundary runs belong to intersection only under CLOSED
        assert(totalAngle2(interO) <= totalAngle2(interC) + 1e-11)
        // strict membership: OPEN-intersection interiors, CLOSED-difference
        // exteriors (both strictly off the boundary by construction)
        interO.foreach(p => p.sliding(2).foreach(w =>
          assert(poly.contains((w(0) + w(1)).normalize), s"trial $trial interO")))
        diffC.foreach(p => p.sliding(2).foreach(w =>
          assert(!poly.contains((w(0) + w(1)).normalize), s"trial $trial diffC")))
      }
    }
  }

  test("polyline x polyline: shared subsegments, difference, union") {
    // A runs the equator 0..30; B shares [10, 20] exactly (same endpoints
    // on the same great circle), plus a disjoint branch
    val a = line((0, 0), (0, 10), (0, 20), (0, 30))
    val b = line((0, 10), (0, 20), (10, 25))
    val inter = polylineIntersection(a, b)
    assert(inter.size == 1)
    assert(inter.head.head == V3.fromLatLngDegrees(0, 10))
    assert(inter.head.last == V3.fromLatLngDegrees(0, 20))
    val diff = polylineDifference(a, b)
    assert(diff.size == 2) // [0,10] and [20,30]
    assert(math.abs(totalAngle(Seq(a)) -
      (totalAngle(inter) + totalAngle(diff))) < 1e-12)
    // partial overlap via sub-segment: B2 covers [0:5 .. 0:12] of A's
    // first edge — splits at B2's endpoints (both interior to A edges)
    // (0,12) is interior to A's second edge; all equator points share one
    // great circle, so both splits register exactly
    val b2 = line((0, 5), (0, 12))
    val i2 = polylineIntersection(a, b2)
    assert(math.abs(totalAngle(i2) - totalAngle(Seq(b2))) < 1e-12)
    // reversed direction still shares
    val i3 = polylineIntersection(a, line((0, 12), (0, 5)))
    assert(math.abs(totalAngle(i3) - totalAngle(Seq(b2))) < 1e-12)
    // union covers each shared run once
    val uni = polylineUnion(a, b)
    val want = totalAngle(Seq(a)) + totalAngle(Seq(b)) - totalAngle(inter)
    assert(math.abs(totalAngle(uni) - want) < 1e-12)
    // crossing-only contact: no 1-dimensional intersection
    val crossing = line((-5, 15), (5, 15))
    assert(polylineIntersection(a, crossing).isEmpty)
    assert(math.abs(totalAngle(polylineDifference(a, crossing)) -
      totalAngle(Seq(a))) < 1e-12)
  }

  test("empty polygon: intersection empty, difference = whole line") {
    val l = line((5, 5), (6, 6))
    assert(intersection(l, S2Polygon.empty).isEmpty)
    assert(difference(l, S2Polygon.empty).map(_.toSeq) == Seq(l.toSeq))
  }
}
