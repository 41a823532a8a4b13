package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Validation of the S2BooleanOperation core: pointwise set semantics
  * (the strongest possible oracle — result.contains(p) must equal the
  * boolean combination of the input containments for every sampled point),
  * area identities, and structural expectations on known configurations
  * (reference semantics: s2boolean_operation.h:211-232 Polygon model). */
class S2BooleanOpsSpec extends AnyFunSuite {

  private def poly(text: String): S2Polygon = S2TextFormat.parsePolygon(text)

  private val A = poly("0:0, 0:10, 10:10, 10:0")
  private val Bover = poly("5:5, 5:15, 15:15, 15:5")     // overlaps A
  private val Bdisj = poly("40:40, 40:50, 50:50, 50:40") // disjoint from A
  private val Bin = poly("2:2, 2:8, 8:8, 8:2")           // contained in A

  private def samplePoints(n: Int, seed: Int): Seq[V3] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      V3.fromLatLngDegrees(rnd.nextDouble() * 60 - 20, rnd.nextDouble() * 60 - 20)
    }
  }

  private def checkPointwise(a: S2Polygon, b: S2Polygon): Unit = {
    val inter = S2BooleanOps.intersection(a, b)
    val uni = S2BooleanOps.union(a, b)
    val diff = S2BooleanOps.difference(a, b)
    val symm = S2BooleanOps.symmetricDifference(a, b)
    for (p <- samplePoints(4000, 42)) {
      val ia = a.contains(p); val ib = b.contains(p)
      assert(inter.contains(p) == (ia && ib), s"inter at $p")
      assert(uni.contains(p) == (ia || ib), s"union at $p")
      assert(diff.contains(p) == (ia && !ib), s"diff at $p")
      assert(symm.contains(p) == (ia ^ ib), s"symm at $p")
    }
    // area identities (Gauss-Bonnet areas, loose FP tolerance)
    val eps = 1e-9
    assert(math.abs(inter.area + uni.area - (a.area + b.area)) < eps)
    assert(math.abs(diff.area - (a.area - inter.area)) < eps)
    assert(math.abs(symm.area - (a.area + b.area - 2 * inter.area)) < eps)
  }

  test("overlapping squares: pointwise semantics + area identities") {
    checkPointwise(A, Bover)
  }

  test("disjoint squares: union keeps both, intersection empty") {
    checkPointwise(A, Bdisj)
    assert(S2BooleanOps.intersection(A, Bdisj).isEmpty)
    assert(S2BooleanOps.union(A, Bdisj).numLoops == 2)
  }

  test("contained square: difference punches a hole") {
    checkPointwise(A, Bin)
    val diff = S2BooleanOps.difference(A, Bin)
    assert(diff.numLoops == 2) // shell + hole
    assert(math.abs(diff.area - (A.area - Bin.area)) < 1e-12)
    assert(math.abs(S2BooleanOps.intersection(A, Bin).area - Bin.area) < 1e-12)
    assert(math.abs(S2BooleanOps.union(A, Bin).area - A.area) < 1e-12)
  }

  test("empty operand identities") {
    val e = S2Polygon.empty
    assert(S2BooleanOps.union(A, e).area == A.area)
    assert(S2BooleanOps.union(e, A).area == A.area)
    assert(S2BooleanOps.intersection(A, e).isEmpty)
    assert(S2BooleanOps.difference(e, A).isEmpty)
    assert(math.abs(S2BooleanOps.difference(A, e).area - A.area) < 1e-15)
  }

  test("commutativity / self-consistency of union and intersection") {
    for (b <- Seq(Bover, Bdisj, Bin); p <- samplePoints(500, 7)) {
      assert(S2BooleanOps.union(A, b).contains(p) ==
        S2BooleanOps.union(b, A).contains(p))
      assert(S2BooleanOps.intersection(A, b).contains(p) ==
        S2BooleanOps.intersection(b, A).contains(p))
    }
  }

  test("multi-loop operand: polygon with hole intersected with overlapping square") {
    // A2 = big square with central hole. Parity model: every loop stored
    // normalized (small interior, CCW); nesting depth makes it a hole.
    val shell = S2TextFormat.parsePoints("0:0, 0:20, 20:20, 20:0")
    val hole = S2TextFormat.parsePoints("8:8, 8:12, 12:12, 12:8")
    val a2 = new S2Polygon(Array(S2Loop(shell), S2Loop(hole)))
    val b2 = poly("5:5, 5:25, 15:25, 15:5")
    val inter = S2BooleanOps.intersection(a2, b2)
    val uni = S2BooleanOps.union(a2, b2)
    val diff = S2BooleanOps.difference(a2, b2)
    for (p <- samplePoints(4000, 99)) {
      val ia = a2.contains(p); val ib = b2.contains(p)
      assert(inter.contains(p) == (ia && ib), s"inter at $p")
      assert(uni.contains(p) == (ia || ib), s"union at $p")
      assert(diff.contains(p) == (ia && !ib), s"diff at $p")
    }
  }

  test("vertex-touching operands: corner-sharing squares") {
    // A and T share exactly the vertex (10,10); union keeps both loops,
    // intersection is point-degenerate (empty in the Polygon model)
    val T = poly("10:10, 10:20, 20:20, 20:10")
    val uni = S2BooleanOps.union(A, T)
    assert(uni.numLoops == 2)
    val inter = S2BooleanOps.intersection(A, T)
    assert(inter.isEmpty)
    val diff = S2BooleanOps.difference(A, T)
    for (p <- samplePoints(2000, 17)) {
      val ia = A.contains(p); val it = T.contains(p)
      assert(uni.contains(p) == (ia || it), s"union at $p")
      assert(diff.contains(p) == (ia && !it), s"diff at $p")
    }
    assert(math.abs(uni.area - (A.area + T.area)) < 1e-12)
  }

  test("vertex-touching: square and triangle sharing one vertex, overlapping region") {
    // triangle shares vertex (0,0) with A and extends into A
    val T = poly("0:0, -5:5, 5:5")
    val uni = S2BooleanOps.union(A, T)
    val inter = S2BooleanOps.intersection(A, T)
    val diff = S2BooleanOps.difference(A, T)
    for (p <- samplePoints(3000, 19)) {
      val ia = A.contains(p); val it = T.contains(p)
      assert(uni.contains(p) == (ia || it), s"union at $p")
      assert(inter.contains(p) == (ia && it), s"inter at $p")
      assert(diff.contains(p) == (ia && !it), s"diff at $p")
    }
  }

  // ---- collinear / shared-subsegment degeneracies (native, no snap) ----
  // equator (lat=0) and prime-meridian (lng=0) points are EXACTLY
  // collinear in double arithmetic (z resp. y component is exactly 0),
  // so these exercise the exact on-circle event splitting.

  test("full shared edge: adjacent squares union to one rectangle") {
    val below = poly("-10:0, -10:10, 0:10, 0:0") // top edge == A's bottom edge
    checkPointwise(A, below)
    val uni = S2BooleanOps.union(A, below)
    assert(uni.numLoops == 1) // merged outline, shared edge dissolved
    assert(math.abs(uni.area - (A.area + below.area)) < 1e-12)
    assert(S2BooleanOps.intersection(A, below).isEmpty) // degenerate line discarded
    // difference leaves A untouched
    assert(math.abs(S2BooleanOps.difference(A, below).area - A.area) < 1e-12)
  }

  test("shared boundary digitized at different densities (sub-segment + T-junctions)") {
    // C's top edge [0:2 -> 0:8] is a strict sub-segment of A's bottom
    // edge [0:0 -> 0:10]: both its endpoints are T-junctions on A's edge
    val c = poly("-10:2, -10:8, 0:8, 0:2")
    checkPointwise(A, c)
    val uni = S2BooleanOps.union(A, c)
    assert(uni.numLoops == 1)
    assert(math.abs(uni.area - (A.area + c.area)) < 1e-12)
    // and a denser redigitization of A's own bottom edge: same square,
    // bottom edge split into 3 collinear pieces
    val aDense = poly("0:0, 0:3, 0:7, 0:10, 10:10, 10:0")
    checkPointwise(aDense, c)
    assert(math.abs(S2BooleanOps.union(aDense, c).area - (A.area + c.area)) < 1e-12)
  }

  test("partial edge overlap: each edge has one endpoint interior to the other") {
    // E's top edge [0:5 -> 0:15] overlaps A's bottom edge on [0:5, 0:10]
    val e = poly("-10:5, -10:15, 0:15, 0:5")
    checkPointwise(A, e)
    val uni = S2BooleanOps.union(A, e)
    assert(uni.numLoops == 1) // L-shape
    assert(math.abs(uni.area - (A.area + e.area)) < 1e-12)
    assert(S2BooleanOps.intersection(A, e).isEmpty)
  }

  test("identical polygons: union/intersection = self, difference/symdiff empty") {
    val a2 = poly("0:0, 0:10, 10:10, 10:0") // fresh instance, same values
    assert(math.abs(S2BooleanOps.union(A, a2).area - A.area) < 1e-12)
    assert(math.abs(S2BooleanOps.intersection(A, a2).area - A.area) < 1e-12)
    assert(S2BooleanOps.difference(A, a2).isEmpty)
    assert(S2BooleanOps.symmetricDifference(A, a2).isEmpty)
    for (p <- samplePoints(500, 7)) {
      assert(S2BooleanOps.union(A, a2).contains(p) == A.contains(p))
      assert(S2BooleanOps.intersection(A, a2).contains(p) == A.contains(p))
    }
  }

  test("interior square sharing two partial boundary edges and a corner") {
    // F sits in A's corner: edges [0:0 -> 0:4] (equator) and [4:0 -> 0:0]
    // (prime meridian) are sub-segments of A's boundary, same direction
    val f = poly("0:0, 0:4, 4:4, 4:0")
    checkPointwise(A, f)
    assert(math.abs(S2BooleanOps.intersection(A, f).area - f.area) < 1e-12)
    assert(math.abs(S2BooleanOps.union(A, f).area - A.area) < 1e-12)
    val diff = S2BooleanOps.difference(A, f)
    assert(math.abs(diff.area - (A.area - f.area)) < 1e-12)
    assert(diff.numLoops == 1) // corner bite: still one ring, no hole
  }

  test("collinear abutting edges end-to-end do not spuriously interact") {
    // G is beside A along the equator but only TOUCHES at the segment
    // [0:10 -> 0:20]: A's bottom edge and G's bottom edge are collinear
    // and abut at 0:10 without overlapping
    val g = poly("0:10, 0:20, 10:20, 10:10")
    checkPointwise(A, g)
    val uni = S2BooleanOps.union(A, g)
    assert(uni.numLoops == 1) // shares the vertical edge 0:10->10:10
    assert(math.abs(uni.area - (A.area + g.area)) < 1e-12)
  }

  test("randomized differential: 40 random convex polygon pairs, pointwise semantics") {
    val rnd = new scala.util.Random(123)
    def randomConvex(cLat: Double, cLng: Double, span: Double): S2Polygon = {
      val pts = Array.fill(8)(V3.fromLatLngDegrees(
        cLat + (rnd.nextDouble() - 0.5) * span,
        cLng + (rnd.nextDouble() - 0.5) * span))
      new S2Polygon(Array(S2ConvexHull.hull(pts.toSeq)))
    }
    var nonTrivial = 0
    for (trial <- 0 until 40) {
      val cLat = rnd.nextDouble() * 80 - 40
      val cLng = rnd.nextDouble() * 300 - 150
      val span = 3 + rnd.nextDouble() * 12
      val pa = randomConvex(cLat, cLng, span)
      // operand B's window overlaps A's in most trials
      val pb = randomConvex(cLat + (rnd.nextDouble() - 0.5) * span,
        cLng + (rnd.nextDouble() - 0.5) * span, span)
      val inter = S2BooleanOps.intersection(pa, pb)
      val uni = S2BooleanOps.union(pa, pb)
      val diff = S2BooleanOps.difference(pa, pb)
      if (!inter.isEmpty) nonTrivial += 1
      // sample around both operands
      val probes = (0 until 300).map { _ =>
        val src = if (rnd.nextBoolean()) pa else pb
        val bound = src.bound
        V3.fromLatLngDegrees(
          math.toDegrees(bound.latLo) - 2 + rnd.nextDouble() *
            (math.toDegrees(bound.latHi) - math.toDegrees(bound.latLo) + 4),
          math.toDegrees(bound.lngLo) - 2 + rnd.nextDouble() *
            (math.toDegrees(bound.lngHi) - math.toDegrees(bound.lngLo) + 4))
      }
      for (p <- probes) {
        val ia = pa.contains(p); val ib = pb.contains(p)
        assert(inter.contains(p) == (ia && ib), s"trial $trial inter at $p")
        assert(uni.contains(p) == (ia || ib), s"trial $trial union at $p")
        assert(diff.contains(p) == (ia && !ib), s"trial $trial diff at $p")
      }
      assert(math.abs(inter.area + uni.area - (pa.area + pb.area)) < 1e-9,
        s"trial $trial area identity")
    }
    assert(nonTrivial >= 5, s"want some overlapping trials, got $nonTrivial")
  }

  test("randomized differential: 30 collinear-overlap rectangle pairs on the equator") {
    // rectangles whose horizontal edges all lie EXACTLY on the equator:
    // integer-degree endpoints make coincident endpoints, strict
    // sub-segments, partial overlaps, and abutments all occur across
    // trials — every boundary interaction is degenerate by construction
    val rnd = new scala.util.Random(99)
    def rect(lngLo: Int, lngHi: Int, latLo: Int, latHi: Int): S2Polygon =
      poly(s"$latLo:$lngLo, $latLo:$lngHi, $latHi:$lngHi, $latHi:$lngLo")
    var overlapping = 0
    for (trial <- 0 until 30) {
      val l1 = rnd.nextInt(20); val w1 = 1 + rnd.nextInt(15)
      val l2 = rnd.nextInt(20); val w2 = 1 + rnd.nextInt(15)
      // one above, one below the equator (shared-edge case), or both
      // above with a shared meridian-ish vertical overlap region
      val below = trial % 3 != 2
      val pa = rect(l1, l1 + w1, 0, 5 + rnd.nextInt(10))
      val pb = if (below) rect(l2, l2 + w2, -(5 + rnd.nextInt(10)), 0)
               else rect(l2, l2 + w2, 0, 5 + rnd.nextInt(10))
      if (math.max(l1, l2) < math.min(l1 + w1, l2 + w2)) overlapping += 1
      val inter = S2BooleanOps.intersection(pa, pb)
      val uni = S2BooleanOps.union(pa, pb)
      val diff = S2BooleanOps.difference(pa, pb)
      val probes = (0 until 400).map { _ =>
        V3.fromLatLngDegrees(rnd.nextDouble() * 40 - 20, rnd.nextDouble() * 45 - 5)
      }
      for (p <- probes) {
        val ia = pa.contains(p); val ib = pb.contains(p)
        assert(inter.contains(p) == (ia && ib), s"trial $trial inter at $p")
        assert(uni.contains(p) == (ia || ib), s"trial $trial union at $p")
        assert(diff.contains(p) == (ia && !ib), s"trial $trial diff at $p")
      }
      assert(math.abs(inter.area + uni.area - (pa.area + pb.area)) < 1e-9,
        s"trial $trial area identity")
    }
    assert(overlapping >= 10, s"want overlapping lng ranges, got $overlapping")
  }

  test("randomized differential: rectilinear grid polygons (max degeneracy, multi-loop)") {
    // operands are unions of random cells from a 6x6 integer-degree grid,
    // assembled into (possibly multi-loop, hole-bearing) polygons — EVERY
    // A/B boundary interaction is a shared vertex, shared edge, or
    // T-junction; nothing is in generic position
    val rnd = new scala.util.Random(41)
    def cellPoly(r: Int, c: Int): S2Polygon =
      poly(s"$r:$c, $r:${c + 1}, ${r + 1}:${c + 1}, ${r + 1}:$c")
    def gridPoly(cells: Set[(Int, Int)]): S2Polygon =
      graft.operators.Builder.unionDisjoint(
        cells.toSeq.map { case (r, c) => cellPoly(r, c) })
    for (trial <- 0 until 40) {
      // densities swept 0.25-0.65: sparse sets exercise pinch corners and
      // isolated cells, dense sets exercise holes and pinched faces
      val density = 0.25 + (trial % 5) * 0.1
      val cellsA = (0 until 36).filter(_ => rnd.nextDouble() < density)
        .map(i => (i / 6, i % 6)).toSet
      val cellsB = (0 until 36).filter(_ => rnd.nextDouble() < density)
        .map(i => (i / 6, i % 6)).toSet
      if (cellsA.nonEmpty && cellsB.nonEmpty) {
        val pa = gridPoly(cellsA)
        val pb = gridPoly(cellsB)
        val inter = S2BooleanOps.intersection(pa, pb)
        val uni = S2BooleanOps.union(pa, pb)
        val diff = S2BooleanOps.difference(pa, pb)
        val symm = S2BooleanOps.symmetricDifference(pa, pb)
        // probe strictly inside cells (and outside the grid): membership
        // is known exactly from the cell sets, no boundary ambiguity
        for (r <- -1 to 6; c <- -1 to 6; _ <- 0 until 2) {
          val p = V3.fromLatLngDegrees(
            r + 0.15 + rnd.nextDouble() * 0.7, c + 0.15 + rnd.nextDouble() * 0.7)
          val ia = cellsA.contains((r, c)); val ib = cellsB.contains((r, c))
          assert(inter.contains(p) == (ia && ib), s"trial $trial inter at ($r,$c)")
          assert(uni.contains(p) == (ia || ib), s"trial $trial union at ($r,$c)")
          assert(diff.contains(p) == (ia && !ib), s"trial $trial diff at ($r,$c)")
          assert(symm.contains(p) == (ia ^ ib), s"trial $trial symm at ($r,$c)")
        }
        // area identities across maximally-degenerate inputs
        assert(math.abs(inter.area + uni.area - (pa.area + pb.area)) < 1e-9,
          s"trial $trial area identity")
        assert(math.abs(symm.area - (uni.area - inter.area)) < 1e-9,
          s"trial $trial symm area")
      }
    }
  }

  test("getIntersection: equator x meridian crossing is (1,0,0) to within kIntersectionError") {
    val p = S2EdgeIntersections.getIntersection(
      V3.fromLatLngDegrees(0, -10), V3.fromLatLngDegrees(0, 10),
      V3.fromLatLngDegrees(-10, 0), V3.fromLatLngDegrees(10, 0))
    assert(p.angle(V3(1, 0, 0)) <= S2EdgeIntersections.IntersectionErrorRadians)
    assert(math.abs(p.norm - 1.0) < 1e-14)
  }

  test("getIntersection is edge-order invariant and on both edges") {
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 200) {
      val lat = rnd.nextDouble() * 120 - 60
      val lng = rnd.nextDouble() * 300 - 150
      val a0 = V3.fromLatLngDegrees(lat - 5, lng)
      val a1 = V3.fromLatLngDegrees(lat + 5, lng + 0.3)
      val b0 = V3.fromLatLngDegrees(lat, lng - 5)
      val b1 = V3.fromLatLngDegrees(lat + 0.3, lng + 5)
      if (S2EdgeCrossings.crossingSign(a0, a1, b0, b1) > 0) {
        val p1 = S2EdgeIntersections.getIntersection(a0, a1, b0, b1)
        val p2 = S2EdgeIntersections.getIntersection(b0, b1, a0, a1)
        val p3 = S2EdgeIntersections.getIntersection(a1, a0, b1, b0)
        assert(p1 == p2 && p1 == p3, "swap/reverse invariance")
        // within kIntersectionError of both edges
        val err = S1ChordAngle.fromRadians(
          S2EdgeIntersections.IntersectionErrorRadians * 1.001)
        assert(S2EdgeDistances.distance2(p1, a0, a1) <= err)
        assert(S2EdgeDistances.distance2(p1, b0, b1) <= err)
      }
    }
  }

  // ---- GetOverlapFractions (s2polygon.cc:600; test fixtures from
  // s2polygon_test.cc OverlapFractions) ----

  test("overlapFractions: reference OverlapFractions cases") {
    val empty = poly("")
    val overlap3 = poly("-10:10, 0:10, 0:-10, -10:-10, -10:0")
    val overlap4 = poly("-10:0, 10:0, 10:-10, -10:-10")

    val r1 = S2BooleanOps.overlapFractions(empty, empty)
    assert(r1 == ((1.0, 1.0)), s"empty/empty -> $r1")

    val r2 = S2BooleanOps.overlapFractions(empty, overlap3)
    assert(r2._1 == 1.0 && r2._2 == 0.0, s"empty/overlap3 -> $r2")

    val r3 = S2BooleanOps.overlapFractions(overlap4, overlap3)
    assert(math.abs(r3._1 - 0.5) < 1e-14, s"overlap4 frac ${r3._1}")
    assert(math.abs(r3._2 - 0.5) < 1e-14, s"overlap3 frac ${r3._2}")
  }

  test("overlapFractions: contained and disjoint branches") {
    val (fa, fb) = S2BooleanOps.overlapFractions(A, Bin)
    assert(fb == 1.0, s"contained operand must clamp to exactly 1, got $fb")
    assert(math.abs(fa - Bin.area / A.area) < 1e-12)
    val (da, db) = S2BooleanOps.overlapFractions(A, Bdisj)
    assert(da == 0.0 && db == 0.0)
  }

  // ---- ApproxContains / ApproxDisjoint / ApproxEquals
  // (s2polygon.cc:676-700; random harness from s2polygon_test.cc
  // TestApproxContainsAndDisjoint) ----

  test("approxContains/approxDisjoint: exact containment implies both") {
    import graft.operators.PolygonApprox
    assert(PolygonApprox.approxContains(A, Bin, 1e-15))
    assert(!PolygonApprox.approxDisjoint(A, Bin, 1e-15))
    assert(PolygonApprox.approxDisjoint(A, Bdisj, 1e-15))
    assert(!PolygonApprox.approxContains(A, Bover, 1e-6))
  }

  test("approxContains/approxDisjoint: cell-intersection residues collapse at the merge radius") {
    import graft.operators.PolygonApprox
    // reference harness: intersect a level-10 cell's polygon A with its
    // child-0 polygon B; the constructed intersection may stick out of A
    // (or into adjacent child 1) by up to kIntersectionError, so the exact
    // relations can fail while the approx ones must hold at
    // kIntersectionMergeRadius.
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 200) {
      val p = V3(rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1,
        rnd.nextDouble() * 2 - 1)
      if (p.norm2 > 1e-4) {
        val u = p.normalize
        val id = S2CellId.parent(S2CellId.fromPoint(u.x, u.y, u.z), 10)
        def cellPoly(cid: Long): S2Polygon = {
          val c = S2Cell(cid)
          new S2Polygon(Array(S2Loop(Array(
            c.vertex(0), c.vertex(1), c.vertex(2), c.vertex(3)))))
        }
        val parent = cellPoly(id)
        val child0 = cellPoly(S2CellId.child(id, 0))
        val child1 = cellPoly(S2CellId.child(id, 1))
        val inter = S2BooleanOps.intersection(parent, child0)
        assert(PolygonApprox.approxContains(parent, inter,
          PolygonApprox.intersectionMergeRadius), s"trial $trial contains")
        assert(PolygonApprox.approxDisjoint(child1, inter,
          PolygonApprox.intersectionMergeRadius), s"trial $trial disjoint")
      }
    }
  }

  test("approxEquals: tolerates sub-tolerance vertex perturbation, rejects real differences") {
    import graft.operators.PolygonApprox
    val tol = 1e-10
    val jitter = 1e-12 // radians, well under tol
    val perturbed = new S2Polygon(A.loops.map { l =>
      S2Loop(l.vertices.map { v =>
        // rotate each vertex slightly within the tangent plane
        val t = v.cross(V3(0, 0, 1))
        val axis = if (t.norm2 < 1e-12) v.cross(V3(0, 1, 0)).normalize else t.normalize
        (v + axis * jitter).normalize
      })
    })
    assert(PolygonApprox.approxEquals(A, perturbed, tol))
    assert(!PolygonApprox.approxEquals(A, Bover, tol))
    assert(!PolygonApprox.approxEquals(A, Bin, tol))
  }
}
