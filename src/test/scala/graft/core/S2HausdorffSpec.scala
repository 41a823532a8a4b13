package graft.core

import org.scalatest.funsuite.AnyFunSuite
import S2Hausdorff.Chain

/** Golden cases ported from the reference's own test suite
  * (/root/reference/src/s2/s2hausdorff_distance_query_test.cc:87-338). */
class S2HausdorffSpec extends AnyFunSuite {

  private def openChain(text: String): Chain =
    Chain(S2TextFormat.parsePoints(text), closed = false)
  private def loopChain(text: String): Chain =
    Chain(S2TextFormat.parsePoints(text), closed = true)
  private def degrees(d2: Double): Double =
    math.toDegrees(S1ChordAngle.toRadians(d2))

  test("SimplePolylineQueriesSucceed (test.cc:87-211)") {
    val a0 = S2TextFormat.parsePoints("0:0, 0:1, 0:1.5")
    val a1 = S2TextFormat.parsePoints("0:2, 0:1.5, -10:1")
    val b0 = S2TextFormat.parsePoints("1:0, 1:1, 3:2")
    val a = IndexedSeq(Chain(a0, closed = false), Chain(a1, closed = false))
    val b = IndexedSeq(Chain(b0, closed = false))
    val empty = IndexedSeq.empty[Chain]

    // empty operands: no result / infinite distance / distance-less false
    assert(S2Hausdorff.directedResult(empty, a).isEmpty)
    assert(S2Hausdorff.directedResult(a, empty).isEmpty)
    assert(S2Hausdorff.directedDistance2(a, empty).isPosInfinity)
    assert(!S2Hausdorff.isDirectedDistanceLess(empty, a, S1ChordAngle.Straight))
    assert(!S2Hausdorff.isDirectedDistanceLess(a, empty, S1ChordAngle.Straight))

    // directed a->b achieved at a1[2] vs b0[1]; b->a at b0[2] vs a1[0]
    val expAtoB = (a1(2) - b0(1)).norm2
    val expBtoA = (b0(2) - a1(0)).norm2
    val aToB = S2Hausdorff.directedResult(a, b).get
    val bToA = S2Hausdorff.directedResult(b, a).get
    assert(math.abs(degrees(aToB.dist2) - degrees(expAtoB)) < 1e-13)
    assert(aToB.targetPoint == a1(2))
    assert(math.abs(degrees(bToA.dist2) - degrees(expBtoA)) < 1e-13)
    assert(bToA.targetPoint == b0(2))

    // IsDirectedDistanceLess around the distance
    assert(S2Hausdorff.isDirectedDistanceLess(a, b,
      S1ChordAngle.fromRadians(S1ChordAngle.toRadians(aToB.dist2) + math.toRadians(1))))
    assert(!S2Hausdorff.isDirectedDistanceLess(a, b,
      S1ChordAngle.fromRadians(S1ChordAngle.toRadians(aToB.dist2) - math.toRadians(1))))

    // undirected = max of directed
    assert(S2Hausdorff.distance2(a, b) == math.max(aToB.dist2, bToA.dist2))
  }

  test("OverlappingPolygons (test.cc:279-338)") {
    val a = IndexedSeq(loopChain("1:1, 1:2, 3.5:1.5"))
    val b = IndexedSeq(loopChain("0:0, 0:3, 3:3, 3:0"))
    val c = IndexedSeq(loopChain("0:0, 0:2, 3:0"))
    val kEps = 3.0e-3

    // interiors excluded: max is at the inside vertex (1,2), ~1 degree
    // from the nearest quad edge
    val r1 = S2Hausdorff.directedResult(a, b, includeInteriors = false).get
    assert(math.abs(degrees(r1.dist2) - 1.0) < kEps)
    assert(r1.targetPoint == V3.fromLatLngDegrees(1, 2))
    assert(S2Hausdorff.isDirectedDistanceLess(c, b,
      S1ChordAngle.fromDegrees(1.0 + kEps), includeInteriors = false))

    // interiors included: inside vertices are distance 0; max is at the
    // outside vertex (3.5, 1.5), ~0.5 degrees
    val r2 = S2Hausdorff.directedResult(a, b, includeInteriors = true).get
    assert(math.abs(degrees(r2.dist2) - 0.5) < kEps)
    assert(r2.targetPoint == V3.fromLatLngDegrees(3.5, 1.5))
    // c fully inside b -> every vertex distance 0
    assert(S2Hausdorff.isDirectedDistanceLess(c, b,
      S1ChordAngle.fromDegrees(kEps), includeInteriors = true))
  }

  test("degenerate point chains behave like point targets (test.cc:212-278 spirit)") {
    val pts = IndexedSeq(Chain(Array(V3.fromLatLngDegrees(0, 0)), closed = false),
      Chain(Array(V3.fromLatLngDegrees(0, 2)), closed = false))
    val line = IndexedSeq(openChain("1:0, 1:2"))
    val r = S2Hausdorff.directedResult(pts, line).get
    assert(math.abs(degrees(r.dist2) - 1.0) < 3e-3)
  }
}
