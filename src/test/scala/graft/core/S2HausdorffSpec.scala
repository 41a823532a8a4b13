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

  // ---- S2LatLngRect::GetDirectedHausdorffDistance
  // (s2latlng_rect.cc:593-727; harness and fixtures from
  // s2latlng_rect_test.cc:904-1060) ----

  private def rectDeg(latLo: Double, lngLo: Double,
                      latHi: Double, lngHi: Double): S2LatLngRect =
    S2LatLngRect.fromDegrees(latLo, lngLo, latHi, lngHi)
  private def pointRectDeg(lat: Double, lng: Double): S2LatLngRect =
    rectDeg(lat, lng, lat, lng)

  /** Reference verification harness: sample rect `a` on a ~0.1 rad grid,
    * compare the max sampled point-to-rect distance against the returned
    * directed Hausdorff (must be >= max - 1e-10 and <= max + resolution). */
  private def verifyDirectedHausdorff(a: S2LatLngRect, b: S2LatLngRect): Unit = {
    val got = a.directedHausdorffDistance(b)
    val res = 0.1
    val nLat = (a.lat.length / res).toInt + 1
    val nLng = (a.lng.length / res).toInt + 1
    val dLat = a.lat.length / nLat
    val dLng = a.lng.length / nLng
    var maxDistance = 0.0
    for (i <- 0 to nLng; j <- 0 to nLat) {
      val lat = a.lat.lo + j * dLat
      val lng0 = a.lng.lo + i * dLng
      val lng = math.IEEEremainder(lng0, 2 * math.Pi)
      val d = b.distanceToLatLng(math.min(math.Pi / 2, math.max(-math.Pi / 2, lat)), lng)
      if (d > maxDistance) maxDistance = d
    }
    assert(maxDistance <= got + 1e-10, s"$a -> $b: sampled $maxDistance > hausdorff $got")
    assert(maxDistance >= got - res, s"$a -> $b: hausdorff $got not realized (sampled $maxDistance)")
  }

  test("rect directed Hausdorff: contained rects give zero (test.cc:968-979)") {
    val a = rectDeg(-10, 20, -5, 90)
    assert(a.directedHausdorffDistance(rectDeg(-10, 20, -5, 90)) == 0.0)
    assert(a.directedHausdorffDistance(rectDeg(-10, 19, -5, 91)) == 0.0)
    assert(a.directedHausdorffDistance(rectDeg(-11, 20, -4, 90)) == 0.0)
    assert(a.directedHausdorffDistance(rectDeg(-11, 19, -4, 91)) == 0.0)
  }

  test("rect directed Hausdorff: empty-rect conventions (cc:595-600)") {
    val a = rectDeg(1, -8, 10, 20)
    assert(S2LatLngRect.Empty.directedHausdorffDistance(a) == 0.0)
    assert(a.directedHausdorffDistance(S2LatLngRect.Empty) == math.Pi)
  }

  test("rect directed Hausdorff: point to rect equals point distance (test.cc:981-1004)") {
    for ((pLat, pLng) <- Seq((5.0, 8.0), (-6.0, -100.0), (-90.0, -20.0), (90.0, 0.0));
         b <- Seq(rectDeg(-12, -98, -11, -96), rectDeg(0, 0, 0, 0),
           rectDeg(-30, 20, 25, 80))) {
      val a = pointRectDeg(pLat, pLng)
      val direct = b.distanceToLatLng(math.toRadians(pLat), math.toRadians(pLng))
      val haus = a.directedHausdorffDistance(b)
      assert(math.abs(haus - direct) < 1e-13,
        s"point ($pLat,$pLng) vs $b: $haus != $direct")
    }
  }

  test("rect directed Hausdorff: rect to point fixtures (test.cc:1006-1014)") {
    val a = rectDeg(1, -8, 10, 20)
    verifyDirectedHausdorff(a, pointRectDeg(5, 8))
    verifyDirectedHausdorff(a, pointRectDeg(-6, -100))
    verifyDirectedHausdorff(a, pointRectDeg(-90, -20)) // south pole
    verifyDirectedHausdorff(a, pointRectDeg(90, 0)) // north pole
  }

  test("rect directed Hausdorff: rect-to-rect near poles (test.cc:1016-1025)") {
    val a = rectDeg(-87, 0, -85, 3)
    verifyDirectedHausdorff(a, rectDeg(-89, 1, -88, 2))
    verifyDirectedHausdorff(a, rectDeg(-84, 1, -83, 2))
    verifyDirectedHausdorff(a, rectDeg(-88, 90, -86, 91))
    verifyDirectedHausdorff(a, rectDeg(-84, -91, -83, -90))
    verifyDirectedHausdorff(a, rectDeg(-90, 181, -89, 182))
    verifyDirectedHausdorff(a, rectDeg(-84, 181, -83, 182))
  }

  test("rect directed Hausdorff: degenerate Voronoi cases (test.cc:1027-1060)") {
    verifyDirectedHausdorff(rectDeg(0, 10, 90, 20), rectDeg(-4, -10, 4, 0))
    verifyDirectedHausdorff(rectDeg(-4, -10, 4, 0), rectDeg(0, 10, 90, 20))
    val a = rectDeg(-50, -10, 50, 10)
    val b = rectDeg(30, -10, 60, 10)
    verifyDirectedHausdorff(a, b)
    verifyDirectedHausdorff(S2LatLngRect(a.lat, a.lng.complement), b)
    // a touches b's opposite longitude line
    verifyDirectedHausdorff(rectDeg(10, 170, 30, 180), rectDeg(-50, -10, 50, 10))
    verifyDirectedHausdorff(rectDeg(10, -180, 30, -170), rectDeg(-50, -10, 50, 10))
    // b's Voronoi diagram degenerate (lng spans 180 deg), a touches the
    // degenerate Voronoi vertex
    verifyDirectedHausdorff(rectDeg(-30, 170, 30, 180), rectDeg(-10, -90, 10, 90))
    verifyDirectedHausdorff(rectDeg(-30, -180, 30, -170), rectDeg(-10, -90, 10, 90))
  }

  test("rect directed Hausdorff: random pairs (test.cc:942-966)") {
    val rnd = new scala.util.Random(17)
    for (iter <- 0 until 100) {
      val la1 = math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))
      val la2 = math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))
      val lb1 = math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))
      val lb2 = math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))
      val ga1 = rnd.nextDouble() * 360 - 180; val ga2 = rnd.nextDouble() * 360 - 180
      val gb1 = rnd.nextDouble() * 360 - 180; val gb2 = rnd.nextDouble() * 360 - 180
      val a = S2LatLngRect(R1Interval.fromPointPair(math.toRadians(la1), math.toRadians(la2)),
        S1Interval.fromPointPair(math.toRadians(ga1), math.toRadians(ga2)))
      val b = S2LatLngRect(R1Interval.fromPointPair(math.toRadians(lb1), math.toRadians(lb2)),
        S1Interval.fromPointPair(math.toRadians(gb1), math.toRadians(gb2)))
      verifyDirectedHausdorff(a, b)
      // complement-lng variants, as in the reference
      verifyDirectedHausdorff(a, S2LatLngRect(b.lat, b.lng.complement))
      verifyDirectedHausdorff(S2LatLngRect(a.lat, a.lng.complement), b)
      // undirected symmetry
      assert(a.hausdorffDistance(b) == b.hausdorffDistance(a), s"iter $iter")
    }
  }
}
