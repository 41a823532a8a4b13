package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Buffer operation: containment semantics (everything within r is inside
  * the buffer, everything beyond r + tolerance is outside) and area
  * sanity vs closed forms. */
class S2BufferSpec extends AnyFunSuite {
  private val MaxErr = 1e-4

  test("point buffer is a sampled cap: area and containment") {
    val p = V3.fromLatLngDegrees(10, 20)
    val r = 0.1
    val buf = S2Buffer.bufferPoint(p, r, MaxErr)
    val capArea = 2 * math.Pi * (1 - math.cos(r))
    assert(math.abs(buf.area - capArea) / capArea < 0.01)
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 500) {
      val q = V3.fromLatLngDegrees(10 + rnd.nextDouble() * 20 - 10,
        20 + rnd.nextDouble() * 20 - 10)
      val d = p.angle(q)
      if (d < r - MaxErr) assert(buf.contains(q), s"inside point $q missing")
      if (d > r + MaxErr) assert(!buf.contains(q), s"outside point $q included")
    }
  }

  test("convex polygon buffer: contains original, respects distance bound") {
    val poly = S2TextFormat.parsePolygon("0:0, 0:10, 10:10, 10:0")
    val r = 0.03
    val buf = S2Buffer.bufferPolygon(poly, r, MaxErr)
    assert(buf.numLoops == 1)
    val chains = IndexedSeq(S2Hausdorff.Chain(poly.loops(0).vertices, closed = true))
    val rnd = new scala.util.Random(6)
    for (_ <- 0 until 1000) {
      val q = V3.fromLatLngDegrees(rnd.nextDouble() * 24 - 7, rnd.nextDouble() * 24 - 7)
      val dIn = poly.contains(q)
      val d2 = if (dIn) 0.0
        else S2EdgeDistances.distanceToChain2(q, poly.loops(0).vertices, closed = true)
      val d = S1ChordAngle.toRadians(d2)
      if (d < r - 2 * MaxErr) assert(buf.contains(q), s"should be buffered: $q d=$d")
      if (d > r + 2 * MaxErr) assert(!buf.contains(q), s"beyond radius: $q d=$d")
    }
    // area grows by ~ perimeter*r + pi r^2 (spherical corrections < 1%)
    val perim = 4 * math.toRadians(10)
    val expected = poly.area + perim * r + math.Pi * r * r
    assert(math.abs(buf.area - expected) / expected < 0.02)
  }

  test("concave polygon buffer: exact miter corner keeps distance semantics") {
    // L-shaped polygon (one concave vertex at 5:5)
    val poly = S2TextFormat.parsePolygon("0:0, 0:10, 5:10, 5:5, 10:5, 10:0")
    val r = 0.02
    val buf = S2Buffer.bufferPolygon(poly, r, MaxErr)
    val verts = poly.loops(0).vertices
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 1000) {
      val q = V3.fromLatLngDegrees(rnd.nextDouble() * 16 - 3, rnd.nextDouble() * 16 - 3)
      val d2 = if (poly.contains(q)) 0.0
        else S2EdgeDistances.distanceToChain2(q, verts, closed = true)
      val d = S1ChordAngle.toRadians(d2)
      if (d < r - 2 * MaxErr) assert(buf.contains(q), s"should be buffered: $q d=$d")
      if (d > r + 2 * MaxErr) assert(!buf.contains(q), s"beyond radius: $q d=$d")
    }
  }

  test("polygon with hole: hole shrinks, swallowed when smaller than radius") {
    val shell = S2TextFormat.parsePoints("0:0, 0:20, 20:20, 20:0")
    val hole = S2TextFormat.parsePoints("8:8, 8:12, 12:12, 12:8")
    val poly = new S2Polygon(Array(S2Loop(shell), S2Loop(hole)))
    val buf = S2Buffer.bufferPolygon(poly, 0.01, MaxErr)
    assert(buf.numLoops == 2) // hole survives (2 deg across >> 0.01 rad)
    val center = V3.fromLatLngDegrees(10, 10)
    assert(!buf.contains(center)) // deep inside the shrunk hole
    assert(buf.area > poly.area)
    // huge radius swallows the hole entirely
    val buf2 = S2Buffer.bufferPolygon(poly, 0.05, MaxErr)
    assert(buf2.numLoops == 1)
    assert(buf2.contains(center))
  }

  test("polyline buffer is a stadium: containment near and far") {
    val line = S2TextFormat.parsePoints("0:0, 0:5, 2:8")
    val r = 0.02
    val buf = S2Buffer.bufferPolyline(line, r, MaxErr)
    val rnd = new scala.util.Random(8)
    for (_ <- 0 until 800) {
      val q = V3.fromLatLngDegrees(rnd.nextDouble() * 10 - 4, rnd.nextDouble() * 16 - 4)
      val d = S1ChordAngle.toRadians(
        S2EdgeDistances.distanceToChain2(q, line, closed = false))
      if (d < r - 2 * MaxErr) assert(buf.contains(q), s"near line: $q d=$d")
      if (d > r + 2 * MaxErr) assert(!buf.contains(q), s"far from line: $q d=$d")
    }
  }
}
