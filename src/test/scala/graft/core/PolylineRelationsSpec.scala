package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Reference-golden cases for S2PolylineRelations, mirroring
  * s2polyline_test.cc (Intersects* at :376-420 and the
  * S2PolylineCoveringTest family at :680-766). */
class PolylineRelationsSpec extends AnyFunSuite {
  private def pl(s: String): Array[V3] = S2TextFormat.parsePoints(s)
  private def deg(d: Double): Double = math.toRadians(d)

  private def covers(a: String, b: String, maxErrDeg: Double): Boolean =
    S2PolylineRelations.nearlyCovers(pl(a), pl(b), deg(maxErrDeg))

  /** mirrors TestNearlyCovers(a, b, e, expectBcoversA, expectAcoversB) */
  private def checkCovers(a: String, b: String, maxErrDeg: Double,
                          bCoversA: Boolean, aCoversB: Boolean): Unit = {
    assert(covers(b, a, maxErrDeg) == bCoversA, s"covers($b, $a, $maxErrDeg)")
    assert(covers(a, b, maxErrDeg) == aCoversB, s"covers($a, $b, $maxErrDeg)")
  }

  test("Intersects: basic / empty / one point (s2polyline_test.cc:376-397)") {
    val line1 = pl("1:1, 4:4")
    assert(!S2PolylineRelations.intersects(Array.empty[V3], line1))
    assert(!S2PolylineRelations.intersects(line1, pl("1:1"))) // no edges
    assert(S2PolylineRelations.intersects(line1, pl("1:2, 2:1")))
    assert(!S2PolylineRelations.intersects(line1, pl("1:2, 2:3")))
    assert(S2PolylineRelations.intersects(line1, pl("1:2, 2:3, 4:3")))
  }

  test("Intersects: at shared vertex and vertex-on-edge (:399-420)") {
    val line1 = pl("1:1, 4:4, 4:6")
    assert(S2PolylineRelations.intersects(line1, pl("1:1, 1:2")))
    assert(S2PolylineRelations.intersects(line1, pl("5:1, 4:4, 2:2")))
    val h1 = pl("0:1, 0:3")
    val h2 = pl("0:3, 0:1")
    val v1 = pl("-1:2, 0:2, 1:2")
    val v2 = pl("1:2, 0:2, -1:2")
    for (h <- Seq(h1, h2); v <- Seq(v1, v2))
      assert(S2PolylineRelations.intersects(h, v))
  }

  test("NearlyCovers: overlap self / reverse / equivalent (:681-694)") {
    checkCovers("1:1, 2:2, -1:10", "1:1, 2:2, -1:10", 1e-10,
      bCoversA = true, aCoversB = true)
    checkCovers("1:1, 2:2, -1:10", "-1:10, 2:2, 1:1", 1e-10,
      bCoversA = false, aCoversB = false)
    checkCovers("1:1, 2:1", "1:1, 1.5:1, 2:1", 1e-10,
      bCoversA = true, aCoversB = true)
  }

  test("NearlyCovers: short covered by long / partial overlap (:696-707)") {
    checkCovers("-5:1, 10:1, 10:5, 5:10", "9:1, 9.9995:1, 10.0005:5", 1e-3,
      bCoversA = false, aCoversB = true)
    checkCovers("-5:1, 10:1", "0:1, 20:1", 1.0,
      bCoversA = false, aCoversB = false)
  }

  test("NearlyCovers: backtracking (:709-722)") {
    val t1 = "0:0, 0:2, 0:1, 0:4, 0:5"
    val t2 = "0:0, 0:2, 0:4, 0:3, 0:5"
    checkCovers(t1, t2, 1.5, bCoversA = true, aCoversB = true)
    checkCovers(t1, t2, 0.5, bCoversA = false, aCoversB = false)
    checkCovers("5:1, -5:1", "1:1, 3:1", 1.0, bCoversA = false, aCoversB = false)
    checkCovers("5:1, -5:1", "1:1, 3:1", 2.5, bCoversA = false, aCoversB = true)
  }

  test("NearlyCovers: duplicate points / start choices / wiggly (:724-748)") {
    checkCovers("0:1, 0:2, 0:2, 0:3", "0:1, 0:1, 0:1, 0:3", 1e-10,
      bCoversA = true, aCoversB = true)
    checkCovers("0:11, 0:0, 0:9, 0:20", "0:10, 0:15", 1.5,
      bCoversA = false, aCoversB = true)
    checkCovers("40:1, 20:1",
      "39.9:0.9, 40:1.1, 30:1.15, 29:0.95, 28:1.1, 27:1.15, " +
        "26:1.05, 25:0.85, 24:1.1, 23:0.9, 20:0.99",
      0.2, bCoversA = true, aCoversB = true)
  }

  test("NearlyCovers: match at (duplicated) last vertex, empties (:750-766)") {
    checkCovers("0:0, 0:2", "0:2, 0:3", 1.5, bCoversA = false, aCoversB = true)
    checkCovers("0:0, 0:2, 0:2, 0:2", "0:2, 0:3", 1.5,
      bCoversA = false, aCoversB = true)
    checkCovers("0:1, 0:2", "", 0.0, bCoversA = false, aCoversB = true)
    checkCovers("", "", 0.0, bCoversA = true, aCoversB = true)
  }

  test("collinear equator family reduces to the max-overhang rule") {
    // the q_polyline_relate gate's independent rule: for forward collinear
    // equator chains, self=[0:L0, 0:L1] nearly covers [0:a, 0:b] iff
    // radians(max(L0-a, b-L1, 0)) <= tol
    val L0 = 10.005; val L1 = 40.005; val tol = 0.02
    val self = pl(s"0:$L0, 0:$L1")
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 500) {
      val a = math.floor(rnd.nextDouble() * 600) / 10.0
      val b = a + (math.floor(rnd.nextDouble() * 80) + 1) / 10.0
      val expect = math.toRadians(math.max(math.max(L0 - a, b - L1), 0.0)) <= tol
      assert(S2PolylineRelations.nearlyCovers(self, pl(s"0:$a, 0:$b"), tol) == expect,
        s"a=$a b=$b")
    }
  }
}
