package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Reference golden values for point↔edge distances
  * (ported from /root/reference/src/s2/s2edge_distances_test.cc:143-178,
  * TEST(S2, Distance)) — anchors the S2ClosestEdgeQuery-semantics
  * bit-match claim. */
class S2EdgeDistancesGoldenSpec extends AnyFunSuite {

  def check(x: V3, a: V3, b: V3, expectedRad: Double,
            expectedClosest: Option[V3]): Unit = {
    val xn = x.normalize; val an = a.normalize; val bn = b.normalize
    val d2 = S2EdgeDistances.distance2(xn, an, bn)
    assert(math.abs(S1ChordAngle.toRadians(d2) - expectedRad) < 1e-15,
      s"distance($x, $a, $b)")
    if (expectedRad != math.Pi / 2) {
      val closest = S2EdgeDistances.project(xn, an, bn)
      expectedClosest match {
        case None => assert(closest == an || closest == bn)
        case Some(c) =>
          val cn = c.normalize
          assert((closest - cn).norm < 1e-13, s"project($x, $a, $b) = $closest")
      }
    }
  }

  test("reference TEST(S2, Distance) goldens") {
    val PI = math.Pi
    check(V3(1, 0, 0), V3(1, 0, 0), V3(0, 1, 0), 0, Some(V3(1, 0, 0)))
    check(V3(0, 1, 0), V3(1, 0, 0), V3(0, 1, 0), 0, Some(V3(0, 1, 0)))
    check(V3(1, 3, 0), V3(1, 0, 0), V3(0, 1, 0), 0, Some(V3(1, 3, 0)))
    check(V3(0, 0, 1), V3(1, 0, 0), V3(0, 1, 0), PI / 2, Some(V3(1, 0, 0)))
    check(V3(0, 0, -1), V3(1, 0, 0), V3(0, 1, 0), PI / 2, Some(V3(1, 0, 0)))
    check(V3(-1, -1, 0), V3(1, 0, 0), V3(0, 1, 0), 0.75 * PI, None)
    check(V3(0, 1, 0), V3(1, 0, 0), V3(1, 1, 0), PI / 4, Some(V3(1, 1, 0)))
    check(V3(0, -1, 0), V3(1, 0, 0), V3(1, 1, 0), PI / 2, Some(V3(1, 0, 0)))
    check(V3(0, -1, 0), V3(1, 0, 0), V3(-1, 1, 0), PI / 2, Some(V3(1, 0, 0)))
    check(V3(-1, -1, 0), V3(1, 0, 0), V3(-1, 1, 0), PI / 2, Some(V3(-1, 1, 0)))
    check(V3(1, 1, 1), V3(1, 0, 0), V3(0, 1, 0),
      math.asin(math.sqrt(1.0 / 3)), Some(V3(1, 1, 0)))
    check(V3(1, 1, -1), V3(1, 0, 0), V3(0, 1, 0),
      math.asin(math.sqrt(1.0 / 3)), Some(V3(1, 1, 0)))
    check(V3(-1, 0, 0), V3(1, 1, 0), V3(1, 1, 0), 0.75 * PI, Some(V3(1, 1, 0)))
    check(V3(0, 0, -1), V3(1, 1, 0), V3(1, 1, 0), PI / 2, Some(V3(1, 1, 0)))
    check(V3(-1, 0, 0), V3(1, 0, 0), V3(1, 0, 0), PI, Some(V3(1, 0, 0)))
  }

  test("interior-distance lower bound stays conservative (reference regression)") {
    // reference s2edge_distances_test.cc:180-190: a case where the fast
    // XQ^2 lower bound used to exceed the true distance
    val x = V3(-0.017952729194524016, -0.30232422079175203, 0.95303607751077712)
    val a = V3(-0.017894725505830295, -0.30229974986194175, 0.95304493075220664)
    val b = V3(-0.017986591360900289, -0.30233851195954353, 0.95303090543659963)
    val d2 = S2EdgeDistances.distance2(x, a, b)
    val xa2 = (x - a).norm2
    val xb2 = (x - b).norm2
    val interior = S2EdgeDistances.interiorDistance2(x, a, b, xa2, xb2)
    assert(interior >= 0, "interior case must be detected")
    assert(d2 <= math.min(xa2, xb2))
  }
}
