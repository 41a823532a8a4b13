package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden + property tests mirroring the reference's own suites:
  * s2predicates_test.cc, s2loop_test.cc (named loop corpus,
  * s2loop_test.cc:181-227), s2region_coverer_test.cc (CheckCovering
  * oracle, s2testing.cc:130-155), s2cell_union_test.cc. */
class S2GeometrySpec extends AnyFunSuite {

  // ---- named loops from the reference test fixtures ----
  def mkLoop(s: String): S2Loop =
    S2Loop(s.split(",").map { tok =>
      val Array(lat, lng) = tok.trim.split(":")
      V3.fromLatLngDegrees(lat.toDouble, lng.toDouble)
    })

  val northHemi = mkLoop("0:-180, 0:-90, 0:0, 0:90")
  val southHemi = mkLoop("0:90, 0:0, 0:-90, 0:-180")
  val westHemi = mkLoop("0:-180, -90:0, 0:0, 90:0")
  val eastHemi = mkLoop("90:0, 0:0, -90:0, 0:-180")
  val nearHemi = mkLoop("0:-90, -90:0, 0:90, 90:0")
  val candyCane = mkLoop("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
  val arctic80 = mkLoop("80:-150, 80:-30, 80:90")
  val antarctic80 = mkLoop("-80:120, -80:0, -80:-120")
  val smallNeCw = mkLoop("35:20, 45:20, 40:25")

  val northPole = V3(0, 0, 1)
  val southPole = V3(0, 0, -1)

  test("loop contains poles (s2loop_test.cc named loops)") {
    assert(northHemi.contains(northPole))
    assert(!northHemi.contains(southPole))
    assert(southHemi.contains(southPole))
    assert(!southHemi.contains(northPole))
    assert(arctic80.contains(northPole))
    assert(!arctic80.contains(southPole))
    assert(antarctic80.contains(southPole))
    assert(!antarctic80.contains(northPole))
    // small CW loop near (40,22): contains neither pole... it is CW so it
    // contains almost everything EXCEPT the small triangle.
    assert(smallNeCw.contains(northPole))
    assert(smallNeCw.contains(southPole))
    assert(!smallNeCw.contains(V3.fromLatLngDegrees(40, 22)))
  }

  test("empty/full loops") {
    val e = S2Loop.empty
    val f = S2Loop.full
    assert(e.isEmpty && !e.contains(northPole) && !e.contains(southPole))
    assert(f.isFull && f.contains(northPole) && f.contains(southPole))
    assert(e.area == 0.0)
    assert(f.area == 4 * math.Pi)
  }

  test("hemisphere areas = 2*pi") {
    val twoPi = 2 * math.Pi
    for (h <- Seq(northHemi, southHemi, westHemi, eastHemi, nearHemi)) {
      assert(math.abs(h.area - twoPi) < 1e-12, s"area ${h.area}")
    }
  }

  test("candy cane contains/excludes its test points") {
    assert(candyCane.contains(V3.fromLatLngDegrees(5, 71)))
    assert(!candyCane.contains(northPole))
  }

  test("loop contains is consistent with invert") {
    val inv = arctic80.invert
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 500) {
      val p = V3.fromLatLngDegrees(rnd.nextDouble() * 180 - 90,
        rnd.nextDouble() * 360 - 180)
      assert(arctic80.contains(p) != inv.contains(p))
    }
  }

  test("sign is anti-symmetric and never zero for distinct points") {
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 2000) {
      val a = V3.fromLatLngDegrees(rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)
      val b = V3.fromLatLngDegrees(rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)
      val c = V3.fromLatLngDegrees(rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)
      if (a != b && b != c && c != a) {
        val s1 = S2Predicates.sign(a, b, c)
        assert(s1 == 1 || s1 == -1)
        assert(S2Predicates.sign(c, b, a) == -s1)
        assert(S2Predicates.sign(b, c, a) == s1) // rotation invariant
      }
    }
  }

  test("sign handles exactly collinear points deterministically") {
    // Three points on the equator are exactly collinear in z=0 plane only
    // if coordinates are symmetric; use symbolic perturbation cases.
    val a = V3(1, 0, 0)
    val b = V3(0, 1, 0)
    val c = V3(-1, 0, 0) // antipodal to a; det(a,b,c) == 0 exactly
    val s = S2Predicates.sign(a, b, c)
    assert(s == 1 || s == -1)
    assert(S2Predicates.sign(c, b, a) == -s)
  }

  test("crossingSign basic cases") {
    val a = V3.fromLatLngDegrees(0, 0)
    val b = V3.fromLatLngDegrees(0, 10)
    val c = V3.fromLatLngDegrees(-5, 5)
    val d = V3.fromLatLngDegrees(5, 5)
    assert(S2EdgeCrossings.crossingSign(a, b, c, d) == 1)
    // Shared vertex -> 0
    assert(S2EdgeCrossings.crossingSign(a, b, a, d) == 0)
    // Disjoint -> -1
    val e = V3.fromLatLngDegrees(20, 20)
    val f = V3.fromLatLngDegrees(30, 30)
    assert(S2EdgeCrossings.crossingSign(a, b, e, f) == -1)
  }

  // ---- covering oracle (port of S2Testing::CheckCovering) ----
  def checkCovering(region: S2Region, covering: Array[Long],
                    checkTight: Boolean, id: Long = 0L): Unit = {
    if (!S2CellId.isValid(id)) {
      for (face <- 0 until 6)
        checkCovering(region, covering, checkTight, S2CellId.fromFace(face))
      return
    }
    val cell = S2Cell(id)
    if (!region.mayIntersectCell(cell)) {
      if (checkTight)
        assert(!S2CellUnion.intersectsCellId(covering, id),
          s"covering intersects non-intersecting cell ${S2CellId.toToken(id)}")
    } else if (!S2CellUnion.containsCellId(covering, id)) {
      assert(!region.containsCell(cell),
        s"region contains uncovered cell ${S2CellId.toToken(id)}")
      assert(!S2CellId.isLeaf(id), s"uncovered leaf ${S2CellId.toToken(id)}")
      var child = S2CellId.childBegin(id)
      val end = S2CellId.childEnd(id)
      while (child != end) {
        checkCovering(region, covering, checkTight, child)
        child = S2CellId.next(child)
      }
    }
  }

  test("random cap coverings satisfy the covering oracle (RandomCaps)") {
    val rnd = new scala.util.Random(42)
    for (i <- 0 until 50) {
      val maxCells = 1 + rnd.nextInt(16)
      val coverer = new S2RegionCoverer(maxCells = maxCells)
      val area = math.min(4 * math.Pi,
        math.max(1e-5, math.pow(10, -3 * rnd.nextDouble()) * 4 * math.Pi))
      val center = V3.fromLatLngDegrees(rnd.nextDouble() * 180 - 90,
        rnd.nextDouble() * 360 - 180)
      val cap = S2Cap.fromCenterArea(center, area)
      val covering = coverer.getCovering(cap)
      assert(covering.length <= math.max(maxCells, 6),
        s"covering too large: ${covering.length} > $maxCells")
      checkCovering(cap, covering, checkTight = true)
      val interior = coverer.getInteriorCovering(cap)
      for (id <- interior)
        assert(cap.containsCell(S2Cell(id)), "interior cell not contained")
    }
  }

  test("covering a cell returns that cell") {
    val id = S2CellId.fromDebugString("3/0123")
    val coverer = new S2RegionCoverer(maxCells = 8)
    val region = S2CellUnion.asRegion(Array(id))
    val cov = coverer.getCovering(region)
    assert(cov.toSeq == Seq(id))
  }

  test("polygon coverings satisfy the oracle") {
    val poly = S2Polygon.fromLoop(candyCane)
    val coverer = new S2RegionCoverer(maxCells = 12)
    val cov = coverer.getCovering(poly)
    assert(cov.nonEmpty && cov.length <= 12)
    checkCovering(poly, cov, checkTight = false)
  }

  test("cell union normalize merges complete sibling groups") {
    val parent = S2CellId.fromDebugString("1/012")
    val children = (0 until 4).map(S2CellId.child(parent, _)).toArray
    assert(S2CellUnion.normalize(children).toSeq == Seq(parent))
    // Drop contained cells.
    assert(S2CellUnion.normalize(children :+ parent).toSeq == Seq(parent))
    // Partial sibling groups stay.
    assert(S2CellUnion.normalize(children.take(3)).length == 3)
  }

  test("cell union set operations") {
    val a = S2CellUnion.normalize(Array(S2CellId.fromDebugString("1/01"),
      S2CellId.fromDebugString("1/02")))
    val b = S2CellUnion.normalize(Array(S2CellId.fromDebugString("1/02"),
      S2CellId.fromDebugString("1/03")))
    val inter = S2CellUnion.intersection(a, b)
    assert(inter.toSeq == Seq(S2CellId.fromDebugString("1/02")))
    val uni = S2CellUnion.union(a, b)
    assert(uni.toSeq == Seq(S2CellId.fromDebugString("1/0")).flatMap { p =>
      // 1/01,02,03 is not a complete group (1/00 missing)
      Seq.empty[Long]
    } ++ Seq("1/01", "1/02", "1/03").map(S2CellId.fromDebugString))
    val diff = S2CellUnion.difference(a, b)
    assert(diff.toSeq == Seq(S2CellId.fromDebugString("1/01")))
    assert(S2CellUnion.containsCellId(a, S2CellId.fromDebugString("1/012")))
    assert(!S2CellUnion.containsCellId(a, S2CellId.fromDebugString("1/031")))
  }

  test("random cell-union property: contains own randomly sampled leaves") {
    val rnd = new scala.util.Random(9)
    for (_ <- 0 until 100) {
      val ids = Array.fill(10) {
        val leaf = S2CellId.fromLatLngDegrees(rnd.nextDouble() * 180 - 90,
          rnd.nextDouble() * 360 - 180)
        S2CellId.parent(leaf, 4 + rnd.nextInt(20))
      }
      val norm = S2CellUnion.normalize(ids)
      for (id <- ids) {
        assert(S2CellUnion.containsCellId(norm, id))
        assert(S2CellUnion.intersectsCellId(norm, id))
      }
      // Sorted, non-overlapping.
      for (i <- 1 until norm.length)
        assert(S2CellId.uLt(S2CellId.rangeMax(norm(i - 1)), S2CellId.rangeMin(norm(i))))
    }
  }

  test("cap contains cell iff all sampled points inside (differential)") {
    val rnd = new scala.util.Random(77)
    for (_ <- 0 until 200) {
      val cap = S2Cap.fromCenterAngle(
        V3.fromLatLngDegrees(rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180),
        0.05 + rnd.nextDouble() * 0.5)
      val leaf = S2CellId.fromLatLngDegrees(rnd.nextDouble() * 180 - 90,
        rnd.nextDouble() * 360 - 180)
      val cell = S2Cell(S2CellId.parent(leaf, 2 + rnd.nextInt(8)))
      val contains = cap.containsCell(cell)
      val mayIntersect = cap.mayIntersectCell(cell)
      // sample cell corners + center
      val pts = (0 until 4).map(cell.vertex) :+ cell.center
      if (contains) assert(pts.forall(cap.contains))
      if (pts.exists(cap.contains)) assert(mayIntersect)
      if (!mayIntersect) assert(!pts.exists(cap.contains))
    }
  }

  test("rect bound of loop contains all vertices and edge midpoints") {
    for (loop <- Seq(northHemi, candyCane, arctic80, smallNeCw)) {
      val bound = loop.rectBound
      for (i <- 0 until loop.numVertices) {
        assert(bound.contains(loop.vertex(i)))
        val mid = (loop.vertex(i) + loop.vertex(i + 1)).normalize
        assert(bound.contains(mid))
      }
    }
  }

  test("chord angle arithmetic") {
    import S1ChordAngle._
    assert(fromRadians(0) == 0.0)
    assert(math.abs(fromRadians(math.Pi) - 4.0) < 1e-15)
    assert(math.abs(toRadians(fromRadians(0.5)) - 0.5) < 1e-14)
    assert(math.abs(add(fromRadians(0.3), fromRadians(0.4)) - fromRadians(0.7)) < 1e-14)
    assert(math.abs(sub(fromRadians(0.7), fromRadians(0.4)) - fromRadians(0.3)) < 1e-14)
    assert(sin2(fromRadians(0.2)) > 0)
    assert(math.abs(S1ChordAngle.cos(fromRadians(0.2)) - math.cos(0.2)) < 1e-14)
  }

  test("metrics level selection") {
    import S2Metrics._
    // kMaxDiag value at level k bounds cell diagonals.
    for (lvl <- Seq(5, 10, 20)) {
      val v = MaxDiag.value(lvl)
      assert(MaxDiag.levelForMaxValue(v) == lvl)
      assert(MinWidth.levelForMinValue(MinWidth.value(lvl)) == lvl)
    }
  }
}
