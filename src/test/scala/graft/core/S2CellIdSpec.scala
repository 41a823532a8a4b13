package graft.core

import org.scalatest.funsuite.AnyFunSuite
import S2CellId._

/** Golden values lifted from /root/reference/src/s2/s2cell_id_test.cc. */
class S2CellIdSpec extends AnyFunSuite {

  private def idFromDeg(lat: Double, lng: Double): Long =
    fromLatLngDegrees(lat, lng)

  test("FaceDefinitions (s2cell_id_test.cc:89-103)") {
    assert(face(idFromDeg(0, 0)) == 0)
    assert(face(idFromDeg(0, 90)) == 1)
    assert(face(idFromDeg(90, 0)) == 2)
    assert(face(idFromDeg(0, 180)) == 3)
    assert(face(idFromDeg(0, -90)) == 4)
    assert(face(idFromDeg(-90, 0)) == 5)
  }

  test("ParentChildRelationships (s2cell_id_test.cc:305-330)") {
    val id = fromFacePosLevel(3, 0x12345678L, MaxLevel - 4)
    assert(isValid(id))
    assert(face(id) == 3)
    assert(pos(id) == 0x12345700L)
    assert(level(id) == MaxLevel - 4)
    assert(!isLeaf(id))
    val c2 = child(childBegin(id), 2)
    assert(childPosition(c2, level(c2)) == 2)
    assert(face(parent(id, 0)) == 3)
    assert(childBegin(id, MaxLevel) == rangeMin(id))
    // child ordering & containment
    assert(uLt(childBegin(id), id) && uLt(id, childEnd(id)))
    assert(childEnd(id) == childBegin(next(id)))
    assert(rangeMin(id) == rangeMin(childBegin(id)))
    assert(contains(id, childBegin(id)))
    assert(contains(id, rangeMax(id)))
    assert(!contains(id, next(rangeMax(id))))
  }

  test("FromFace") {
    for (f <- 0 until 6) assert(fromFacePosLevel(f, 0, 0) == fromFace(f))
  }

  test("token round trips at all levels, all faces") {
    for (f <- 0 until 6; lvl <- 0 to 30) {
      val id = parent(fromLatLngDegrees(17.3 * (f + 1) - 50, 31.7 * f - 120), lvl)
      assert(fromToken(toToken(id)) == id, s"face $f level $lvl")
      assert(level(id) == lvl)
    }
    assert(toToken(0L) == "X" && fromToken("X") == 0L)
    assert(fromToken("876b e99") == 0L)
    assert(fromToken("876bee99\n") == 0L)
    assert(fromToken("876[ee99") == 0L)
    assert(fromToken(" 876bee99") == 0L)
  }

  test("known token goldens") {
    // S2CellId for (lat,lng) computed by the reference's own definition:
    // face 1 center is (0,90).
    val faceToken = toToken(fromFace(1))
    assert(fromToken(faceToken) == fromFace(1))
    assert(toToken(fromFace(0)) == "1")        // 0x1000...000 >> strip = "1"
    assert(toToken(fromFace(5)) == "b")        // face 5 msb: 0xb000...
  }

  test("Inverses: leaf id -> latlng -> id round trip") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 20000) {
      val lat = rnd.nextDouble() * 180 - 90
      val lng = rnd.nextDouble() * 360 - 180
      val id = fromLatLngDegrees(lat, lng)
      assert(isLeaf(id) && level(id) == MaxLevel)
      val (clat, clng) = toLatLng(id)
      assert(fromLatLngRadians(clat, clng) == id)
    }
  }

  test("Tokens random round-trip at random levels") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 20000) {
      val leaf = fromLatLngDegrees(rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)
      val id = parent(leaf, rnd.nextInt(31))
      val tok = toToken(id)
      assert(tok.length <= 16)
      assert(fromToken(tok) == id)
    }
  }

  test("debug string round trip + goldens") {
    assert(toDebugString(fromFace(2)) == "2/")
    val z = fromDebugString("2/033020001100")
    assert(toDebugString(z) == "2/033020001100")
    assert(face(z) == 2 && level(z) == 12)
  }

  test("AllNeighborsForZurich (s2cell_id_test.cc:665-678)") {
    val id = fromDebugString("2/033020001100")
    val got = allNeighbors(id, level(id)).map(toDebugString).sorted.toSeq
    val want = Seq(
      "2/033020001030", "2/033020001033", "2/033020001101",
      "2/033020001102", "2/033020001103", "2/033031110010",
      "2/033031110011", "2/033031110322").sorted
    assert(got == want)
  }

  test("EdgeNeighbors: face-cell neighbors wrap correctly") {
    // neighbors of the face-1 cell at level 0 are faces 0,2,3,5 in some order
    val nbrs = edgeNeighbors(fromFace(1)).map(face).toSet
    assert(nbrs == Set(0, 2, 3, 5))
  }

  test("VertexNeighbors at cube corner gives 3 cells") {
    // leaf cell at the corner of faces 0,4,5: latlng (-45, -45)-ish corner
    val id = fromPoint(1, -1, -1)
    val n = vertexNeighbors(id, 0)
    assert(n.length == 3)
  }

  test("Hilbert curve continuity: next of rangeMax sibling adjacency") {
    var id = begin(10)
    var count = 0
    var prevId = 0L
    while (id != end(10) && count < 1000) {
      if (count > 0) {
        assert(uGt(id, prevId))
        assert(commonAncestorLevel(id, prevId) >= 0 || face(id) != face(prevId))
      }
      prevId = id
      id = next(id)
      count += 1
    }
  }

  test("advance and distanceFromBegin") {
    assert(advance(begin(5), 42) != begin(5))
    assert(distanceFromBegin(advance(begin(5), 42)) == 42)
    // last cell at level 5 wraps to the first
    val last = prevWrap(begin(5))
    assert(isValid(last) && face(last) == 5)
    assert(advanceWrap(last, 1) == begin(5))
    assert(nextWrap(last) == begin(5))
  }

  test("maximumTile tiles a range minimally") {
    val start = rangeMin(fromDebugString("1/012"))
    val limit = next(fromDebugString("1/013"))
    var id = maximumTile(start, rangeMin(limit))
    assert(toDebugString(id) == "1/012")
    id = maximumTile(next(id), rangeMin(limit))
    assert(toDebugString(id) == "1/013")
  }

  test("commonAncestorLevel") {
    val a = fromDebugString("1/0123")
    assert(commonAncestorLevel(a, a) == 4)
    assert(commonAncestorLevel(parent(a, 2), a) == 2)
    assert(commonAncestorLevel(fromFace(0), fromFace(5)) == -1)
  }

  test("unsigned ordering via orderKey matches compareUnsigned") {
    val ids = (0 until 6).map(fromFace)
    for (a <- ids; b <- ids) {
      assert((orderKey(a) < orderKey(b)) == uLt(a, b))
    }
  }

  test("center point round trip: toPoint -> fromPoint identity for leaves") {
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 5000) {
      val id = fromLatLngDegrees(rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)
      val p = toPoint(id)
      assert(fromPoint(p(0), p(1), p(2)) == id)
    }
  }
}
