package graft.core

import org.scalatest.funsuite.AnyFunSuite

class S2PointCodecSpec extends AnyFunSuite {

  private def chain(n: Int, lat0: Double, lng0: Double,
                    stepDeg: Double): Array[V3] =
    Array.tabulate(n)(j =>
      V3.fromLatLngDegrees(lat0 + j * stepDeg, lng0 + j * stepDeg * 1.7))

  test("roundtrip is exact on snapped chains at every level") {
    val pts = chain(50, 10.0, 20.0, 0.013)
    for (level <- Seq(4, 12, 20, 30)) {
      val snapped = S2PointCodec.snap(pts, level)
      val back = S2PointCodec.decode(S2PointCodec.encode(pts, level))
      assert(back.toSeq == snapped.toSeq, s"level $level")
      // idempotent: re-encoding the snapped chain gives identical bytes
      assert(S2PointCodec.encode(snapped, level).toSeq ==
        S2PointCodec.encode(pts, level).toSeq, s"level $level")
    }
  }

  test("coherent chains compress far below raw doubles") {
    val pts = chain(1000, -35.0, 140.0, 0.0008)
    val bytes = S2PointCodec.encode(pts, 20)
    // 24 bytes/vertex raw; curve deltas of a coherent chain stay small.
    // (cross-face or curve-discontinuity hops cost a long varint each,
    // but they are rare on real trajectories.)
    assert(bytes.length < 6 * pts.length, s"${bytes.length} bytes for ${pts.length} pts")
    assert(S2PointCodec.decode(bytes).length == 1000)
  }

  test("scattered points still roundtrip (no coherence assumed)") {
    val rnd = new scala.util.Random(3)
    val pts = Array.fill(300)(V3.fromLatLngDegrees(
      rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 360 - 180))
    for (level <- Seq(8, 24)) {
      val back = S2PointCodec.decode(S2PointCodec.encode(pts, level))
      assert(back.toSeq == S2PointCodec.snap(pts, level).toSeq)
    }
  }

  test("faces 4-5 (negative cell ids) and face boundaries roundtrip") {
    val pts = chain(40, -60.0, -120.0, 0.05) ++ // southern hemisphere
      chain(10, -0.2, 44.9, 0.05) // walks across a face corner region
    for (level <- Seq(10, 30)) {
      val back = S2PointCodec.decode(S2PointCodec.encode(pts, level))
      assert(back.toSeq == S2PointCodec.snap(pts, level).toSeq)
    }
  }

  test("level mismatch and corrupt inputs are rejected loudly") {
    val cells = S2PointCodec.cellsOf(chain(5, 0, 0, 0.1), 12)
    intercept[IllegalArgumentException] {
      S2PointCodec.encodeCells(cells, 13)
    }
    val ok = S2PointCodec.encode(chain(5, 0, 0, 0.1), 12)
    intercept[Exception] { S2PointCodec.decodeCells(ok.take(2)) }
    val badVersion = ok.clone(); badVersion(0) = 9
    intercept[IllegalArgumentException] { S2PointCodec.decodeCells(badVersion) }
    // crafted huge count must be rejected BEFORE the output allocation
    // (varint 0xFF..0x7F = count ~2^31 against a 3-byte payload)
    val hugeCount = Array[Byte](1, 12, -1, -1, -1, -1, 7, 0, 0, 0)
    intercept[IllegalArgumentException] { S2PointCodec.decodeCells(hugeCount) }
    // trailing garbage after the last position is corruption, not padding
    intercept[IllegalArgumentException] { S2PointCodec.decodeCells(ok :+ 0.toByte) }
    // a delta that walks the curve position past face 5 must raise the
    // codec's own IllegalArgumentException, not a downstream MatchError
    val offCurve = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(1); out.write(4); out.write(2) // version 1, level 4, count 2
      // first position: max valid level-4 curve pos; delta +2 exits face 5
      var v = (6L << 8) - 1 // 6 faces * 4^4 cells - 1
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
      out.write(4) // zigzag(+2)
      out.toByteArray
    }
    intercept[IllegalArgumentException] { S2PointCodec.decodeCells(offCurve) }
    // off-curve position whose HIGH bits shift out of the 64-bit id and
    // alias to a valid cell: level 4, first pos = 2049 (valid range is
    // [0, 1536)) — the shifted id equals the pos-1 cell, so an id-level
    // validity check passes; the position-range check must reject it
    val aliasing = Array[Byte](1, 4, 1, 0x81.toByte, 0x10)
    intercept[IllegalArgumentException] { S2PointCodec.decodeCells(aliasing) }
  }

  test("decoded cells are valid ids of the encoded level") {
    val pts = chain(64, 48.0, 2.0, 0.002)
    val cells = S2PointCodec.decodeCells(S2PointCodec.encode(pts, 22))
    assert(cells.forall(c => S2CellId.level(c) == 22))
    assert(cells.toSeq == S2PointCodec.cellsOf(pts, 22).toSeq)
  }
}
