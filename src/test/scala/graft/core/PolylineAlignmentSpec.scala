package graft.core

import org.scalatest.funsuite.AnyFunSuite
import PolylineAlignment._

/** Exact / windowed / approximate DTW alignment, medoid and consensus —
  * reference semantics from s2polyline_alignment.cc (incl. its test
  * properties: approx cost upper-bounds exact, warp paths are monotone
  * staircases from (0,0) to (n-1,m-1), consensus converges for shifted
  * families). */
class PolylineAlignmentSpec extends AnyFunSuite {

  private def line(lat: Double, lng0: Double, n: Int, step: Double): Array[V3] =
    Array.tabulate(n)(i => V3.fromLatLngDegrees(lat, lng0 + i * step))

  private def zigzag(n: Int, seed: Long): Array[V3] = {
    var s = seed
    def next(): Double = { s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 40).toDouble / (1L << 24).toDouble }
    Array.tabulate(n)(i => V3.fromLatLngDegrees(next() * 4 - 2, i * 0.7 + next() * 0.2))
  }

  private def assertValidPath(p: Array[(Int, Int)], rows: Int, cols: Int): Unit = {
    assert(p.head == ((0, 0)) && p.last == ((rows - 1, cols - 1)))
    p.sliding(2).foreach { case Array((r0, c0), (r1, c1)) =>
      val dr = r1 - r0; val dc = c1 - c0
      assert(dr >= 0 && dc >= 0 && dr <= 1 && dc <= 1 && dr + dc >= 1)
    case _ => ()
    }
  }

  test("exact alignment: path valid, cost equals constant-space cost") {
    val a = zigzag(23, 7); val b = zigzag(31, 99)
    val r = exactVertexAlignment(a, b)
    assertValidPath(r.path, a.length, b.length)
    assert(math.abs(r.cost - exactCost(a, b)) < 1e-12)
    // identical polylines align for free along the diagonal
    val self = exactVertexAlignment(a, a)
    assert(self.cost == 0.0 && self.path.length == a.length)
  }

  test("windowed DTW with a full window equals the exact alignment") {
    val a = zigzag(17, 3); val b = zigzag(17, 4)
    val full = new Window(Array.fill(a.length)(Stride(0, b.length)))
    val w = dynamicTimewarp(a, b, full)
    val e = exactVertexAlignment(a, b)
    assert(w.cost == e.cost && w.path.sameElements(e.path))
  }

  test("window from warp path + upsample + dilate stays a valid staircase") {
    val a = zigzag(40, 11); val b = zigzag(40, 12)
    val proj = exactVertexAlignment(
      Array.tabulate(20)(i => a(2 * i)), Array.tabulate(20)(i => b(2 * i)))
    val w = new Window(proj.path).upsample(40, 40).dilate(2)
    assert(w.rows == 40 && w.cols == 40)
    assert(w.strides.head.start == 0 && w.strides.last.end == 40)
    w.strides.sliding(2).foreach { case Array(p, c) =>
      assert(c.start >= p.start && c.end >= p.end && c.end > c.start)
    case _ => ()
    }
  }

  test("approx alignment upper-bounds exact and hits it for shifted lines") {
    // 72 vertices forces two half-resolution recursions (switchover 32)
    val a = line(0.0, 10.0, 72, 0.5)
    val b = line(0.3, 10.0, 72, 0.5)
    val exact = exactVertexAlignment(a, b)
    val approx = approxVertexAlignment(a, b, 2)
    assert(approx.cost >= exact.cost - 1e-15)
    // parallel shift: the diagonal is strictly optimal (every cell >= the
    // 0.3 deg chord; non-diagonal paths are strictly longer), and the
    // refined window always contains the diagonal
    assert(math.abs(approx.cost - exact.cost) < 1e-12)
    assert(approx.path.length == 72 && approx.path.forall(p => p._1 == p._2))
    // noisy pair: still an upper bound, and within a sane factor
    val x = zigzag(80, 21); val y = zigzag(80, 22)
    val ec = exactCost(x, y)
    val ac = approxVertexAlignment(x, y, 2).cost
    assert(ac >= ec - 1e-15 && ac <= ec * 1.5)
  }

  test("small or dense inputs fall through to the exact solver") {
    val a = zigzag(20, 5); val b = zigzag(20, 6) // below size switchover
    assert(approxVertexAlignment(a, b, 2).cost == exactVertexAlignment(a, b).cost)
    val c = zigzag(40, 7); val d = zigzag(40, 8) // radius 30 -> dense window
    assert(approxVertexAlignment(c, d, 30).cost == exactVertexAlignment(c, d).cost)
  }

  private def strides(w: Window): Seq[(Int, Int)] =
    w.strides.toSeq.map(s => (s.start, s.end))
  private def win(ss: (Int, Int)*): Window =
    new Window(ss.map { case (a, b) => Stride(a, b) }.toArray)

  test("reference goldens: window upsample (x2, x-axis x3, y-axis x3)") {
    val w = win((0, 3), (1, 4), (2, 4), (3, 6), (4, 6))
    assert(strides(w.upsample(10, 12)) == Seq((0, 6), (0, 6), (2, 8), (2, 8),
      (4, 8), (4, 8), (6, 12), (6, 12), (8, 12), (8, 12)))
    assert(strides(w.upsample(5, 18)) ==
      Seq((0, 9), (3, 12), (6, 12), (9, 18), (12, 18)))
    assert(strides(w.upsample(15, 6)) == Seq((0, 3), (0, 3), (0, 3),
      (1, 4), (1, 4), (1, 4), (2, 4), (2, 4), (2, 4),
      (3, 6), (3, 6), (3, 6), (4, 6), (4, 6), (4, 6)))
  }

  test("reference goldens: window dilate radius 0/1/2/100") {
    val w = win((0, 3), (2, 3), (2, 3), (2, 4), (3, 6))
    assert(strides(w.dilate(0)) == Seq((0, 3), (2, 3), (2, 3), (2, 4), (3, 6)))
    assert(strides(w.dilate(1)) == Seq((0, 4), (0, 4), (1, 5), (1, 6), (1, 6)))
    assert(strides(w.dilate(2)) == Seq((0, 5), (0, 6), (0, 6), (0, 6), (0, 6)))
    assert(strides(w.dilate(100)) == Seq.fill(5)((0, 6)))
  }

  test("reference goldens: degenerate and header-example warp paths") {
    def pl(s: String): Array[V3] = s.split(',').map { t =>
      val Array(la, ln) = t.trim.split(':'); V3.fromLatLngDegrees(la.toDouble, ln.toDouble)
    }
    // length-one inputs (reference ExactLengthOneInput{s,A,B})
    assert(exactVertexAlignment(pl("1:1"), pl("2:2")).path.toSeq == Seq((0, 0)))
    assert(exactVertexAlignment(pl("0:0"), pl("0:0, 1:1, 2:2")).path.toSeq ==
      Seq((0, 0), (0, 1), (0, 2)))
    assert(exactVertexAlignment(pl("0:0, 1:1, 2:2"), pl("0:0")).path.toSeq ==
      Seq((0, 0), (1, 0), (2, 0)))
    // header-file example
    assert(exactVertexAlignment(pl("1:0, 5:0, 6:0, 9:0"),
      pl("2:0, 7:0, 8:0")).path.toSeq == Seq((0, 0), (1, 1), (2, 1), (3, 2)))
    // distance (not squared-distance) cost: right-angle case
    assert(exactVertexAlignment(pl("0.1:-0.1, 0.1:0, 0.1:0.1, -0.1:0.1"),
      pl("0.1:-0.1, -0.1:-0.1, -0.1:0.1")).path.toSeq ==
      Seq((0, 0), (1, 0), (2, 1), (3, 2)))
  }

  test("fuzzed vs brute force: DP cost equals exhaustive-path minimum") {
    def brute(a: Array[V3], b: Array[V3]): Double = {
      val memo = scala.collection.mutable.HashMap.empty[(Int, Int), Double]
      def cell(i: Int, j: Int): Double = {
        val d = a(i) - b(j); math.sqrt(d.x * d.x + d.y * d.y + d.z * d.z)
      }
      def go(i: Int, j: Int): Double = memo.getOrElseUpdate((i, j),
        cell(i, j) + (
          if (i == 0 && j == 0) 0.0
          else if (i == 0) go(i, j - 1)
          else if (j == 0) go(i - 1, j)
          else math.min(go(i - 1, j - 1), math.min(go(i - 1, j), go(i, j - 1)))))
      go(a.length - 1, b.length - 1)
    }
    val lines = (0 until 10).map(i => zigzag(8, 4000 + i))
    for (i <- lines.indices; j <- i + 1 until lines.length) {
      val bf = brute(lines(i), lines(j))
      assert(math.abs(exactCost(lines(i), lines(j)) - bf) < 1e-12)
      assert(math.abs(exactVertexAlignment(lines(i), lines(j)).cost - bf) < 1e-12)
    }
  }

  test("soak: approx upper-bounds exact with valid paths over 40 pairs") {
    (0 until 40).foreach { trial =>
      val n = 36 + (trial * 7) % 60
      val m = 36 + (trial * 11) % 60
      val a = zigzag(n, 1000 + trial)
      val b = zigzag(m, 2000 + trial)
      val radius = trial % 4
      val approx = approxVertexAlignment(a, b, radius)
      assertValidPath(approx.path, n, m)
      val ec = exactCost(a, b)
      assert(approx.cost >= ec - 1e-12, s"trial $trial: ${approx.cost} < $ec")
      // path cost re-summed from cells must equal the reported cost
      val resum = approx.path.map { case (i, j) =>
        val d = a(i) - b(j); math.sqrt(d.x * d.x + d.y * d.y + d.z * d.z)
      }.sum
      assert(math.abs(resum - approx.cost) < 1e-9 * (1 + approx.cost))
    }
  }

  test("reference goldens: medoid contract incl. smallest-index tie-break") {
    def pl(s: String): Array[V3] = s.split(',').map { t =>
      val Array(la, ln) = t.trim.split(':'); V3.fromLatLngDegrees(la.toDouble, ln.toDouble)
    }
    assert(medoidPolyline(IndexedSeq(pl("5:0, 5:1, 5:2"))) == 0)
    // any two polylines tie; ties break to the smallest index
    assert(medoidPolyline(IndexedSeq(
      pl("5:0, 5:1, 5:2"), pl("1:0, 1:1, 1:2"))) == 0)
    assert(medoidPolyline(IndexedSeq(
      pl("5:0, 5:1, 5:2"), pl("3:0, 3:1, 3:2"), pl("1:0, 1:1, 1:2"))) == 1)
    assert(medoidPolyline(IndexedSeq(
      pl("1:0, 1:1, 1:2"), pl("1:0, 1:1, 1:2"))) == 0) // identical: tie -> 0
    assert(medoidPolyline(IndexedSeq(
      pl("5:0, 5:1, 5:2"), pl("3:0, 3:0.5, 3:1, 3:2"),
      pl("1:0, 1:0.5, 1:1, 1:1.5, 1:2"))) == 1) // different lengths
  }

  test("medoid of a shifted family is the middle polyline") {
    val family = IndexedSeq(-2.0, -1.0, 0.0, 1.0, 2.0)
      .map(shift => line(shift, 50.0, 12, 1.0))
    assert(medoidPolyline(family) == 2)
    assert(medoidPolyline(family, approx = true) == 2)
  }

  test("consensus of a symmetric shifted family converges to the middle") {
    val family = IndexedSeq(-0.4, 0.0, 0.4).map(s => line(s, 120.0, 10, 1.0))
    val c = consensusPolyline(family, iterationCap = 10, seedMedoid = true)
    assert(c.length == 10)
    c.foreach { p =>
      assert(math.abs(V3.latDegrees(p)) < 0.02) // pulled to lat ~0
    }
    val lngs = c.map(V3.lngDegrees)
    lngs.indices.foreach(i => assert(math.abs(lngs(i) - (120.0 + i)) < 0.2))
  }
}
