package graft.core

import org.scalatest.funsuite.AnyFunSuite
import S2Winding._

/** Winding-number queries: rule semantics over stacked/nested/reversed
  * rings, and the reference's documented identities (POSITIVE = N-way
  * union, ODD = N-way symmetric difference;
  * s2winding_operation.h:107-119). */
class S2WindingSpec extends AnyFunSuite {
  private def ring(text: String): Array[V3] = S2TextFormat.parsePoints(text)

  private val sqA = ring("0:0, 0:10, 10:10, 10:0")          // CCW
  private val sqB = ring("2:2, 2:8, 8:8, 8:2")              // nested in A, CCW
  private val sqC = ring("40:40, 40:50, 50:50, 50:40")      // disjoint, CCW

  private def pt(lat: Double, lng: Double): V3 = V3.fromLatLngDegrees(lat, lng)

  test("winding numbers: stacks, nesting, reversal") {
    val rings = Seq(sqA, sqB, sqC)
    assert(windingNumber(rings, pt(1, 1)) == 1)   // in A only
    assert(windingNumber(rings, pt(5, 5)) == 2)   // in A and B
    assert(windingNumber(rings, pt(45, 45)) == 1) // in C
    assert(windingNumber(rings, pt(30, 30)) == 0) // outside all
    // a reversed ring subtracts
    assert(windingNumber(Seq(sqA, sqB.reverse), pt(5, 5)) == 0)
    assert(windingNumber(Seq(sqA, sqB.reverse), pt(1, 1)) == 1)
  }

  test("Evaluator (prebuilt loops) == windingNumber everywhere") {
    val rnd = new scala.util.Random(7)
    val rings = Seq(sqA, sqB.reverse, sqC, sqA) // stack + reversal + dup
    val eval = evaluator(rings)
    for (_ <- 0 until 300) {
      val p = pt(rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 360 - 180)
      assert(eval.winding(p) == windingNumber(rings, p))
    }
  }

  test("rules: POSITIVE = union, ODD = symmetric difference (identities)") {
    val rings = Seq(sqA, sqB, sqC)
    for ((p, inA, inB, inC) <- Seq(
      (pt(1, 1), true, false, false), (pt(5, 5), true, true, false),
      (pt(45, 45), false, false, true), (pt(30, 30), false, false, false))) {
      assert(contains(rings, Positive, p) == (inA || inB || inC))
      assert(contains(rings, Odd, p) == (inA ^ inB ^ inC))
      assert(contains(rings, NonZero, p) == (inA || inB || inC)) // all CCW
    }
    // NEGATIVE with a reversed ring
    assert(contains(Seq(sqB.reverse), Negative, pt(5, 5)))
    assert(!contains(Seq(sqB.reverse), Negative, pt(30, 30)))
  }

  test("toPolygon materializes the rule region (non-crossing rings)") {
    val rnd = new scala.util.Random(21)
    val rings = Seq(sqA, sqB, sqC)
    for (rule <- Seq[WindingRule](Positive, Odd, NonZero)) {
      val poly = toPolygon(rings, rule)
      for (_ <- 0 until 2000) {
        val p = pt(rnd.nextDouble() * 70 - 10, rnd.nextDouble() * 70 - 10)
        assert(poly.contains(p) == contains(rings, rule, p),
          s"$rule at $p")
      }
    }
    // ODD over nested rings = A with hole B, plus C
    val odd = toPolygon(rings, Odd)
    assert(odd.numLoops == 3)
    assert(!odd.contains(pt(5, 5)) && odd.contains(pt(1, 1)))
  }

  test("toPolygon with multiplicity: doubled ring drops out of ODD, stays in POSITIVE") {
    val rings = Seq(sqA, sqA.reverse.reverse) // the same ring twice
    assert(windingNumber(rings, pt(5, 5)) == 2)
    val odd = toPolygon(rings, Odd)
    assert(!odd.contains(pt(5, 5))) // even multiplicity vanishes under ODD
    val pos = toPolygon(rings, Positive)
    assert(pos.contains(pt(5, 5)))
  }

  test("toPolygon with CROSSING rings: POSITIVE = union, ODD = symmetric difference") {
    val crossing = ring("5:5, 5:15, 15:15, 15:5")
    val pa = new S2Polygon(Array(S2Loop(sqA)))
    val pb = new S2Polygon(Array(S2Loop(crossing)))
    val pos = toPolygon(Seq(sqA, crossing), Positive)
    val odd = toPolygon(Seq(sqA, crossing), Odd)
    val uni = S2BooleanOps.union(pa, pb)
    val sym = S2BooleanOps.symmetricDifference(pa, pb)
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 2000) {
      val p = V3.fromLatLngDegrees(rnd.nextDouble() * 30 - 5, rnd.nextDouble() * 30 - 5)
      assert(pos.contains(p) == uni.contains(p), s"POSITIVE at $p")
      assert(odd.contains(p) == sym.contains(p), s"ODD at $p")
    }
    assert(math.abs(pos.area - uni.area) < 1e-12)
    assert(math.abs(odd.area - sym.area) < 1e-12)
  }

  test("randomized: grid rings with duplicates/reversals, all rules, pointwise vs windingNumber") {
    // windingNumber() is an independent pointwise oracle for toPolygon:
    // rule.matches(winding(p)) must equal materialized containment
    val rnd = new scala.util.Random(77)
    def cellRing(r: Int, c: Int): Array[V3] =
      ring(s"$r:$c, $r:${c + 1}, ${r + 1}:${c + 1}, ${r + 1}:$c")
    for (trial <- 0 until 15) {
      val rings = (0 until 16).filter(_ => rnd.nextDouble() < 0.5).flatMap { i =>
        val base = cellRing(i / 4, i % 4)
        val copies = 1 + rnd.nextInt(2) // multiplicity 1-2
        (0 until copies).map { _ =>
          if (rnd.nextDouble() < 0.3) base.reverse else base // some CW
        }
      }
      if (rings.nonEmpty) {
        for (rule <- Seq(Positive, Negative, NonZero, Odd)) {
          val polyR = toPolygon(rings, rule)
          for (r <- -1 to 4; c <- -1 to 4) {
            val p = pt(r + 0.3 + rnd.nextDouble() * 0.4, c + 0.3 + rnd.nextDouble() * 0.4)
            val want = rule.matches(windingNumber(rings, p))
            assert(polyR.contains(p) == want,
              s"trial $trial rule $rule at ($r,$c): winding=${windingNumber(rings, p)}")
          }
        }
      }
    }
  }

  test("toPolygon crossing + CW ring: NONZERO vs POSITIVE differ as expected") {
    // CCW square A plus a CW (reversed) square crossing it: the CW ring
    // contributes -1 in its small region, so POSITIVE = A minus overlap,
    // NONZERO additionally keeps the CW ring's non-overlapping part
    val cw = ring("5:5, 5:15, 15:15, 15:5").reverse
    val pos = toPolygon(Seq(sqA, cw), Positive)
    val nz = toPolygon(Seq(sqA, cw), NonZero)
    assert(pos.contains(pt(1, 1)))   // A-only region: w=+1
    assert(!pos.contains(pt(7, 7)))  // overlap: w=0
    assert(!pos.contains(pt(14, 14))) // CW-only: w=-1 fails POSITIVE
    assert(nz.contains(pt(14, 14)))  // ...but passes NONZERO
    assert(!nz.contains(pt(7, 7)))
    assert(nz.contains(pt(1, 1)))
  }
}
