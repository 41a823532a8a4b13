package graft.tools

import graft.core._
import graft.operators.Builder

/** Opt-in extended randomized soak of the constructive-geometry stack
  * (boolean ops, winding, polyline clip, disjoint union / LoopStitcher) —
  * far past the committed spec trial counts, with caller-chosen seeds.
  * Every probe has a known exact answer by construction (rectilinear grid
  * membership), so any disagreement is a real bug, not tolerance noise.
  *
  * Usage: sbt "runMain graft.tools.SoakFuzz [trials] [seed] [gridN]"
  * (defaults 500 / 20260817 / 8). Exits nonzero on the first failure.
  */
object SoakFuzz {

  private def cellPoly(r: Int, c: Int): S2Polygon = new S2Polygon(Array(S2Loop(
    Array(V3.fromLatLngDegrees(r, c), V3.fromLatLngDegrees(r, c + 1),
      V3.fromLatLngDegrees(r + 1, c + 1), V3.fromLatLngDegrees(r + 1, c)))))

  def main(args: Array[String]): Unit = {
    val trials = if (args.length > 0) args(0).toInt else 500
    val seed = if (args.length > 1) args(1).toLong else 20260817L
    val n = if (args.length > 2) args(2).toInt else 8
    val rnd = new scala.util.Random(seed)
    var nonTrivial = 0

    def gridPoly(cells: Set[(Int, Int)]): S2Polygon =
      Builder.unionDisjoint(cells.toSeq.map { case (r, c) => cellPoly(r, c) })

    for (trial <- 0 until trials) {
      val density = 0.2 + (trial % 6) * 0.1
      def sample(): Set[(Int, Int)] =
        (0 until n * n).filter(_ => rnd.nextDouble() < density)
          .map(i => (i / n, i % n)).toSet
      val cellsA = sample(); val cellsB = sample()
      if (cellsA.nonEmpty && cellsB.nonEmpty) {
        nonTrivial += 1
        val pa = gridPoly(cellsA)
        val pb = gridPoly(cellsB)
        val ops = Seq(
          ("inter", S2BooleanOps.intersection(pa, pb),
            (a: Boolean, b: Boolean) => a && b),
          ("union", S2BooleanOps.union(pa, pb),
            (a: Boolean, b: Boolean) => a || b),
          ("diff", S2BooleanOps.difference(pa, pb),
            (a: Boolean, b: Boolean) => a && !b),
          ("symm", S2BooleanOps.symmetricDifference(pa, pb),
            (a: Boolean, b: Boolean) => a ^ b))
        // the engine's polygons are PARITY-coded (holes stored CCW, small
        // interior), so the winding identity over raw loops is ODD ==
        // parity of memberships: over A++B rings, Odd == ia XOR ib
        val windRings = (pa.loops ++ pb.loops).map(_.vertices)
        val wind = S2Winding.toPolygon(windRings.toSeq, S2Winding.Odd)
        for (r <- -1 to n; c <- -1 to n; _ <- 0 until 2) {
          val p = V3.fromLatLngDegrees(
            r + 0.1 + rnd.nextDouble() * 0.8, c + 0.1 + rnd.nextDouble() * 0.8)
          val ia = cellsA.contains((r, c)); val ib = cellsB.contains((r, c))
          ops.foreach { case (name, poly, want) =>
            if (poly.contains(p) != want(ia, ib)) {
              System.err.println(s"SOAK FAIL trial $trial $name at ($r,$c) seed $seed")
              sys.exit(1)
            }
          }
          if (wind.contains(p) != (ia ^ ib)) {
            System.err.println(s"SOAK FAIL trial $trial winding at ($r,$c) seed $seed")
            sys.exit(1)
          }
        }
        // polyline clip: horizontal line through a random grid row;
        // CLOSED-model membership of strictly-interior piece midpoints
        val row = rnd.nextInt(n)
        val line = Array.tabulate(2 * n + 1)(i =>
          V3.fromLatLngDegrees(row + 0.5, i * 0.5))
        val pieces = PolylineBooleanOps.intersection(line, pa)
        pieces.foreach { piece =>
          var i = 1
          while (i < piece.length) {
            val mid = S2EdgeDistances.interpolate(piece(i - 1), piece(i), 0.5)
            // strictly-interior midpoints of clipped pieces must be in A
            // unless the piece rides a cell boundary (lng integer +- eps)
            val lng = V3.lngDegrees(mid)
            val frac = lng - math.floor(lng)
            if (frac > 0.05 && frac < 0.95) {
              val cc = math.floor(lng).toInt
              if (!cellsA.contains((row, cc))) {
                System.err.println(
                  s"SOAK FAIL trial $trial clip at row $row lng $lng seed $seed")
                sys.exit(1)
              }
            }
            i += 1
          }
        }
        // area identities
        val (ai, au) = (ops(0)._2.area, ops(1)._2.area)
        if (math.abs(ai + au - (pa.area + pb.area)) > 1e-8) {
          System.err.println(s"SOAK FAIL trial $trial area identity seed $seed")
          sys.exit(1)
        }
      }
      if ((trial + 1) % 50 == 0)
        println(s"  soak: ${trial + 1}/$trials trials, $nonTrivial non-trivial")
    }
    println(s"SOAK OK: $trials trials ($nonTrivial non-trivial), seed $seed, grid ${n}x$n")
  }
}
