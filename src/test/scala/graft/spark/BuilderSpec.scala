package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators.Builder

/** Edge-soup polygon assembly (S2Builder polygon-layer semantics). */
class BuilderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ring(text: String): Array[V3] = S2TextFormat.parsePoints(text)
  private def edgesOf(vs: Array[V3]): Seq[(V3, V3)] =
    vs.indices.map(i => (vs(i), vs((i + 1) % vs.length)))

  test("shuffled edge soup reassembles the polygon") {
    val sq = ring("0:0, 0:10, 10:10, 10:0")
    val soup = new scala.util.Random(3).shuffle(edgesOf(sq))
    val poly = Builder.assemblePolygon(soup)
    assert(poly.numLoops == 1)
    assert(math.abs(poly.area - S2Loop(sq).area) < 1e-9) // leaf-snap displacement ~1e-10
    assert(poly.contains(V3.fromLatLngDegrees(5, 5)))
  }

  test("sibling pairs cancel; duplicate edges keep multiplicity balance") {
    val sq = ring("0:0, 0:10, 10:10, 10:0")
    val inner = ring("2:2, 2:8, 8:8, 8:2")
    // soup = square + inner ring + the inner ring REVERSED (they cancel)
    val soup = edgesOf(sq) ++ edgesOf(inner) ++ edgesOf(inner.reverse)
    val poly = Builder.assemblePolygon(soup)
    assert(poly.numLoops == 1)
    assert(math.abs(poly.area - S2Loop(sq).area) < 1e-9) // leaf-snap displacement ~1e-10
  }

  test("two disjoint loops assemble into a 2-loop polygon; shell+hole works") {
    val a = ring("0:0, 0:10, 10:10, 10:0")
    val b = ring("40:40, 40:50, 50:50, 50:40")
    val p1 = Builder.assemblePolygon(edgesOf(a) ++ edgesOf(b))
    assert(p1.numLoops == 2)
    // shell + hole (hole edges directed CW = interior-left of the shell
    // region); parity contains must punch the hole
    val hole = ring("3:3, 3:7, 7:7, 7:3")
    val p2 = Builder.assemblePolygon(edgesOf(a) ++ edgesOf(hole.reverse))
    assert(p2.numLoops == 2)
    assert(p2.contains(V3.fromLatLngDegrees(1, 1)))
    assert(!p2.contains(V3.fromLatLngDegrees(5, 5)))
  }

  test("snapping merges near-duplicate endpoints; open soup is rejected") {
    val nudge = 1e-9
    val soup = Seq(
      (V3.fromLatLngDegrees(0, 0), V3.fromLatLngDegrees(0, 10)),
      (V3.fromLatLngDegrees(nudge, 10), V3.fromLatLngDegrees(10, 10)), // off by 1e-9 deg
      (V3.fromLatLngDegrees(10, 10), V3.fromLatLngDegrees(10, 0)),
      (V3.fromLatLngDegrees(10, 0), V3.fromLatLngDegrees(0, 0)))
    // with identity snap the 1e-9-degree gap stays open
    assertThrows[IllegalArgumentException] {
      Builder.assemblePolygon(soup, snapLevel = -1)
    }
    // at level 20 the endpoints snap together and the loop closes
    val poly = Builder.assemblePolygon(soup, snapLevel = 20)
    assert(poly.numLoops == 1)
    assert(poly.contains(V3.fromLatLngDegrees(5, 5)))
  }

  test("unionDisjoint merges edge-sharing tiles into one region") {
    // 2x2 grid of squares sharing edges -> one 20x20 square
    def sq(lat0: Double, lng0: Double) = S2TextFormat.parsePolygon(
      s"$lat0:$lng0, $lat0:${lng0 + 10}, ${lat0 + 10}:${lng0 + 10}, ${lat0 + 10}:$lng0")
    val tiles = Seq(sq(0, 0), sq(0, 10), sq(10, 0), sq(10, 10))
    val merged = graft.operators.Builder.unionDisjoint(tiles)
    assert(merged.numLoops == 1)
    val whole = sq(0, 0).area + sq(0, 10).area + sq(10, 0).area + sq(10, 10).area
    assert(math.abs(merged.area - whole) < 1e-9)
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 1000) {
      val p = V3.fromLatLngDegrees(rnd.nextDouble() * 26 - 3, rnd.nextDouble() * 26 - 3)
      assert(merged.contains(p) == tiles.exists(_.contains(p)), s"at $p")
    }
    // polygon with hole next to a filler tile: hole boundary cancels
    val donut = new S2Polygon(Array(
      S2Loop(ring("0:0, 0:30, 30:30, 30:0")),
      S2Loop(ring("10:10, 10:20, 20:20, 20:10"))))
    val filler = S2TextFormat.parsePolygon("10:10, 10:20, 20:20, 20:10")
    val filled = graft.operators.Builder.unionDisjoint(Seq(donut, filler))
    assert(filled.numLoops == 1)
    assert(filled.contains(V3.fromLatLngDegrees(15, 15)))
  }

  test("mismatched boundary subdivision: long edge splits at facing vertices and cancels") {
    // A spans lng 0..20 above lat 0 with ONE bottom edge; B1/B2 below
    // share that boundary as TWO edges meeting at (0,10)
    val a = S2TextFormat.parsePolygon("0:0, 0:20, 10:20, 10:0")
    val b1 = S2TextFormat.parsePolygon("-10:0, -10:10, 0:10, 0:0")
    val b2 = S2TextFormat.parsePolygon("-10:10, -10:20, 0:20, 0:10")
    val merged = graft.operators.Builder.unionDisjoint(Seq(a, b1, b2))
    assert(merged.numLoops == 1)
    val whole = a.area + b1.area + b2.area
    assert(math.abs(merged.area - whole) / whole < 1e-6)
    val rnd = new scala.util.Random(41)
    for (_ <- 0 until 800) {
      val p = V3.fromLatLngDegrees(rnd.nextDouble() * 24 - 12, rnd.nextDouble() * 24 - 2)
      val want = a.contains(p) || b1.contains(p) || b2.contains(p)
      assert(merged.contains(p) == want, s"at $p")
    }
  }

  test("large tile grid (pruned split scan) merges within a time budget") {
    // 40x40 = 1600 squares -> 6400 edges x ~1700 vertices: above the
    // pruning threshold, so the covering-indexed candidate path runs
    def sq(lat0: Double, lng0: Double) = S2TextFormat.parsePolygon(
      s"$lat0:$lng0, $lat0:${lng0 + 1}, ${lat0 + 1}:${lng0 + 1}, ${lat0 + 1}:$lng0")
    val tiles = for (i <- 0 until 40; j <- 0 until 40) yield sq(i, j)
    val t0 = System.nanoTime()
    val merged = graft.operators.Builder.unionDisjoint(tiles)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 60, s"pruned assembly took $sec s")
    assert(merged.numLoops == 1)
    val whole = tiles.map(_.area).sum
    assert(math.abs(merged.area - whole) / whole < 1e-8)
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 300) {
      val p = V3.fromLatLngDegrees(rnd.nextDouble() * 44 - 2, rnd.nextDouble() * 44 - 2)
      assert(merged.contains(p) == tiles.exists(_.contains(p)), s"at $p")
    }
  }

  test("polyline layer: shuffled segment soup reassembles maximal chains") {
    import graft.operators.{Builder, SnapFunction}
    def v(lat: Double, lng: Double) = V3.fromLatLngDegrees(lat, lng)
    // two disjoint chains, segments shuffled
    val chainA = Seq(v(0, 0), v(0, 5), v(0, 10), v(1, 15))
    val chainB = Seq(v(40, 40), v(42, 42), v(44, 40))
    val soup = scala.util.Random.shuffle(
      chainA.sliding(2).map(w => (w(0), w(1))).toSeq ++
        chainB.sliding(2).map(w => (w(0), w(1))).toSeq)
    val out = Builder.assemblePolylines(soup)
    assert(out.size == 2)
    val asSets = out.map(_.toSeq).toSet
    assert(asSets == Set(chainA, chainB))

    // a closed ring of directed edges comes out as one closed walk
    val ring = Seq(v(10, 10), v(10, 20), v(20, 20), v(20, 10))
    val ringSoup = (ring :+ ring.head).sliding(2).map(w => (w(0), w(1))).toSeq
    val rw = Builder.assemblePolylines(scala.util.Random.shuffle(ringSoup))
    assert(rw.size == 1)
    assert(rw.head.head == rw.head.last) // closed
    assert(rw.head.length == 5)

    // branching: one head with two outgoing chains -> two maximal walks
    val y = Seq((v(0, 0), v(0, 5)), (v(0, 5), v(5, 10)), (v(0, 5), v(-5, 10)))
    val yw = Builder.assemblePolylines(y)
    assert(yw.size == 2)
    assert(yw.map(_.length).sum == 5) // 3 edges across 2 walks
  }

  test("IntLatLng snap merges jittered endpoints; simplify drops collinear vertices") {
    import graft.operators.{Builder, SnapFunction}
    def v(lat: Double, lng: Double) = V3.fromLatLngDegrees(lat, lng)
    // endpoints jittered by ~1e-7 deg: E5 grid snap makes them identical
    val soup = Seq(
      (v(0, 0), v(0.0000001, 5.0000001)),
      (v(-0.0000002, 4.9999999), v(0.0000001, 10.0)))
    val out = Builder.assemblePolylines(soup, SnapFunction.IntLatLngSnap(5))
    assert(out.size == 1) // merged into one chain
    assert(out.head.length == 3)
    // simplify: exactly-collinear equator chain collapses to endpoints
    val line = Seq((v(0, 0), v(0, 3)), (v(0, 3), v(0, 7)), (v(0, 7), v(0, 10)))
    val simp = Builder.assemblePolylines(line, SnapFunction.Identity,
      simplifyTolerance = 1e-9)
    assert(simp.size == 1)
    assert(simp.head.length == 2)
    assert(V3.lngDegrees(simp.head.last) == 10.0)

    // assemblePolygon accepts the IntLatLng snap function too
    val sq = Seq((v(0, 0), v(0, 10)), (v(0, 10), v(10, 10)),
      (v(10.0000001, 9.9999999), v(10, 0)), (v(10, 0), v(0.0000001, -0.0000001)))
    val poly = Builder.assemblePolygon(sq, SnapFunction.IntLatLngSnap(5))
    assert(poly.numLoops == 1)
    assert(poly.contains(v(5, 5)))
  }

  test("randomized: unionDisjoint of arbitrary grid-cell sets is pointwise exact") {
    // every configuration occurs across trials: corner pinches (diagonal
    // cells), holes, pinched holes, nested pockets — the simple-loop
    // stitcher guarantee is load-bearing here
    val rnd = new scala.util.Random(59)
    def sq(r: Int, c: Int) = S2TextFormat.parsePolygon(
      s"$r:$c, $r:${c + 1}, ${r + 1}:${c + 1}, ${r + 1}:$c")
    for (trial <- 0 until 20) {
      val density = 0.2 + (trial % 6) * 0.12
      val cells = (0 until 36).filter(_ => rnd.nextDouble() < density)
        .map(i => (i / 6, i % 6)).toSet
      if (cells.nonEmpty) {
        val merged = graft.operators.Builder.unionDisjoint(
          cells.toSeq.map { case (r, c) => sq(r, c) })
        for (r <- -1 to 6; c <- -1 to 6) {
          val p = V3.fromLatLngDegrees(
            r + 0.2 + rnd.nextDouble() * 0.6, c + 0.2 + rnd.nextDouble() * 0.6)
          assert(merged.contains(p) == cells.contains((r, c)),
            s"trial $trial at ($r,$c)")
        }
        val whole = cells.toSeq.map { case (r, c) => sq(r, c).area }.sum
        assert(math.abs(merged.area - whole) / whole < 1e-7, s"trial $trial area")
        // every output loop is simple (no repeated vertices)
        merged.loops.foreach { l =>
          assert(l.vertices.distinct.length == l.numVertices,
            s"trial $trial non-simple loop")
        }
      }
    }
  }

  test("randomized: two-layer stack builds are pointwise exact and vertex-aligned") {
    import Builder.{Layer, LayerResult}
    // split a random grid-cell set into TWO polygon layers plus a chain
    // layer crossing the grid; the stack must (a) reproduce each layer's
    // own region pointwise, (b) carry the other layer's boundary sites on
    // shared boundaries, (c) keep every output loop simple
    val rnd = new scala.util.Random(83)
    def sq(r: Int, c: Int) = S2TextFormat.parsePolygon(
      s"$r:$c, $r:${c + 1}, ${r + 1}:${c + 1}, ${r + 1}:$c")
    def interiorEdges(polys: Seq[S2Polygon]): Seq[(V3, V3)] =
      for {
        p <- polys; (l, li) <- p.loops.zipWithIndex
        i <- 0 until l.numVertices
      } yield {
        if (p.loopSigns(li) > 0) (l.vertex(i), l.vertex(i + 1))
        else (l.vertex(i + 1), l.vertex(i))
      }
    for (trial <- 0 until 10) {
      val cells = (0 until 36).filter(_ => rnd.nextDouble() < 0.45)
        .map(i => (i / 6, i % 6)).toSet
      val (aCells, bCells) = cells.partition(_ => rnd.nextBoolean())
      if (aCells.nonEmpty && bCells.nonEmpty) {
        val chain = Array(V3.fromLatLngDegrees(-1, -1), V3.fromLatLngDegrees(3, 3),
          V3.fromLatLngDegrees(7, 7))
        val out = Builder.buildLayers(Seq(
          Layer.Polygon(interiorEdges(aCells.toSeq.map { case (r, c) => sq(r, c) })),
          Layer.Polygon(interiorEdges(bCells.toSeq.map { case (r, c) => sq(r, c) })),
          Layer.Polylines(chain.indices.dropRight(1).map(i => (chain(i), chain(i + 1))))))
        val LayerResult.PolygonResult(pa) = out(0)
        val LayerResult.PolygonResult(pb) = out(1)
        // pointwise: each layer's polygon is ITS cell set, not the union
        for (r <- -1 to 6; c <- -1 to 6) {
          val p = V3.fromLatLngDegrees(
            r + 0.2 + rnd.nextDouble() * 0.6, c + 0.2 + rnd.nextDouble() * 0.6)
          assert(pa.contains(p) == aCells.contains((r, c)), s"trial $trial A ($r,$c)")
          assert(pb.contains(p) == bCells.contains((r, c)), s"trial $trial B ($r,$c)")
        }
        // simple loops in both layers
        (pa.loops ++ pb.loops).foreach { l =>
          assert(l.vertices.distinct.length == l.numVertices,
            s"trial $trial non-simple loop")
        }
        // the stack invariant: NO output edge of any layer passes through
        // a site (any layer's vertex) without having a vertex there —
        // that's exactly what the shared-site splitting guarantees
        val sites = ((aCells ++ bCells).toSeq
          .flatMap { case (r, c) => sq(r, c).loops.toSeq.flatMap(_.vertices.toSeq) }
          ++ chain.toSeq).distinct
        val tol = 4 * graft.operators.SnapFunction.Identity.snapRadius
        val tolChord2 = S1ChordAngle.fromRadians(tol)
        val outEdges = (pa.loops ++ pb.loops).flatMap { l =>
          (0 until l.numVertices).map(i => (l.vertex(i), l.vertex(i + 1)))
        }
        for ((u, v) <- outEdges; w <- sites if w != u && w != v) {
          val d2 = S2EdgeDistances.interiorDistance2(
            w, u, v, (w - u).norm2, (w - v).norm2)
          assert(d2 < 0 || d2 > tolChord2,
            s"trial $trial: output edge passes through site without splitting")
        }
      }
    }
  }

  test("point layer: snap + merge duplicates, deterministic order") {
    import graft.operators.{Builder, SnapFunction}
    def v(lat: Double, lng: Double) = V3.fromLatLngDegrees(lat, lng)
    val pts = Seq(v(10, 10), v(10.0000001, 9.9999999), v(-5, 20), v(10, 10))
    val out = Builder.assemblePoints(pts, SnapFunction.IntLatLngSnap(5))
    assert(out.size == 2) // jittered + exact duplicates merge
    assert(out == Builder.assemblePoints(pts.reverse, SnapFunction.IntLatLngSnap(5)))
  }

  test("layer stack: disjoint layers match single-layer assembly") {
    import Builder.{Layer, LayerResult}
    val sq = ring("0:0, 0:10, 10:10, 10:0")
    val chain = ring("40:40, 40:45, 45:45")
    val chainEdges = chain.indices.dropRight(1).map(i => (chain(i), chain(i + 1)))
    val pts = ring("60:60, 61:61").toSeq
    val out = Builder.buildLayers(Seq(
      Layer.Polygon(edgesOf(sq)), Layer.Polylines(chainEdges), Layer.Points(pts)))
    val LayerResult.PolygonResult(p) = out(0)
    val LayerResult.PolylinesResult(cs) = out(1)
    val LayerResult.PointsResult(ps) = out(2)
    // compare against the IDENTITY-snap single-layer build (the stack's
    // default); level-30 default snap would differ by the leaf displacement
    assert(p.area ==
      Builder.assemblePolygon(edgesOf(sq), graft.operators.SnapFunction.Identity).area)
    assert(cs.map(_.toSeq) == Builder.assemblePolylines(chainEdges).map(_.toSeq))
    assert(ps == Builder.assemblePoints(pts))
  }

  test("layer stack: polyline splits at a polygon layer's boundary vertex") {
    import Builder.{Layer, LayerResult}
    val sq = ring("0:0, 0:10, 10:10, 10:0")
    // a polyline whose single edge passes exactly through the square's
    // (10,10) corner — in a shared-site build it must acquire that vertex
    val corner = V3.fromLatLngDegrees(10, 10)
    val a = V3.fromLatLngDegrees(10, 5)
    // extend the great circle a->corner past the corner
    val b = S2EdgeDistances.interpolate(a, corner, 1.6)
    val out = Builder.buildLayers(Seq(
      Layer.Polygon(edgesOf(sq)), Layer.Polylines(Seq((a, b)))))
    val LayerResult.PolylinesResult(cs) = out(1)
    assert(cs.length == 1)
    assert(cs.head.length == 3) // a, corner, b
    assert(cs.head(1) == corner)
    // single-layer assembly does NOT split (no shared site set)
    assert(Builder.assemblePolylines(Seq((a, b))).head.length == 2)
  }

  test("layer stack: two polygon layers vertex-align along a shared boundary") {
    import Builder.{Layer, LayerResult}
    // left tile's right edge digitized as ONE segment; right tile's left
    // edge digitized as TWO segments with a midpoint vertex. In a stack
    // build both layers split at the midpoint site → identical vertex
    // sets along the shared boundary.
    val left = ring("0:0, 0:10, 10:10, 10:0")   // right edge 0:10 -> 10:10
    val mid = V3.fromLatLngDegrees(5, 10)
    val right = Seq(
      (V3.fromLatLngDegrees(0, 10), mid), (mid, V3.fromLatLngDegrees(10, 10)),
      (V3.fromLatLngDegrees(10, 10), V3.fromLatLngDegrees(10, 20)),
      (V3.fromLatLngDegrees(10, 20), V3.fromLatLngDegrees(0, 20)),
      (V3.fromLatLngDegrees(0, 20), V3.fromLatLngDegrees(0, 10)))
    val out = Builder.buildLayers(Seq(
      Layer.Polygon(edgesOf(left)), Layer.Polygon(right)))
    val LayerResult.PolygonResult(pl) = out(0)
    val LayerResult.PolygonResult(pr) = out(1)
    // lng=10 is a meridian (a great circle), so mid lies EXACTLY on the
    // left tile's one-segment right edge: the stack splits it there
    assert(pl.loops.head.vertices.contains(mid))
    assert(pr.loops.head.vertices.contains(mid))
    // single-layer assembly of the left tile has no reason to carry mid
    assert(!Builder.assemblePolygon(edgesOf(left)).loops.head.vertices.contains(mid))
  }

  test("layer stack: simplify keeps sites injected by other layers") {
    import Builder.{Layer, LayerResult}
    // chain along the equator with redundant collinear vertices
    val vs = Array(0, 2, 4, 5, 6, 8, 10).map(lng => V3.fromLatLngDegrees(0, lng))
    val edges = vs.indices.dropRight(1).map(i => (vs(i), vs(i + 1)))
    // a Points layer contributes the interior vertex at lng=6
    val site = V3.fromLatLngDegrees(0, 6)
    val out = Builder.buildLayers(Seq(
      Layer.Polylines(edges, simplifyTolerance = 1e-3), Layer.Points(Seq(site))))
    val LayerResult.PolylinesResult(cs) = out(0)
    assert(cs.length == 1)
    // collinear interior vertices dropped EXCEPT the cross-layer site
    assert(cs.head.toSeq == Seq(vs.head, site, vs.last))
    // without the Points layer the whole interior simplifies away
    val solo = Builder.buildLayers(Seq(Layer.Polylines(edges, 1e-3)))
    val LayerResult.PolylinesResult(cs2) = solo(0)
    assert(cs2.head.toSeq == Seq(vs.head, vs.last))
  }

  test("distributed per-group polyline assembly") {
    import spark.implicits._
    import graft.operators.{Builder, SnapFunction}
    val rows = Seq(
      ("t1", 0.0, 0.0, 0.0, 5.0), ("t1", 0.0, 5.0, 0.0, 10.0),
      ("t2", 40.0, 40.0, 42.0, 42.0)).toDF("g", "la", "na", "lb", "nb")
    val out = Builder.assemblePolylinesDf(rows, "g", "la", "na", "lb", "nb")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(out.count(_._1 == "t1") == 1)
    assert(out.count(_._2 == 0) == 2)
    val t1 = out.find(_._1 == "t1").get._3
    assert(t1.split(", ").length == 3)
  }

  test("distributed per-group assembly") {
    import spark.implicits._
    val sq = ring("0:0, 0:10, 10:10, 10:0")
    val tri = ring("40:40, 40:45, 45:40")
    def rows(g: String, vs: Array[V3]) = edgesOf(vs).map { case (u, v) =>
      (g, V3.latDegrees(u), V3.lngDegrees(u), V3.latDegrees(v), V3.lngDegrees(v)) }
    val df = (rows("sq", sq) ++ rows("tri", tri) ++
      Seq(("bad", 0.0, 0.0, 1.0, 1.0))) // open chain
      .toDF("g", "lat_a", "lng_a", "lat_b", "lng_b")
    val out = Builder.assemblePolygons(df, "g", "lat_a", "lng_a", "lat_b", "lng_b")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("bad").isEmpty)
    val sqPoly = S2TextFormat.parsePolygon(out("sq").get)
    assert(math.abs(sqPoly.area - S2Loop(sq).area) < 1e-9)
    val triPoly = S2TextFormat.parsePolygon(out("tri").get)
    assert(triPoly.contains(V3.fromLatLngDegrees(41.5, 41.5)))
  }
}
