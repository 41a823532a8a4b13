package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators._

class RegionJoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val coverer = new S2RegionCoverer(16)

  def capUnion(lat: Double, lng: Double, r: Double): Array[Long] =
    coverer.getCovering(S2Cap.fromCenterAngle(V3.fromLatLngDegrees(lat, lng), r))

  test("region intersectsJoin matches pairwise cell-union intersection") {
    import spark.implicits._
    val lefts = (0 until 30).map { i =>
      (i, capUnion(i * 6.0 - 85, i * 11.0 - 170, 0.05)) }
    val rights = (0 until 25).map { j =>
      (j, capUnion(j * 7.0 - 80, j * 13.0 - 160, 0.07)) }
    val got = RegionJoins.intersectsJoin(
      lefts.toDF("id", "cells"), "id", "cells",
      rights.toDF("id", "cells"), "id", "cells")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val want = (for {
      (li, lc) <- lefts
      (rj, rc) <- rights
      if S2CellUnion.intersectsUnion(lc, rc)
    } yield (li, rj)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("edgeCrossingJoin matches brute-force crossingSign over random segments") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val segs = (0 until 120).map { i =>
      // mixed lengths in a shared window: local streets + long transit arcs
      val la = rnd.nextDouble() * 50 - 25
      val ln = rnd.nextDouble() * 50 - 25
      val span = if (i % 4 == 0) 45 else 12
      (i, la, ln,
        math.max(-89.0, math.min(89.0, la + rnd.nextDouble() * span - span / 2)),
        ln + rnd.nextDouble() * span - span / 2)
    }
    val df = segs.toDF("sid", "lat1", "lng1", "lat2", "lng2")
    val got = RegionJoins.edgeCrossingJoin(df, "sid", df, "sid")
      .where(col("id_a") < col("id_b"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val vs = segs.map { case (i, a, b, c, d) =>
      (i, V3.fromLatLngDegrees(a, b), V3.fromLatLngDegrees(c, d)) }
    val want = (for {
      (i, a1, a2) <- vs; (j, b1, b2) <- vs if i < j
      if S2EdgeCrossings.crossingSign(a1, a2, b1, b2) > 0
    } yield (i, j)).toSet
    assert(got == want)
    assert(want.size > 20, s"want ${want.size} crossings") // non-trivial
  }

  test("cell-union set algebra columns match kernels") {
    import spark.implicits._
    val a = capUnion(10, 20, 0.3)
    val b = capUnion(12, 22, 0.3)
    val row = Seq((a, b)).toDF("a", "b")
      .select(
        RegionJoins.cellUnion($"a", $"b").as("u"),
        RegionJoins.cellIntersection($"a", $"b").as("i"),
        RegionJoins.cellDifference($"a", $"b").as("d"),
        RegionJoins.leafCellsCovered($"a").as("leaves"),
        RegionJoins.unionExactArea($"a").as("area"))
      .head()
    assert(row.getSeq[Long](0).toArray.sameElements(S2CellUnion.union(a, b)))
    assert(row.getSeq[Long](1).toArray.sameElements(S2CellUnion.intersection(a, b)))
    assert(row.getSeq[Long](2).toArray.sameElements(S2CellUnion.difference(a, b)))
    assert(row.getLong(3) == S2CellUnion.leafCellsCovered(a))
    assert(math.abs(row.getDouble(4) - S2CellUnion.exactArea(a)) < 1e-15)
    // algebra laws on this instance: |A| = |A∩B| + |A\B| in leaf cells
    assert(S2CellUnion.leafCellsCovered(a) ==
      S2CellUnion.leafCellsCovered(S2CellUnion.intersection(a, b)) +
      S2CellUnion.leafCellsCovered(S2CellUnion.difference(a, b)))
  }

  test("directed hausdorff: zero to itself, positive to distant chain, asymmetric") {
    import spark.implicits._
    val aLat = Seq(0.0, 5.0, 10.0); val aLng = Seq(0.0, 5.0, 10.0)
    val bLat = Seq(0.0, 5.0, 10.0, 40.0); val bLng = Seq(0.0, 5.0, 10.0, 40.0)
    val df = Seq((aLat, aLng, bLat, bLng)).toDF("alat", "alng", "blat", "blng")
    val dAB = df.select(RegionJoins.directedHausdorffUdf(
      $"alat", $"alng", $"blat", $"blng")).head().getDouble(0)
    val dBA = df.select(RegionJoins.directedHausdorffUdf(
      $"blat", $"blng", $"alat", $"alng")).head().getDouble(0)
    assert(dAB < 1e-20)   // A's vertices all on B's chain
    assert(dBA > 0.1)     // B's far vertex (40,40) is far from A
  }

  test("levelForMeters and rangeTiling behave like the reference metrics") {
    assert(S2.EarthRadiusMeters == 6371010.0)
    val l1km = graft.functions.S2.levelForMaxMeters(1000)
    // reference kMinWidth table: level 13 cells are ~1.2km wide min
    assert(l1km >= 12 && l1km <= 15)
    // range tiling of one face: exactly that face cell
    val f2 = S2CellId.fromFace(2)
    val tiles = graft.functions.S2.rangeTiling(
      S2CellId.rangeMin(f2), S2CellId.fromFace(3)) // limit cell = boundary
    assert(S2CellUnion.normalize(tiles).sameElements(Array(f2)))
    // tiling covers the range exactly: sum of leaves matches
    val a = S2CellId.fromLatLngDegrees(10, 20)
    val bCell = S2CellId.fromLatLngDegrees(10.4, 20.4)
    val (lo, hi) = if (S2CellId.uLt(a, bCell)) (a, bCell) else (bCell, a)
    val t2 = graft.functions.S2.rangeTiling(lo, hi)
    val leaves = t2.map(c => S2CellId.rangeMax(c) / 2 - S2CellId.rangeMin(c) / 2 + 1).sum
    assert(leaves == (hi - lo) / 2) // [lo, hi): leaf ids step by 2
  }

  object S2 { val EarthRadiusMeters = graft.functions.S2.EarthRadiusMeters }

  test("overlapFractionsJoin matches the pairwise kernel and never goes cartesian") {
    import spark.implicits._
    // two grids of 1.2deg quads, offset so some pairs overlap partially,
    // some fully contain, most are disjoint
    def quadText(lat: Double, lng: Double, h: Double): String = {
      val p = new S2Polygon(Array(S2Loop(Array(
        V3.fromLatLngDegrees(lat - h, lng - h), V3.fromLatLngDegrees(lat - h, lng + h),
        V3.fromLatLngDegrees(lat + h, lng + h), V3.fromLatLngDegrees(lat + h, lng - h)))))
      S2TextFormat.polygonToString(p)
    }
    val lefts = (0 until 24).map(i => (i, quadText(i % 6 * 5.0, i / 6 * 5.0, 0.6)))
    val rights = (0 until 24).map(j =>
      (j, quadText(j % 6 * 5.0 + 0.5, j / 6 * 5.0 + 0.3, if (j % 5 == 0) 2.0 else 0.6)))
    val joined = RegionJoins.overlapFractionsJoin(
      lefts.toDF("id", "poly"), "id", "poly",
      rights.toDF("id", "poly"), "id", "poly")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"overlap join must stay an equi-join:\n$plan")
    val got = joined.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    val want = (for {
      (li, lp) <- lefts; (rj, rp) <- rights
      fr = S2BooleanOps.overlapFractions(
        graft.functions.PolyCache.get(lp), graft.functions.PolyCache.get(rp))
      if fr._1 > 0
    } yield ((li, rj), fr)).toMap
    assert(got.keySet == want.keySet)
    for ((k, (fa, fb)) <- want) {
      assert(got(k)._1 == fa && got(k)._2 == fb, s"pair $k: ${got(k)} vs ($fa,$fb)")
    }
    // the fixture must actually exercise all three regimes
    assert(want.nonEmpty)
    assert(want.values.exists(_._1 == 1.0),
      "no contained pair in fixture (left inside an enlarged right quad)")
    assert(want.values.exists(f => f._1 > 0 && f._1 < 1 && f._2 < 1),
      "no partial pair in fixture")
  }
}
