package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators._

/** Nesting query (S2ShapeNestingQuery semantics) + snap-rounding repair
  * (S2CellIdSnapFunction semantics). */
class NestingSnapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ring(text: String): Array[V3] = S2TextFormat.parsePoints(text)

  test("shapeNesting: shell / hole / island-in-lake hierarchy") {
    // shell > hole > island — written with scrambled orientations; the
    // query must classify regardless of input winding
    val shell = ring("0:0, 0:20, 20:20, 20:0")
    val hole = ring("5:5, 5:15, 15:15, 15:5").reverse // arbitrary winding
    val island = ring("8:8, 8:12, 12:12, 12:8")
    val rel = Nesting.shapeNesting(Seq(shell, hole, island))
    assert(rel(0).isShell && rel(0).depth == 0 && rel(0).parent == -1)
    assert(!rel(1).isShell && rel(1).depth == 1 && rel(1).parent == 0)
    assert(rel(2).isShell && rel(2).depth == 2)
    assert(rel(0).holes.sameElements(Array(1)))
    assert(rel(1).holes.isEmpty)
  }

  test("shapeNesting: disjoint shells have no relations") {
    val a = ring("0:0, 0:5, 5:5, 5:0")
    val b = ring("40:40, 40:45, 45:45, 45:40")
    val rel = Nesting.shapeNesting(Seq(a, b))
    assert(rel.forall(r => r.isShell && r.parent == -1 && r.holes.isEmpty))
  }

  test("assemblePolygon yields correct parity containment for undeclared nesting") {
    val shell = ring("0:0, 0:20, 20:20, 20:0").reverse // wrong winding on purpose
    val hole = ring("5:5, 5:15, 15:15, 15:5")
    val (poly, rel) = Nesting.assemblePolygon(Seq(shell, hole))
    assert(rel(0).isShell && !rel(1).isShell)
    assert(poly.contains(V3.fromLatLngDegrees(2, 2)))   // in shell, not hole
    assert(!poly.contains(V3.fromLatLngDegrees(10, 10))) // in hole
    assert(!poly.contains(V3.fromLatLngDegrees(30, 30))) // outside
    assert(math.abs(poly.area -
      (S2Loop(ring("0:0, 0:20, 20:20, 20:0")).area -
        S2Loop(ring("5:5, 5:15, 15:15, 15:5")).area)) < 1e-12)
  }

  test("snapPoint: cell-center snap within MinSnapRadiusForLevel, idempotent") {
    val rnd = new scala.util.Random(11)
    for (level <- Seq(8, 14, 20, 30); _ <- 0 until 50) {
      val p = V3.fromLatLngDegrees(rnd.nextDouble() * 170 - 85,
        rnd.nextDouble() * 360 - 180)
      val s = Snap.snapPoint(p, level)
      assert(p.angle(s) <= Snap.minSnapRadiusForLevel(level),
        s"level $level moved too far")
      assert(Snap.snapPoint(s, level) == s, "snap must be idempotent")
    }
  }

  test("levelForMaxSnapRadius inverts minSnapRadiusForLevel") {
    for (level <- 1 to 29) {
      val r = Snap.minSnapRadiusForLevel(level)
      assert(Snap.levelForMaxSnapRadius(r) == level)
    }
  }

  test("snap repair: duplicate vertices collapse, polygon becomes valid") {
    // duplicate vertex (0:10 twice) -> invalid; snapping collapses it
    val dirty = "0:0, 0:10, 0:10, 10:10, 10:0"
    assert(Validation.validatePolygonText(dirty).contains("DUPLICATE_ADJACENT_VERTICES") ||
      Validation.validatePolygonText(dirty).contains("DUPLICATE_VERTICES"))
    val repaired = Snap.repairPolygonText(dirty, level = 20)
    assert(repaired.isDefined)
    assert(Validation.validatePolygonText(repaired.get).isEmpty)
    // area approximately preserved
    val a0 = S2TextFormat.parsePolygon("0:0, 0:10, 10:10, 10:0").area
    val a1 = S2TextFormat.parsePolygon(repaired.get).area
    assert(math.abs(a0 - a1) / a0 < 1e-4)
  }

  test("snap repair: near-duplicate vertices merge at coarse level; degenerate loops drop") {
    // two vertices 1e-9 deg apart merge at level 20
    val nearDup = "0:0, 0:10, 1e-9:10, 10:10, 10:0"
    val r = Snap.repairPolygonText("0:0, 0:10, 0.000000001:10, 10:10, 10:0", 20)
    assert(r.isDefined && Validation.validatePolygonText(r.get).isEmpty)
    // a sliver narrower than the snap cell collapses to nothing
    val sliver = "0:0, 0:1e-12, 1e-12:1e-12"
    assert(Snap.snapPolygon(S2TextFormat.parsePolygon(sliver), 10).isEmpty)
  }

  test("withRepair pipeline: valid rows pass through, bowties stay null, dup-vertex rows repair") {
    import spark.implicits._
    val rows = Seq(
      ("ok", "0:0, 0:10, 10:10, 10:0"),
      ("dup", "0:0, 0:10, 0:10, 10:10, 10:0"),
      ("bowtie", "0:0, 10:10, 0:10, 10:0")).toDF("id", "poly")
    val out = Snap.withRepair(rows, "poly").collect()
      .map(r => r.getString(0) -> (r.getAs[String]("geom_error"),
        r.getAs[String]("repaired_poly"))).toMap
    assert(out("ok")._1 == null && out("ok")._2 == "0:0, 0:10, 10:10, 10:0")
    assert(out("dup")._1 != null && out("dup")._2 != null)
    assert(Validation.validatePolygonText(out("dup")._2).isEmpty)
    assert(out("bowtie")._1 == "SELF_INTERSECTION" && out("bowtie")._2 == null)
  }
}
