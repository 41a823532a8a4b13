package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators.GeometryOps

/** Column surface of the constructive-geometry kernels, including the
  * SQL-registered names. */
class GeometryOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("boolean/buffer/area/hausdorff columns round-trip through polygon text") {
    import spark.implicits._
    val df = Seq(
      ("0:0, 0:10, 10:10, 10:0", "5:5, 5:15, 15:15, 15:5"),
      ("0:0, 0:10, 10:10, 10:0", "40:40, 40:50, 50:50, 50:40")
    ).toDF("a", "b")
    val out = df.select(
      GeometryOps.polygonArea(GeometryOps.polygonUnion($"a", $"b")).as("u"),
      GeometryOps.polygonArea(GeometryOps.polygonIntersection($"a", $"b")).as("i"),
      GeometryOps.polygonArea(GeometryOps.polygonDifference($"a", $"b")).as("d"),
      GeometryOps.polygonArea($"a").as("aa"),
      GeometryOps.polygonArea($"b").as("ab"),
      GeometryOps.polygonHausdorff($"a", $"b").as("h")
    ).collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(0) + r.getDouble(1) - (r.getDouble(3) + r.getDouble(4))) < 1e-9)
      assert(math.abs(r.getDouble(2) - (r.getDouble(3) - r.getDouble(1))) < 1e-9)
      assert(r.getDouble(5) > 0)
    }
    // buffered polygon grows
    val grown = df.select(
      GeometryOps.polygonArea(GeometryOps.polygonBuffer($"a", lit(0.01))).as("g"),
      GeometryOps.polygonArea($"a").as("aa")).head()
    assert(grown.getDouble(0) > grown.getDouble(1))
  }

  test("round-3 geometry columns: winding polygon, polyline clip, at-distance") {
    import spark.implicits._
    val df = Seq((
      "0:0, 0:10, 10:10, 10:0; 5:5, 5:15, 15:15, 15:5", // crossing rings
      "5:-5, 5:20",                                     // crossing polyline
      "0:0, 0:10, 10:10, 10:0"                          // polygon
    )).toDF("rings", "line", "poly")
    val out = df.select(
      GeometryOps.polygonArea(
        GeometryOps.windingPolygon($"rings", lit("POSITIVE"))).as("wa"),
      GeometryOps.polylineClip($"line", $"poly", lit("INTERSECTION"),
        lit("CLOSED")).as("pieces"),
      GeometryOps.polylineAtDistance($"line", lit(math.toRadians(10))).as("at")
    ).head()
    // POSITIVE over crossing rings = union area
    val pa = S2TextFormat.parsePolygon("0:0, 0:10, 10:10, 10:0")
    val pb = S2TextFormat.parsePolygon("5:5, 5:15, 15:15, 15:5")
    assert(math.abs(out.getDouble(0) - S2BooleanOps.union(pa, pb).area) < 1e-12)
    // one clipped piece crossing the polygon
    val pieces = out.getSeq[String](1)
    assert(pieces.length == 1)
    assert(S2TextFormat.parsePoints(pieces.head).length >= 2)
    // at-distance lands 10 deg along the lat-5 arc
    val at = out.getStruct(2)
    assert(math.abs(at.getDouble(3) - math.toRadians(10)) < 1e-12)
    assert(at.getInt(2) == 0)
  }

  test("SQL-registered geometry functions work end to end") {
    GeometryOps.registerAll(spark)
    val r = spark.sql("""
      SELECT s2_polygon_area(s2_polygon_intersection(
               '0:0, 0:10, 10:10, 10:0', '5:5, 5:15, 15:15, 15:5')) AS ai,
             s2_winding_contains('0:0, 0:10, 10:10, 10:0', 'POSITIVE', 5.0, 5.0) AS w1,
             s2_winding_contains('0:0, 0:10, 10:10, 10:0', 'POSITIVE', 50.0, 50.0) AS w0
    """).head()
    assert(r.getDouble(0) > 0)
    assert(r.getBoolean(1) && !r.getBoolean(2))
  }
}
