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
