package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators.{Projections, S2Joins}
import graft.sources.DocSource

class ProjectionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("mercator round trip and reference tile values") {
    import spark.implicits._
    val pts = Seq((0.0, 0.0), (48.8566, 2.3522), (-33.86, 151.21), (85.0, 179.99),
      (-85.0, -179.99))
    val df = pts.toDF("lat", "lng")
      .withColumn("mx", Projections.mercatorX($"lng"))
      .withColumn("my", Projections.mercatorY($"lat"))
      .withColumn("lat2", Projections.unMercatorLat($"my"))
      .withColumn("lng2", Projections.unMercatorLng($"mx"))
    df.collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("lat") - r.getAs[Double]("lat2")) < 1e-9)
      assert(math.abs(r.getAs[Double]("lng") - r.getAs[Double]("lng2")) < 1e-9)
    }
    // canonical web-mercator tiles (z=4): Paris -> (8,5), Sydney -> (14,9),
    // null island -> (8,8)
    val tiles = pts.toDF("lat", "lng").select(
      Projections.tileX($"lng", 4).as("tx"), Projections.tileY($"lat", 4).as("ty"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(tiles(0) == (8L, 8L))
    assert(tiles(1) == (8L, 5L))
    assert(tiles(2) == (14L, 9L))
  }

  test("tile covering inverts tile assignment: every doc's tile covering contains its cell") {
    val docs = S2Joins.withCellId(DocSource.docs(spark, 800L),
      col("lat"), col("lng"))
      .select(col("cell_id"),
        Projections.tileX(col("lng"), 3).as("tx"),
        Projections.tileY(col("lat"), 3).as("ty"))
      .collect()
    docs.foreach { r =>
      val cov = Projections.tileCovering(3, r.getLong(1), r.getLong(2))
      assert(S2CellUnion.intersectsCellId(cov, r.getLong(0)),
        s"tile (${r.getLong(1)},${r.getLong(2)}) covering misses doc cell")
    }
  }

  test("tessellation: projected chain stays within tolerance of the geodesic") {
    val a = V3.fromLatLngDegrees(10, -120)
    val b = V3.fromLatLngDegrees(50, 40) // long geodesic, strong mercator curvature
    val tol = math.toRadians(0.01)
    val chain = Projections.tessellateProjected(a, b, tol)
    assert(chain.length > 2) // must have subdivided
    // unproject chain and check each segment midpoint error vs the geodesic
    val pts = chain.map { case (x, y) =>
      V3.fromLatLngRadians(math.atan(math.sinh(y)), x) }
    assert((pts.head - a).norm < 1e-12 && (pts.last - b).norm < 1e-12)
    for (i <- 0 until pts.length - 1) {
      val mid = S2EdgeDistances.interpolate(pts(i), pts(i + 1), 0.5)
      val d = math.sqrt(S2EdgeDistances.distance2(mid, a, b))
      assert(S1ChordAngle.toRadians(S2EdgeDistances.distance2(mid, a, b)) < 4 * tol,
        s"segment $i midpoint too far: $d")
    }
    // round trip: unprojected tessellation of the projected segment
    val back = Projections.tessellateUnprojected(
      chain.head, chain.last, tol)
    assert(back.length > 2)
  }

  test("polygonIntersectsJoin matches pairwise exact polygon intersection") {
    import spark.implicits._
    def box(lat: Double, lng: Double, d: Double) =
      f"$lat%.3f:$lng%.3f, $lat%.3f:${lng + d}%.3f, ${lat + d}%.3f:${lng + d}%.3f, ${lat + d}%.3f:$lng%.3f"
    val lefts = (0 until 12).map(i => (i, box(i * 10.0 - 60, i * 25.0 - 150, 12)))
    val rights = (0 until 10).map(j => (j, box(j * 11.0 - 55, j * 28.0 - 140, 9)))
    val got = graft.operators.RegionJoins.polygonIntersectsJoin(
      lefts.toDF("id", "poly"), "id", "poly",
      rights.toDF("id", "poly"), "id", "poly")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val want = (for {
      (li, lp) <- lefts
      (rj, rp) <- rights
      if S2TextFormat.parsePolygon(lp).intersectsPolygon(S2TextFormat.parsePolygon(rp))
    } yield (li, rj)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }
}
