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
}
