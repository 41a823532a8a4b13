package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core._

/** Planar projections and raster-tile assignment — the raster↔vector
  * bridge (reference S2 Projection/MercatorProjection,
  * /root/reference/src/s2/s2projections.h:37-120: pluggable
  * Project/Unproject planar maps; web-mercator tiling is the standard
  * raster grid over the Mercator projection).
  *
  * All tile math is pure Column arithmetic (codegen, engine-portable):
  *   x01 = (lng + 180) / 360
  *   y01 = (1 - ln(tan(lat) + 1/cos(lat)) / π) / 2     (lat in radians)
  *   tile = (floor(x01·2^z), floor(y01·2^z)) clamped to [0, 2^z)
  */
object Projections {

  /** Mercator planar coordinates (x = lng rad, y = ln tan(π/4 + lat/2)),
    * the reference MercatorProjection convention. */
  def mercatorX(lngDeg: Column): Column = radians(lngDeg)
  def mercatorY(latDeg: Column): Column = {
    val latR = radians(latDeg)
    log(tan(latR) + lit(1.0) / cos(latR))
  }

  /** Inverse: lat/lng degrees from mercator planar coords. */
  def unMercatorLat(y: Column): Column = degrees(atan(sinh(y)))
  def unMercatorLng(x: Column): Column = degrees(x)

  /** Web-mercator tile x index at `zoom`. */
  def tileX(lngDeg: Column, zoom: Int): Column = {
    val n = (1L << zoom).toDouble
    least(lit((1L << zoom) - 1),
      greatest(lit(0L), floor((lngDeg + 180.0) / 360.0 * n).cast("long")))
  }

  /** Web-mercator tile y index at `zoom` (clamped at the mercator
    * singularity near the poles). */
  def tileY(latDeg: Column, zoom: Int): Column = {
    val n = (1L << zoom).toDouble
    val latR = radians(latDeg)
    val y01 = (lit(1.0) - log(tan(latR) + lit(1.0) / cos(latR)) / math.Pi) / 2.0
    least(lit((1L << zoom) - 1),
      greatest(lit(0L), floor(y01 * n).cast("long")))
  }

  /** Single packed tile id: z in the high bits, then y, then x. */
  def tileId(latDeg: Column, lngDeg: Column, zoom: Int): Column =
    (lit(zoom.toLong) * lit(1L << 40)) +
      (tileY(latDeg, zoom) * lit(1L << 20)) + tileX(lngDeg, zoom)

  /** S2 covering of a web-mercator tile (the inverse raster→vector map):
    * tile bounds → lat/lng rect → covering cells. */
  def tileCovering(zoom: Int, tx: Long, ty: Long, maxCells: Int = 8): Array[Long] = {
    val n = (1L << zoom).toDouble
    def lngOf(x: Double) = x / n * 360.0 - 180.0
    def latOf(y: Double) = math.toDegrees(math.atan(math.sinh(math.Pi * (1 - 2 * y / n))))
    val rect = S2LatLngRect.fromDegrees(
      latOf(ty + 1.0), lngOf(tx.toDouble), latOf(ty.toDouble), lngOf(tx + 1.0))
    new S2RegionCoverer(maxCells).getCovering(rect)
  }

  // ---- edge tessellation (reference S2EdgeTessellator semantics:
  // geodesic -> projected chain within tolerance, recursive bisection;
  // /root/reference/src/s2/s2edge_tessellator.h:38-95) ----

  private def project(p: V3): (Double, Double) =
    (V3.lngRadians(p), math.log(math.tan(math.Pi / 4 + V3.latRadians(p) / 2)))

  private def unproject(x: Double, y: Double): V3 =
    V3.fromLatLngRadians(math.atan(math.sinh(y)), x)

  /** Geodesic a→b as a chain of Mercator-projected points such that the
    * unprojected polyline stays within `toleranceRad` of the geodesic.
    * Returns projected (x, y) including both endpoints. */
  def tessellateProjected(a: V3, b: V3, toleranceRad: Double,
                          maxDepth: Int = 30): Array[(Double, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Double, Double)](project(a))
    def recurse(a: V3, pa: (Double, Double), b: V3, pb: (Double, Double),
                depth: Int): Unit = {
      val geoMid = S2EdgeDistances.interpolate(a, b, 0.5)
      val projMid = ((pa._1 + pb._1) / 2, (pa._2 + pb._2) / 2)
      val err = unproject(projMid._1, projMid._2).angle(geoMid)
      if (err <= toleranceRad || depth >= maxDepth) out += pb
      else {
        val pm = project(geoMid)
        recurse(a, pa, geoMid, pm, depth + 1)
        recurse(geoMid, pm, b, pb, depth + 1)
      }
    }
    recurse(a, project(a), b, project(b), 0)
    out.toArray
  }

  /** Inverse: planar Mercator segment as geodesic vertices within
    * tolerance of the planar line (AppendUnprojected semantics). */
  def tessellateUnprojected(pa: (Double, Double), pb: (Double, Double),
                            toleranceRad: Double,
                            maxDepth: Int = 30): Array[V3] = {
    val out = scala.collection.mutable.ArrayBuffer[V3](unproject(pa._1, pa._2))
    def recurse(pa: (Double, Double), a: V3, pb: (Double, Double), b: V3,
                depth: Int): Unit = {
      val projMid = ((pa._1 + pb._1) / 2, (pa._2 + pb._2) / 2)
      val planMid = unproject(projMid._1, projMid._2)
      val geoMid = S2EdgeDistances.interpolate(a, b, 0.5)
      val err = planMid.angle(geoMid)
      if (err <= toleranceRad || depth >= maxDepth) out += b
      else {
        recurse(pa, a, projMid, planMid, depth + 1)
        recurse(projMid, planMid, pb, b, depth + 1)
      }
    }
    recurse(pa, out(0), pb, unproject(pb._1, pb._2), 0)
    out.toArray
  }
}
