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
}
