package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core._

/** Snap rounding — the S2Builder snap layer's S2CellIdSnapFunction
  * (/root/reference/src/s2/s2builderutil_snap_functions.cc:83-160) plus a
  * repair pipeline for dirty geometry: every vertex snaps to the center of
  * the level-`level` S2 cell containing it, consecutive duplicates
  * collapse, and degenerate loops drop. This is the minimal S2Builder
  * guarantee set needed to ingest real-world geometry: after snapping,
  * vertices are separated by >= minVertexSeparation(level) or identical,
  * so duplicate/near-duplicate vertices cannot survive. */
object Snap {
  private val DblEps = 2.220446049250313e-16

  /** Snap radius guaranteed to cover the snap displacement at `level`
    * (MinSnapRadiusForLevel, snap_functions.cc:112-121). */
  def minSnapRadiusForLevel(level: Int): Double =
    0.5 * S2Metrics.MaxDiag.value(level) + 4 * DblEps

  /** Coarsest level whose snap radius is within `snapRadius`
    * (LevelForMaxSnapRadius, snap_functions.cc:123-128). */
  def levelForMaxSnapRadius(snapRadius: Double): Int =
    S2Metrics.MaxDiag.levelForMaxValue(2 * (snapRadius - 4 * DblEps))

  /** SnapPoint: center of the level-`level` cell containing p. */
  def snapPoint(p: V3, level: Int): V3 = {
    val leaf = S2CellId.fromPoint(p.x, p.y, p.z)
    S2Cell(S2CellId.parent(leaf, level)).center
  }

  /** IntLatLngSnapFunction (snap_functions.cc IntLatLngSnapFunction):
    * vertices snap to the E`exponent` integer lat/lng grid (e.g. 7 = E7).
    * The standard snap for interoperating with integer-coordinate
    * formats. */
  def snapPointIntLatLng(p: V3, exponent: Int): V3 = {
    val scale = math.pow(10, exponent)
    V3.fromLatLngDegrees(
      math.rint(V3.latDegrees(p) * scale) / scale,
      math.rint(V3.lngDegrees(p) * scale) / scale)
  }

  /** Guaranteed displacement bound of the E`exponent` grid snap: lat and
    * lng each move <= 0.5·10^-e degrees, so the displacement is at most
    * (10^-e)/sqrt(2) degrees (reference MinSnapRadiusForExponent). */
  def minSnapRadiusForExponent(exponent: Int): Double =
    math.toRadians(math.sqrt(0.5) * math.pow(10.0, -exponent)) + 4 * DblEps

  /** Snap a vertex chain: snap each vertex, collapse consecutive
    * duplicates (including wrap-around for closed chains). */
  def snapChain(vertices: Array[V3], level: Int, closed: Boolean): Array[V3] = {
    val snapped = vertices.map(snapPoint(_, level))
    val out = scala.collection.mutable.ArrayBuffer.empty[V3]
    for (v <- snapped) if (out.isEmpty || out.last != v) out += v
    if (closed && out.length > 1 && out.head == out.last) out.remove(out.length - 1)
    out.toArray
  }

  /** Snap-repair a polygon: snap all loops, drop loops that degenerate to
    * fewer than 3 vertices, return None when nothing survives. */
  def snapPolygon(poly: S2Polygon, level: Int): Option[S2Polygon] = {
    val loops = poly.loops.iterator
      .map(l => snapChain(l.vertices, level, closed = true))
      .filter(_.length >= 3)
      .map(S2Loop(_))
      .toArray
    if (loops.isEmpty) None else Some(new S2Polygon(loops))
  }

  private def fmt(p: V3): String =
    s"${V3.latDegrees(p)}:${V3.lngDegrees(p)}"

  /** Snap-repair polygon text; None when the result is degenerate or
    * still invalid. */
  def repairPolygonText(text: String, level: Int): Option[String] =
    try {
      val poly = S2TextFormat.parsePolygon(text)
      snapPolygon(poly, level).map { p =>
        p.loops.map(_.vertices.map(fmt).mkString(", ")).mkString("; ")
      }.filter(t => Validation.validatePolygonText(t).isEmpty)
    } catch { case _: Exception => None }

  private def repairUdf(level: Int) = udf { (text: String) =>
    repairPolygonText(text, level).orNull
  }

  /** Validation + repair pipeline: `geom_error` (null = originally valid)
    * and `repaired_poly` — the original text when valid, the snap-repaired
    * text when repairable, null when unrecoverable. The snap level bounds
    * how far vertices move (minSnapRadiusForLevel). */
  def withRepair(df: DataFrame, polyTextCol: String, level: Int = 20): DataFrame =
    Validation.withValidation(df, polyTextCol)
      .withColumn("repaired_poly",
        when(col("geom_error").isNull, col(polyTextCol))
          .otherwise(repairUdf(level)(col(polyTextCol))))
}

/** Builder snap functions (s2builderutil_snap_functions.h:39-68): the
  * pluggable vertex-rounding strategies of the S2Builder layer stack.
  * Each guarantees every vertex moves at most `snapRadius`. */
sealed trait SnapFunction extends Serializable {
  def apply(p: V3): V3
  /** Guaranteed bound on the snap displacement (radians). */
  def snapRadius: Double
}

object SnapFunction {
  /** S2CellIdSnapFunction: cell centers at `level`. */
  final case class CellIdSnap(level: Int) extends SnapFunction {
    def apply(p: V3): V3 = Snap.snapPoint(p, level)
    def snapRadius: Double = Snap.minSnapRadiusForLevel(level)
  }
  /** IntLatLngSnapFunction: E`exponent` integer lat/lng grid. */
  final case class IntLatLngSnap(exponent: Int) extends SnapFunction {
    def apply(p: V3): V3 = Snap.snapPointIntLatLng(p, exponent)
    def snapRadius: Double = Snap.minSnapRadiusForExponent(exponent)
  }
  /** IdentitySnapFunction(0): vertices unmoved; tolerance = leaf level. */
  case object Identity extends SnapFunction {
    def apply(p: V3): V3 = p
    def snapRadius: Double = Snap.minSnapRadiusForLevel(30)
  }
  /** Legacy int encoding: negative = identity, else cell-id level. */
  def fromLevel(level: Int): SnapFunction =
    if (level < 0) Identity else CellIdSnap(level)
}
