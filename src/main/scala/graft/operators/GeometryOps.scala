package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.functions.PolyCache

/** Column-level constructive-geometry surface: boolean operations,
  * buffering, winding and Hausdorff over polygon-text columns (the
  * engine's canonical geometry literal format, reference s2text_format).
  * These wrap the exact kernels in graft.core — a user of the reference's
  * S2BooleanOperation / S2BufferOperation / S2HausdorffDistanceQuery
  * switches to these columns. Geometry sides are typically dimension
  * tables; the UDFs parse through the per-executor [[PolyCache]]. */
object GeometryOps {

  private def toText(p: S2Polygon): String = S2TextFormat.polygonToString(p)

  private def opUdf(op: S2BooleanOps.Op) = udf { (a: String, b: String) =>
    toText(S2BooleanOps(op, PolyCache.get(a), PolyCache.get(b)))
  }

  val polygonUnionUdf = opUdf(S2BooleanOps.Union)
  val polygonIntersectionUdf = opUdf(S2BooleanOps.Intersection)
  val polygonDifferenceUdf = opUdf(S2BooleanOps.Difference)
  val polygonSymmetricDifferenceUdf = opUdf(S2BooleanOps.SymmetricDifference)

  def polygonUnion(a: Column, b: Column): Column = polygonUnionUdf(a, b)
  def polygonIntersection(a: Column, b: Column): Column = polygonIntersectionUdf(a, b)
  def polygonDifference(a: Column, b: Column): Column = polygonDifferenceUdf(a, b)
  def polygonSymmetricDifference(a: Column, b: Column): Column =
    polygonSymmetricDifferenceUdf(a, b)

  val polygonBufferUdf = udf { (text: String, radiusRad: Double) =>
    toText(S2Buffer.bufferPolygon(PolyCache.get(text), radiusRad))
  }
  def polygonBuffer(text: Column, radiusRad: Column): Column =
    polygonBufferUdf(text, radiusRad)

  val polygonAreaUdf = udf { (text: String) => PolyCache.get(text).area }
  def polygonArea(text: Column): Column = polygonAreaUdf(text)

  /** Spherical triangle area (Girard/L'Huilier hybrid,
    * reference s2measures.cc:49-90) from three (lat,lng)-degree vertices. */
  val triangleAreaUdf = udf {
    (aLat: Double, aLng: Double, bLat: Double, bLng: Double,
     cLat: Double, cLng: Double) =>
      S2Measures.area(V3.fromLatLngDegrees(aLat, aLng),
        V3.fromLatLngDegrees(bLat, bLng), V3.fromLatLngDegrees(cLat, cLng))
  }
  def triangleArea(aLat: Column, aLng: Column, bLat: Column, bLng: Column,
                   cLat: Column, cLng: Column): Column =
    triangleAreaUdf(aLat, aLng, bLat, bLng, cLat, cLng)

  /** Undirected Hausdorff distance (squared chord) between polygon
    * texts, interiors included. */
  def polygonHausdorff(a: Column, b: Column): Column =
    RegionJoins.polygonHausdorffUdf(a, b)

  /** Winding-rule containment of (lat,lng) against a multi-ring polygon
    * text whose rings are DIRECTED as written. */
  private def ruleOf(name: String): S2Winding.WindingRule =
    name.toUpperCase match {
      case "POSITIVE" => S2Winding.Positive
      case "NEGATIVE" => S2Winding.Negative
      case "ODD" => S2Winding.Odd
      case _ => S2Winding.NonZero
    }
  val windingContainsUdf = udf { (text: String, rule: String, lat: Double, lng: Double) =>
    val rings = text.split(";").map(S2TextFormat.parsePoints).filter(_.nonEmpty)
    S2Winding.contains(rings.toSeq, ruleOf(rule), V3.fromLatLngDegrees(lat, lng))
  }
  def windingContains(text: Column, rule: Column, lat: Column, lng: Column): Column =
    windingContainsUdf(text, rule, lat, lng)

  /** Winding-rule region MATERIALIZATION: directed ring set (";"-joined
    * ring texts) → parity-model polygon text (arbitrary crossing sets). */
  val windingPolygonUdf = udf { (text: String, rule: String) =>
    val rings = text.split(";").map(S2TextFormat.parsePoints).filter(_.nonEmpty)
    toText(S2Winding.toPolygon(rings.toSeq, ruleOf(rule)))
  }
  def windingPolygon(text: Column, rule: Column): Column =
    windingPolygonUdf(text, rule)

  /** Clip a polyline text against a polygon text (PolylineModel; model ∈
    * OPEN / SEMI_OPEN / CLOSED; op ∈ INTERSECTION / DIFFERENCE). Returns
    * the clipped pieces as polyline texts. */
  val polylineClipUdf = udf { (lineText: String, polyText: String,
                               op: String, model: String) =>
    val line = S2TextFormat.parsePoints(lineText)
    val poly = PolyCache.get(polyText)
    val m: PolylineBooleanOps.Model = model.toUpperCase match {
      case "OPEN" => PolylineBooleanOps.Open
      case "SEMI_OPEN" => PolylineBooleanOps.SemiOpen
      case _ => PolylineBooleanOps.Closed
    }
    val pieces = op.toUpperCase match {
      case "DIFFERENCE" => PolylineBooleanOps.difference(line, poly, m)
      case _ => PolylineBooleanOps.intersection(line, poly, m)
    }
    pieces.map(p => p.map(v =>
      s"${V3.latDegrees(v)}:${V3.lngDegrees(v)}").mkString(", ")).toArray
  }
  def polylineClip(line: Column, poly: Column, op: Column, model: Column): Column =
    polylineClipUdf(line, poly, op, model)

  /** Point at `distRad` along a polyline text (chain interpolation):
    * struct(lat, lng, edge, distance), null for degenerate chains. */
  val polylineAtDistanceUdf = udf { (lineText: String, distRad: Double) =>
    val q = new S2ChainInterpolation(Seq(S2TextFormat.parsePoints(lineText)))
    q.atDistance(distRad).map { r =>
      (V3.latDegrees(r.point), V3.lngDegrees(r.point), r.edge, r.distance)
    }.orNull
  }
  def polylineAtDistance(line: Column, distRad: Column): Column =
    polylineAtDistanceUdf(line, distRad)

  /** Pack a polyline text into the compact snapped-point codec
    * ([[graft.core.S2PointCodec]]): BINARY column, 1-3 bytes/vertex on
    * spatially-coherent chains vs ~20 bytes of text / 24 bytes of raw
    * doubles — the shuffle/storage shape for trajectory tables. */
  val packPolylineUdf = udf { (lineText: String, level: Int) =>
    S2PointCodec.encode(S2TextFormat.parsePoints(lineText), level)
  }
  def packPolyline(line: Column, level: Column): Column =
    packPolylineUdf(line, level)

  /** Unpack a [[graft.core.S2PointCodec]] BINARY back to polyline text
    * (the snapped cell-center chain). */
  val unpackPolylineUdf = udf { (bytes: Array[Byte]) =>
    S2PointCodec.decode(bytes).map(S2TextFormat.pointToString).mkString(", ")
  }
  def unpackPolyline(bytes: Column): Column = unpackPolylineUdf(bytes)

  /** Register the SQL-callable names. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("s2_polygon_union", polygonUnionUdf)
    spark.udf.register("s2_polygon_intersection", polygonIntersectionUdf)
    spark.udf.register("s2_polygon_difference", polygonDifferenceUdf)
    spark.udf.register("s2_polygon_symdiff", polygonSymmetricDifferenceUdf)
    spark.udf.register("s2_polygon_buffer", polygonBufferUdf)
    spark.udf.register("s2_polygon_area", polygonAreaUdf)
    spark.udf.register("s2_triangle_area", triangleAreaUdf)
    spark.udf.register("s2_polygon_hausdorff", RegionJoins.polygonHausdorffUdf)
    spark.udf.register("s2_winding_contains", windingContainsUdf)
    spark.udf.register("s2_winding_polygon", windingPolygonUdf)
    spark.udf.register("s2_polyline_clip", polylineClipUdf)
    spark.udf.register("s2_polyline_at_distance", polylineAtDistanceUdf)
    spark.udf.register("s2_pack_polyline", packPolylineUdf)
    spark.udf.register("s2_unpack_polyline", unpackPolylineUdf)
  }
}
