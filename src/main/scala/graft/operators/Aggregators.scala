package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.core._

/** Typed aggregators over geometry columns (SURVEY.md §2.14): cell-union
  * merge, bounding-rect union, and true-centroid sum. All are associative
  * and commutative → Spark runs them with map-side partial aggregation,
  * so the shuffle carries one small buffer per partition, not rows. */
object Aggregators {

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  /** Union + normalize of cell-id arrays per group (S2CellUnion::Union
    * semantics, /root/reference/src/s2/s2cell_union.cc:347-353). The
    * buffer is kept normalized so its size stays bounded by covering
    * complexity, not group size. */
  def cellUnionColumn(cells: Column): Column = {
    val agg = new Aggregator[Array[Long], Array[Long], Array[Long]] {
      def zero: Array[Long] = Array.emptyLongArray
      def reduce(b: Array[Long], a: Array[Long]): Array[Long] =
        if (a == null || a.isEmpty) b else S2CellUnion.union(b, a)
      def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
        S2CellUnion.union(b1, b2)
      def finish(r: Array[Long]): Array[Long] = r
      def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    }
    org.apache.spark.sql.functions.udaf(agg).apply(cells)
  }

  /** Bounding lat/lng rect of (lat,lng) degree pairs per group, emitted as
    * struct(lat_lo, lng_lo, lat_hi, lng_hi) degrees (S2LatLngRect::Union /
    * AddPoint semantics, lng interval wraps). */
  def rectBoundColumn(latDeg: Column, lngDeg: Column): Column = {
    type Buf = (Double, Double, Double, Double, Boolean) // latLo,latHi,lngLo,lngHi(rad),nonEmpty
    val agg = new Aggregator[(Double, Double), Buf, (Double, Double, Double, Double)] {
      private def toRect(b: Buf): S2LatLngRect =
        S2LatLngRect(R1Interval(b._1, b._2), S1Interval(b._3, b._4))
      private def fromRect(r: S2LatLngRect): Buf =
        (r.lat.lo, r.lat.hi, r.lng.lo, r.lng.hi, true)
      def zero: Buf = (1.0, -1.0, math.Pi, -math.Pi, false) // empty intervals
      def reduce(b: Buf, p: (Double, Double)): Buf = {
        val pt = V3.fromLatLngDegrees(p._1, p._2)
        val r = if (!b._5) S2LatLngRect.fromPointPair(
          math.toRadians(p._1), math.toRadians(p._2),
          math.toRadians(p._1), math.toRadians(p._2))
        else toRect(b).addPoint(pt)
        fromRect(r)
      }
      def merge(a: Buf, b: Buf): Buf =
        if (!a._5) b else if (!b._5) a else fromRect(toRect(a).union(toRect(b)))
      def finish(b: Buf): (Double, Double, Double, Double) =
        (math.toDegrees(b._1), math.toDegrees(b._3),
         math.toDegrees(b._2), math.toDegrees(b._4))
      def bufferEncoder: Encoder[Buf] = ExpressionEncoder[(Double, Double, Double, Double, Boolean)]()
      def outputEncoder: Encoder[(Double, Double, Double, Double)] =
        ExpressionEncoder[(Double, Double, Double, Double)]()
    }
    org.apache.spark.sql.functions.udaf(agg).apply(latDeg, lngDeg)
  }

  /** Spherical convex hull per group (S2ConvexHullQuery semantics,
    * reference s2convex_hull_query.cc): buffer = (isFull, current hull
    * vertices) — merging hulls = hull of vertex union (associative); a
    * group whose bound spans a hemisphere collapses to the explicit full
    * sentinel (vertex lists cannot represent the full loop losslessly).
    * Result: (isFull, CCW loop vertices as (x,y,z)). */
  def convexHullColumn(latDeg: Column, lngDeg: Column): Column = {
    type Buf = (Boolean, Seq[(Double, Double, Double)])
    def hullOf(pts: Seq[(Double, Double, Double)]): Buf = {
      val loop = S2ConvexHull.hull(pts.map { case (x, y, z) => V3(x, y, z) })
      if (loop.isFull) (true, Seq.empty)
      else (false, loop.vertices.toSeq.map(v => (v.x, v.y, v.z)))
    }
    val agg = new Aggregator[(Double, Double), Buf, Buf] {
      def zero: Buf = (false, Seq.empty)
      def reduce(b: Buf, p: (Double, Double)): Buf = {
        if (b._1) b
        else {
          val v = V3.fromLatLngDegrees(p._1, p._2)
          val appended = b._2 :+ ((v.x, v.y, v.z))
          if (appended.size > 64) hullOf(appended) else (false, appended)
        }
      }
      def merge(a: Buf, b: Buf): Buf =
        if (a._1 || b._1) (true, Seq.empty) else hullOf(a._2 ++ b._2)
      def finish(b: Buf): Buf =
        if (b._1 || b._2.isEmpty) b else hullOf(b._2)
      def bufferEncoder: Encoder[Buf] =
        ExpressionEncoder[(Boolean, Seq[(Double, Double, Double)])]()
      def outputEncoder: Encoder[Buf] =
        ExpressionEncoder[(Boolean, Seq[(Double, Double, Double)])]()
    }
    org.apache.spark.sql.functions.udaf(agg).apply(latDeg, lngDeg)
  }

  /** Convex hull per group with input identity preserved: input rows are
    * (id, lat, lng); the result is the sub-sequence of inputs that are
    * strict hull vertices (the monotone chain keeps original points, so
    * hull vertices map back to inputs by exact V3 equality — synthetic
    * vertices from the 1/2-point degenerate loops are dropped). Buffer =
    * (isFull, candidate rows); merging re-hulls the union, so the buffer
    * stays bounded by hull complexity, not group size. */
  def convexHullIdsColumn(id: Column, latDeg: Column, lngDeg: Column): Column = {
    type Row = (Long, Double, Double)
    type Buf = (Boolean, Seq[Row])
    def hullOf(rows: Seq[Row]): Buf = {
      // duplicate-coordinate rows collapse to the SMALLEST id so the
      // surviving representative is deterministic under Spark's
      // partition-order nondeterminism
      val byPoint = rows.groupBy(r => V3.fromLatLngDegrees(r._2, r._3))
        .map { case (p, rs) => p -> rs.minBy(_._1) }
      val loop = S2ConvexHull.hull(byPoint.keys.toSeq)
      if (loop.isFull) (true, Seq.empty)
      else (false, loop.vertices.toSeq.flatMap(byPoint.get).sortBy(_._1))
    }
    val agg = new Aggregator[(Long, Double, Double), (Boolean, Seq[(Long, Double, Double)]), (Boolean, Seq[(Long, Double, Double)])] {
      def zero: Buf = (false, Seq.empty)
      def reduce(b: Buf, r: (Long, Double, Double)): Buf =
        if (b._1) b
        else {
          val appended = b._2 :+ r
          if (appended.size > 64) hullOf(appended) else (false, appended)
        }
      def merge(a: Buf, b: Buf): Buf =
        if (a._1 || b._1) (true, Seq.empty) else hullOf(a._2 ++ b._2)
      def finish(b: Buf): Buf =
        if (b._1 || b._2.isEmpty) b else hullOf(b._2)
      def bufferEncoder: Encoder[Buf] =
        ExpressionEncoder[(Boolean, Seq[(Long, Double, Double)])]()
      def outputEncoder: Encoder[Buf] =
        ExpressionEncoder[(Boolean, Seq[(Long, Double, Double)])]()
    }
    org.apache.spark.sql.functions.udaf(agg).apply(id, latDeg, lngDeg)
  }

  /** True centroid (unnormalized vector sum — reference TrueCentroid
    * convention: scale-free, add across groups; s2centroids.cc). */
  def centroidColumn(latDeg: Column, lngDeg: Column): Column = {
    type V = (Double, Double, Double)
    val agg = new Aggregator[(Double, Double), V, V] {
      def zero: V = (0.0, 0.0, 0.0)
      def reduce(b: V, p: (Double, Double)): V = {
        val v = V3.fromLatLngDegrees(p._1, p._2)
        (b._1 + v.x, b._2 + v.y, b._3 + v.z)
      }
      def merge(a: V, b: V): V = (a._1 + b._1, a._2 + b._2, a._3 + b._3)
      def finish(b: V): V = b
      def bufferEncoder: Encoder[V] = ExpressionEncoder[(Double, Double, Double)]()
      def outputEncoder: Encoder[V] = ExpressionEncoder[(Double, Double, Double)]()
    }
    org.apache.spark.sql.functions.udaf(agg).apply(latDeg, lngDeg)
  }
}
