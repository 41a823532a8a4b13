package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core._

/** Polyline analytics as columns over array<struct<lat,lng>> (degrees) or
  * parallel lat/lng arrays: length, interpolation
  * (S2ChainInterpolationQuery semantics), tolerance subsampling
  * (S2Polyline::SubsampleVertices semantics) and exact dynamic-timewarp
  * alignment cost (S2PolylineAlignment::GetExactVertexAlignmentCost,
  * /root/reference/src/s2/s2polyline_alignment.cc:183-209: cell cost =
  * Euclidean chord norm, min of diag/up/left predecessors). */
object Polylines {

  private def toV3(lat: Seq[Double], lng: Seq[Double]): Array[V3] =
    lat.zip(lng).map { case (la, ln) => V3.fromLatLngDegrees(la, ln) }.toArray

  /** Geodesic length in radians. */
  val lengthUdf = udf { (lat: Seq[Double], lng: Seq[Double]) =>
    val v = toV3(lat, lng)
    var s = 0.0
    var i = 1
    while (i < v.length) { s += v(i - 1).angle(v(i)); i += 1 }
    s
  }

  /** Point at `fraction` ∈ [0,1] of the chain's total length — the
    * S2ChainInterpolationQuery AtFraction semantics. Returns (lat, lng)
    * degrees. */
  val atFractionUdf = udf { (lat: Seq[Double], lng: Seq[Double], fraction: Double) =>
    val v = toV3(lat, lng)
    if (v.isEmpty) null
    else if (v.length == 1) (V3.latDegrees(v(0)), V3.lngDegrees(v(0)))
    else {
      val segLens = (1 until v.length).map(i => v(i - 1).angle(v(i)))
      val total = segLens.sum
      val want = math.max(0.0, math.min(1.0, fraction)) * total
      var acc = 0.0
      var i = 0
      while (i < segLens.length && acc + segLens(i) < want) { acc += segLens(i); i += 1 }
      val p =
        if (i >= segLens.length) v.last
        else {
          val t = if (segLens(i) == 0) 0.0 else (want - acc) / segLens(i)
          S2EdgeDistances.interpolate(v(i), v(i + 1), t)
        }
      (V3.latDegrees(p), V3.lngDegrees(p))
    }
  }

  /** Tolerance subsample (reference S2Polyline::SubsampleVertices,
    * s2polyline.cc: greedy forward scan — keep the longest prefix edge such
    * that every skipped vertex stays within `toleranceRad`). Returns the
    * kept vertex indices. */
  /** Greedy forward-scan subsample kernel (shared with the builder's
    * simplify-edge-chains): kept vertex indices such that every skipped
    * vertex stays within `toleranceRad` of the simplified edge. */
  private[graft] def subsampleIdx(v: Array[V3], toleranceRad: Double): Array[Int] = {
    if (v.length <= 2) v.indices.toArray
    else {
      val tol2 = S1ChordAngle.fromRadians(toleranceRad)
      val keep = scala.collection.mutable.ArrayBuffer(0)
      var start = 0
      while (start < v.length - 1) {
        var end = start + 1
        var best = end
        var ok = true
        while (ok && end < v.length) {
          // all intermediate vertices within tolerance of edge start→end?
          var j = start + 1
          var fits = true
          while (fits && j < end) {
            if (S2EdgeDistances.distance2(v(j), v(start), v(end)) > tol2) fits = false
            j += 1
          }
          if (fits) { best = end; end += 1 } else ok = false
        }
        keep += best
        start = best
      }
      keep.toArray
    }
  }

  val subsampleUdf = udf { (lat: Seq[Double], lng: Seq[Double], toleranceRad: Double) =>
    subsampleIdx(toV3(lat, lng), toleranceRad)
  }

  /** Approximate (coarsen→align→refine) DTW alignment — reference
    * GetApproxVertexAlignment; cost upper-bounds the exact cost, runtime
    * O(window) instead of O(n·m). Returns (cost, path_len). */
  val approxDtwUdf = udf {
    (aLat: Seq[Double], aLng: Seq[Double],
     bLat: Seq[Double], bLng: Seq[Double], radius: Int) =>
      val r = PolylineAlignment.approxVertexAlignment(
        toV3(aLat, aLng), toV3(bLat, bLng), radius)
      (r.cost, r.path.length)
  }

  /** Medoid index of a group of polylines (reference GetMedoidPolyline);
    * apply after a bounded per-key collect_list. */
  val medoidUdf = udf { (lats: Seq[Seq[Double]], lngs: Seq[Seq[Double]]) =>
    PolylineAlignment.medoidPolyline(
      lats.indices.map(i => toV3(lats(i), lngs(i))), approx = false)
  }

  /** DTW-barycenter consensus polyline of a group (reference
    * GetConsensusPolyline); returns array<struct<lat,lng>> degrees. */
  val consensusUdf = udf { (lats: Seq[Seq[Double]], lngs: Seq[Seq[Double]]) =>
    PolylineAlignment.consensusPolyline(
      lats.indices.map(i => toV3(lats(i), lngs(i))))
      .map(p => (V3.latDegrees(p), V3.lngDegrees(p)))
  }

  private val consensusGroupUdf = udf {
    (ids: Seq[Long], lats: Seq[Seq[Double]], lngs: Seq[Seq[Double]]) =>
      val polys = lats.indices.map(i => toV3(lats(i), lngs(i)))
      val med = PolylineAlignment.medoidPolyline(polys)
      (ids(med),
        PolylineAlignment.consensusPolyline(polys, seedMedoid = true)
          .map(p => (V3.latDegrees(p), V3.lngDegrees(p))))
  }

  /** Per-key trajectory reduction: the medoid trajectory id + the
    * medoid-seeded DBA consensus polyline per key ("cluster then
    * summarize"). One shuffle keyed by `key` carrying only vertex arrays;
    * each key's consensus then computes independently inside its task, so
    * the op scales with key count. collect_list order is pinned by
    * sort_array on `trajId`, making the result deterministic. Groups must
    * be task-bounded (10²–10⁴ trajectories per key) — the usual contract
    * for per-key collect aggregation. */
  def consensusByKey(df: DataFrame, key: Column, trajId: Column,
                     lat: Column, lng: Column): DataFrame =
    df.groupBy(key.as("key"))
      .agg(sort_array(collect_list(
        struct(trajId.as("id"), lat.as("la"), lng.as("lo")))).as("ts"))
      .select(col("key"),
        consensusGroupUdf(col("ts.id"), col("ts.la"), col("ts.lo")).as("r"))
      .select(col("key"), col("r._1").as("medoid_id"),
        col("r._2").as("consensus"))

  /** Exact DTW vertex-alignment cost between two chains (cell cost =
    * chord norm; full O(n·m) table — the reference's exact path). */
  val dtwCostUdf = udf {
    (aLat: Seq[Double], aLng: Seq[Double], bLat: Seq[Double], bLng: Seq[Double]) =>
      val a = toV3(aLat, aLng)
      val b = toV3(bLat, bLng)
      if (a.isEmpty || b.isEmpty) Double.NaN
      else {
        val cols = b.length
        var prev: Array[Double] = null
        var curr = new Array[Double](cols)
        var row = 0
        while (row < a.length) {
          var col = 0
          while (col < cols) {
            val d = (a(row) - b(col)).norm
            val dCost =
              if (row == 0 && col == 0) 0.0
              else if (row > 0 && col > 0) prevRow(prev, col - 1)
              else Double.MaxValue
            val uCost = if (row > 0) prevRow(prev, col) else Double.MaxValue
            val lCost = if (col > 0) curr(col - 1) else Double.MaxValue
            curr(col) = math.min(dCost, math.min(uCost, lCost)) + d
            col += 1
          }
          val tmp = prev; prev = curr
          curr = if (tmp == null) new Array[Double](cols) else tmp
          row += 1
        }
        prev(cols - 1)
      }
  }

  @inline private def prevRow(prev: Array[Double], col: Int): Double =
    if (prev == null) Double.MaxValue else prev(col)

  /** Distance-parameterized interpolation (S2ChainInterpolationQuery
    * AtDistance, s2chain_interpolation_query.h:43): point at `distRad`
    * radians along the chain, with the containing edge index and the
    * clamped distance — struct(lat, lng, edge, distance), null for empty
    * chains. */
  val atDistanceUdf = udf { (lat: Seq[Double], lng: Seq[Double], distRad: Double) =>
    val q = new S2ChainInterpolation(Seq(toV3(lat, lng)))
    q.atDistance(distRad).map { r =>
      (V3.latDegrees(r.point), V3.lngDegrees(r.point), r.edge, r.distance)
    }.orNull
  }

  /** Polyline×polyline Intersects predicate (reference s2polyline.h:233,
    * s2polyline.cc:356-375): any proper crossing or vertex/edge touch. */
  val intersectsUdf = udf { (aLat: Seq[Double], aLng: Seq[Double],
                             bLat: Seq[Double], bLng: Seq[Double]) =>
    S2PolylineRelations.intersects(toV3(aLat, aLng), toV3(bLat, bLng))
  }

  /** NearlyCovers predicate (reference s2polyline.h:290, the "two cars"
    * reparameterization search): chain A nearly covers chain B within
    * `maxErrorRad`. */
  val nearlyCoversUdf = udf { (aLat: Seq[Double], aLng: Seq[Double],
                               bLat: Seq[Double], bLng: Seq[Double],
                               maxErrorRad: Double) =>
    S2PolylineRelations.nearlyCovers(toV3(aLat, aLng), toV3(bLat, bLng), maxErrorRad)
  }

  def length(lat: Column, lng: Column): Column = lengthUdf(lat, lng)
  def atFraction(lat: Column, lng: Column, f: Column): Column =
    atFractionUdf(lat, lng, f)
  def atDistance(lat: Column, lng: Column, distRad: Column): Column =
    atDistanceUdf(lat, lng, distRad)
  def subsampleIndices(lat: Column, lng: Column, tolRad: Column): Column =
    subsampleUdf(lat, lng, tolRad)
  def dtwCost(aLat: Column, aLng: Column, bLat: Column, bLng: Column): Column =
    dtwCostUdf(aLat, aLng, bLat, bLng)
  def intersects(aLat: Column, aLng: Column, bLat: Column, bLng: Column): Column =
    intersectsUdf(aLat, aLng, bLat, bLng)
  def nearlyCovers(aLat: Column, aLng: Column, bLat: Column, bLng: Column,
                   maxErrorRad: Column): Column =
    nearlyCoversUdf(aLat, aLng, bLat, bLng, maxErrorRad)
}
