package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core._

/** Batch geometry validation — S2ValidationQuery semantics
  * (/root/reference/src/s2/s2validation_query.h:56-122) re-expressed as a
  * Dataset filter producing an error column: each polygon-text row gets
  * the first validity violation found, or null when valid. The checks
  * mirror S2Loop/S2Polygon invariants: vertex count, unit-length and
  * finite vertices, duplicate/antipodal adjacent vertices, and edge
  * self-intersection (exact crossing tests). */
object Validation {

  sealed trait Code { def name: String }

  /** Validate one loop's vertex array; None = valid.
    *
    * The self-intersection scan is O(n²) in edge count only below
    * `pruneFrom` vertices; larger loops prune candidate pairs through a
    * [[CellIntervalIndex]] over per-edge cap coverings (the reference
    * prunes through its shape index the same way,
    * s2shapeutil_visit_crossing_edge_pairs.cc) — cost scales with local
    * edge density instead of n². The exact crossing predicate is
    * unchanged, so verdicts are identical. */
  def validateLoop(vertices: Array[V3], pruneFrom: Int = 256): Option[String] = {
    if (vertices.length == 1) return None // empty/full sentinels are valid
    if (vertices.length < 3) return Some("TOO_FEW_VERTICES")
    var i = 0
    while (i < vertices.length) {
      val v = vertices(i)
      if (!java.lang.Double.isFinite(v.x) || !java.lang.Double.isFinite(v.y) ||
          !java.lang.Double.isFinite(v.z)) return Some("NON_FINITE_VERTEX")
      if (math.abs(v.norm2 - 1.0) > 1e-10) return Some("NOT_UNIT_LENGTH")
      val next = vertices((i + 1) % vertices.length)
      if (v == next) return Some("DUPLICATE_ADJACENT_VERTICES")
      if (v == -next) return Some("ANTIPODAL_ADJACENT_VERTICES")
      i += 1
    }
    // duplicate NON-adjacent vertices: the reference rejects any repeated
    // vertex (S2Loop::FindValidationError via FindSelfIntersection — two
    // edges sharing an endpoint that are not adjacent). Checking vertex
    // multiset equality here also subsumes the EdgeOrVertexCrossing case
    // for non-adjacent edge pairs: with all vertices distinct, two
    // non-adjacent edges cannot meet at a shared vertex, so the proper-
    // crossing test below is sufficient for the remaining pairs.
    val seen = new java.util.HashSet[(Double, Double, Double)](vertices.length * 2)
    var vi = 0
    while (vi < vertices.length) {
      val v = vertices(vi)
      if (!seen.add((v.x, v.y, v.z))) return Some("DUPLICATE_VERTICES")
      vi += 1
    }
    // self-intersection: any non-adjacent edge pair properly crossing.
    val n = vertices.length
    @inline def adjacentPair(a: Int, b: Int): Boolean = // assumes a < b
      b == a + 1 || (a == 0 && b == n - 1)
    @inline def crossesAt(a: Int, b: Int): Boolean =
      S2EdgeCrossings.crossingSign(vertices(a), vertices((a + 1) % n),
        vertices(b), vertices((b + 1) % n)) > 0
    if (n < pruneFrom) {
      var a = 0
      while (a < n) {
        var b = a + 1
        while (b < n) {
          if (!adjacentPair(a, b) && crossesAt(a, b))
            return Some("SELF_INTERSECTION")
          b += 1
        }
        a += 1
      }
    } else {
      // candidate pruning: two edges can only cross if their bounding-cap
      // coverings intersect. 1e-12 slack absorbs cap-boundary rounding.
      val cov = new S2RegionCoverer(4, 0, 30)
      val coverings = Array.tabulate(n) { i =>
        val u = vertices(i); val v = vertices((i + 1) % n)
        val c0 = u + v
        val center = if (c0.norm2 < 1e-30) u else c0.normalize
        cov.getCovering(S2Cap.fromCenterAngle(center, center.angle(u) + 1e-12))
      }
      val idx = CellIntervalIndex.build(
        (0 until n).map(i => (i, coverings(i), Array.empty[Long])))
      var a = 0
      while (a < n) {
        val cands = idx.intersectingLabels(coverings(a))
        var ci = 0
        while (ci < cands.length) {
          val b = cands(ci)
          if (b > a && !adjacentPair(a, b) && crossesAt(a, b))
            return Some("SELF_INTERSECTION")
          ci += 1
        }
        a += 1
      }
    }
    None
  }

  /** Polyline validation (reference S2Polyline::FindValidationError,
    * s2polyline.cc): ≥ 2 vertices for an edge, unit-length finite
    * vertices, no identical adjacent vertices (degenerate edges), no
    * antipodal adjacent vertices (undefined geodesic). */
  def validatePolyline(vertices: Array[V3]): Option[String] = {
    if (vertices.length < 2) return Some("TOO_FEW_VERTICES")
    var i = 0
    while (i < vertices.length) {
      val v = vertices(i)
      if (!java.lang.Double.isFinite(v.x) || !java.lang.Double.isFinite(v.y) ||
          !java.lang.Double.isFinite(v.z)) return Some("NON_FINITE_VERTEX")
      if (math.abs(v.norm2 - 1.0) > 1e-10) return Some("NOT_UNIT_LENGTH")
      if (i > 0) {
        if (v == vertices(i - 1)) return Some("DUPLICATE_ADJACENT_VERTICES")
        if (v == -vertices(i - 1)) return Some("ANTIPODAL_ADJACENT_VERTICES")
      }
      i += 1
    }
    None
  }

  private val validatePolylineUdf = udf { (text: String) =>
    (try validatePolyline(S2TextFormat.parsePoints(text))
     catch { case _: Exception => Some("PARSE_ERROR") }).orNull
  }

  /** Adds `line_error` (null = valid) for a polyline-text column. */
  def withPolylineValidation(df: DataFrame, lineTextCol: String): DataFrame =
    df.withColumn("line_error", validatePolylineUdf(col(lineTextCol)))

  /** Cross-loop audit: boundary edges of distinct loops must not properly
    * cross (reference S2Polygon::FindValidationError; the full shell/hole
    * nesting hierarchy is computed by [[graft.operators.Nesting]]). */
  def validateLoopPair(a: Array[V3], b: Array[V3]): Option[String] = {
    var i = 0
    while (i < a.length) {
      val a2 = a((i + 1) % a.length)
      var j = 0
      while (j < b.length) {
        if (S2EdgeCrossings.crossingSign(a(i), a2, b(j), b((j + 1) % b.length)) > 0)
          return Some("LOOP_CROSSING")
        j += 1
      }
      i += 1
    }
    None
  }

  def validatePolygonText(text: String): Option[String] =
    try {
      val poly = S2TextFormat.parsePolygon(text)
      val perLoop = poly.loops.iterator.map(l => validateLoop(l.vertices))
        .collectFirst { case Some(err) => err }
      perLoop.orElse {
        val ls = poly.loops
        (for {
          i <- ls.indices.iterator
          j <- (i + 1 until ls.length).iterator
          err <- validateLoopPair(ls(i).vertices, ls(j).vertices)
        } yield err).nextOption()
      }
    } catch { case e: Exception => Some("PARSE_ERROR") }

  private val validateUdf = udf { (text: String) =>
    validatePolygonText(text).orNull
  }

  /** Adds `geom_error` (null = valid) for a polygon-text column. */
  def withValidation(df: DataFrame, polyTextCol: String): DataFrame =
    df.withColumn("geom_error", validateUdf(col(polyTextCol)))

  /** Keep only valid geometry rows (the pipeline-cleaning filter). */
  def validOnly(df: DataFrame, polyTextCol: String): DataFrame =
    withValidation(df, polyTextCol).where(col("geom_error").isNull)
      .drop("geom_error")
}
