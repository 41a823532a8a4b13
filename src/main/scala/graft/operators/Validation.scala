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
    * NOTE: the self-intersection scan is O(n²) in edge count — sized for
    * per-row geometry (≤ ~10³ vertices). The reference prunes candidate
    * pairs through its shape index for larger loops; batch-validating big
    * geometry should pre-filter candidates with [[CellIntervalIndex]]
    * coverings the same way. */
  def validateLoop(vertices: Array[V3]): Option[String] = {
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
    var a = 0
    while (a < n) {
      val a2 = (a + 1) % n
      var b = a + 1
      while (b < n) {
        val b2 = (b + 1) % n
        val adjacent = a2 == b || b2 == a || a == b
        if (!adjacent &&
            S2EdgeCrossings.crossingSign(vertices(a), vertices(a2),
              vertices(b), vertices(b2)) > 0)
          return Some("SELF_INTERSECTION")
        b += 1
      }
      a += 1
    }
    None
  }

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
