package graft.operators

import graft.core._
import scala.collection.mutable

/** Approximate polygon predicates under an identity snap of radius `tol` —
  * S2Polygon::ApproxContains / ApproxDisjoint / ApproxEquals
  * (/root/reference/src/s2/s2polygon.cc:676-700): A approximately contains
  * B when B's vertices can be moved by at most `tol` so that A contains
  * the moved B. Re-expressed Spark-side as: the EXACT boolean-op residue
  * (difference / intersection / symmetric difference, computed by
  * [[graft.core.S2BooleanOps]]) collapses to nothing under
  * IdentitySnapFunction(tol) semantics — vertices merge into a
  * tol-separated site subset, snapped edges split at sites within tol of
  * them (the S2Builder vertex-on-edge rule, [[Builder.splitEdgesAtSites]]),
  * degenerate edges drop, and sibling pairs cancel. A residue sliver
  * narrower than tol cancels edge-for-edge and the graph empties; any
  * genuine overlap wider than tol leaves surviving edges.
  *
  * The canonical tolerance for residues of boolean operations is
  * 2 * kIntersectionError ([[intersectionMergeRadius]], the reference's
  * S2::kIntersectionMergeRadius) — constructed intersection vertices carry
  * up to kIntersectionError of placement error each. */
object PolygonApprox {

  /** S2::kIntersectionMergeRadius (s2edge_crossings.h): the snap radius
    * that absorbs the placement error of two constructed intersection
    * points. */
  val intersectionMergeRadius: Double =
    2 * S2EdgeIntersections.IntersectionErrorRadians

  /** True if moving B's vertices by at most `tolRadians` can make A
    * contain B (s2polygon.cc:676 — empty difference B−A under the snap). */
  def approxContains(a: S2Polygon, b: S2Polygon, tolRadians: Double): Boolean =
    collapses(S2BooleanOps.difference(b, a), tolRadians)

  /** True if moving the vertices by at most `tolRadians` can make A and B
    * disjoint (s2polygon.cc:682 — empty intersection under the snap). */
  def approxDisjoint(a: S2Polygon, b: S2Polygon, tolRadians: Double): Boolean =
    collapses(S2BooleanOps.intersection(b, a), tolRadians)

  /** True if the polygons are equal up to a `tolRadians` vertex
    * perturbation (s2polygon.cc:688 — empty symmetric difference under
    * the snap). */
  def approxEquals(a: S2Polygon, b: S2Polygon, tolRadians: Double): Boolean =
    collapses(S2BooleanOps.symmetricDifference(a, b), tolRadians)

  /** True when every boundary edge of `p` cancels after the identity snap
    * at radius `tol` (see object doc for the mechanism). */
  private[operators] def collapses(p: S2Polygon, tol: Double): Boolean = {
    if (p.isEmpty) return true
    if (p.isFull || tol <= 0) return false
    // squared chord length of the angular snap radius
    val chord2 = { val s = math.sin(0.5 * math.min(math.Pi, tol)); 4 * s * s }
    // directed interior-left edges of the residue (shells as written,
    // holes reversed — same convention as the boolean-op clipper)
    val direct = mutable.ArrayBuffer.empty[(V3, V3)]
    p.loops.zipWithIndex.foreach { case (l, li) =>
      if (!l.isEmptyOrFull) {
        if (p.loopSigns(li) > 0)
          for (i <- 0 until l.numVertices) direct += ((l.vertex(i), l.vertex(i + 1)))
        else
          for (i <- 0 until l.numVertices) direct += ((l.vertex(i + 1), l.vertex(i)))
      }
    }
    // greedy tol-separated site subset in input order (IdentitySnapFunction
    // site selection); every vertex snaps to the first site within tol.
    // Residues are small driver-side geometry, so the linear site scan is
    // fine; large soups go through Builder.assemblePolygon instead.
    val sites = mutable.ArrayBuffer.empty[V3]
    val siteOf = mutable.HashMap.empty[V3, V3]
    def snapV(v: V3): V3 = siteOf.getOrElseUpdate(v,
      sites.find(s => (s - v).norm2 <= chord2).getOrElse { sites += v; v })
    val snapped = direct.iterator
      .map { case (u, v) => (snapV(u), snapV(v)) }
      .filter { case (u, v) => u != v }
      .toSeq
    val split = Builder.splitEdgesAtSites(snapped, sites.toArray, tol)
    Builder.cancelSiblings(split).isEmpty
  }
}
