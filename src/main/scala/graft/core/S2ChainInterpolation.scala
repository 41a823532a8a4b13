package graft.core

/** Distance-parameterized interpolation along a (possibly multi-chain)
  * shape — S2ChainInterpolationQuery semantics
  * (/root/reference/src/s2/s2chain_interpolation_query.h:43-131):
  * cumulative geodesic lengths are precomputed per edge, `atDistance`
  * binary-searches the edge containing the target distance and
  * interpolates inside it, input distances are clamped to [0, length],
  * and the result reports the point, the global edge index, and the
  * clamped distance actually used. `atFraction` is the fraction·length
  * convenience; chains are concatenated in order for whole-shape queries
  * (the reference's chain_id = -1 case), with per-chain queries available
  * through `chainBounds`.
  */
final class S2ChainInterpolation(chains: Seq[Array[V3]]) extends Serializable {

  /** (chain, i) edges flattened in chain order. */
  private val edges: Array[(V3, V3)] = chains.iterator.flatMap { c =>
    (1 until c.length).iterator.map(i => (c(i - 1), c(i)))
  }.toArray

  /** cumLen(e) = length of edges [0, e] inclusive. */
  private val cumLen: Array[Double] = {
    val out = new Array[Double](edges.length)
    var acc = 0.0
    var i = 0
    while (i < edges.length) {
      acc += edges(i)._1.angle(edges(i)._2)
      out(i) = acc
      i += 1
    }
    out
  }

  /** [first, last) global edge range of each chain. */
  val chainBounds: Seq[(Int, Int)] = {
    var from = 0
    chains.map { c =>
      val n = math.max(0, c.length - 1)
      val r = (from, from + n); from += n; r
    }
  }

  /** Total geodesic length (radians). */
  def length: Double = if (cumLen.isEmpty) 0.0 else cumLen.last

  /** Cumulative length at the END of global edge e (reference
    * GetLengthAtEdgeEnd). */
  def lengthAtEdgeEnd(e: Int): Double = cumLen(e)

  final case class Result(point: V3, edge: Int, distance: Double)

  /** Point at `distance` radians along the concatenated chains (clamped
    * to [0, length]); None iff the shape has no edges. */
  def atDistance(distance: Double): Option[Result] = {
    if (edges.isEmpty) return None
    val d = math.max(0.0, math.min(length, distance))
    // first edge whose cumulative end >= d
    var lo = 0; var hi = cumLen.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cumLen(mid) < d) lo = mid + 1 else hi = mid
    }
    val e = lo
    val start = if (e == 0) 0.0 else cumLen(e - 1)
    val segLen = cumLen(e) - start
    val (u, v) = edges(e)
    val p =
      if (segLen <= 0) u
      else S2EdgeDistances.interpolate(u, v, (d - start) / segLen)
    Some(Result(p, e, d))
  }

  /** Point at `fraction` of the total length (reference AtFraction). */
  def atFraction(fraction: Double): Option[Result] =
    atDistance(fraction * length)
}
