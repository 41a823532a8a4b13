package graft.operators

import graft.core._

/** Immutable stabbing index over labeled cell coverings — the Spark-side
  * analogue of the reference's S2CellIndex + S2RegionSharder
  * (/root/reference/src/s2/s2cell_index.h:70-171,
  *  /root/reference/src/s2/s2region_sharder.h:28-71).
  *
  * Each labeled region contributes its covering cells as half-open leaf
  * ranges on the Hilbert order (sign-flipped cell ids, so plain signed
  * comparison is correct across all 6 faces). Lookup of a leaf cell is a
  * binary search + bounded backward scan — O(log n + hits), allocation-free
  * on the miss path.
  *
  * This structure is small (≤ ~1M intervals) and is *broadcast* to
  * executors; it turns a spatial join against a modest region/tile set into
  * a narrow, shuffle-free map over the big table — the plan we want at
  * 100 TB whenever one side fits in memory.
  */
final class CellIntervalIndex private (
    private val lo: Array[Long],      // rangeMin order-key, sorted
    private val hi: Array[Long],      // rangeMax order-key
    private val label: Array[Int],    // region/tile label per interval
    private val cellLevel: Array[Int],// level of the covering cell
    private val interior: Array[Boolean], // cell fully inside region?
    private val maxSpan: Long         // max interval width (scan bound)
) extends Serializable {

  def size: Int = lo.length

  /** a - b saturating at Long.MinValue (face-level intervals span ~2^61,
    * so a plain subtraction underflows near the low end of the order). */
  @inline private def satSub(a: Long, b: Long): Long =
    if (a < Long.MinValue + b) Long.MinValue else a - b

  /** All distinct labels whose covering contains leaf cell `id`
    * (callers pass a *leaf* cell; containment = point stabbing).
    * Appends (label, interior, level) triples via the visitor. */
  def visit(leafOrd: Long)(f: (Int, Boolean, Int) => Unit): Unit = {
    if (lo.length == 0) return
    // rightmost interval with lo <= leafOrd
    var l = 0; var r = lo.length
    while (l < r) { val m = (l + r) >>> 1; if (lo(m) <= leafOrd) l = m + 1 else r = m }
    var i = l - 1
    // intervals are sorted by lo; any containing interval has
    // lo >= leafOrd - maxSpan (since hi - lo <= maxSpan)
    val floor = satSub(leafOrd, maxSpan)
    while (i >= 0 && lo(i) >= floor) {
      if (hi(i) >= leafOrd) f(label(i), interior(i), cellLevel(i))
      i -= 1
    }
  }

  /** Labels containing the leaf cell (distinct, ascending). */
  def labelsContaining(leafOrd: Long): Array[Int] = {
    val out = scala.collection.mutable.SortedSet.empty[Int]
    visit(leafOrd)((lab, _, _) => out += lab)
    out.toArray
  }

  /** (label, interior) pairs; interior=true if ANY covering interval that
    * contains the leaf is an interior cell — lets callers skip the exact
    * refine test (coverer interior-covering optimization). */
  def candidates(leafOrd: Long): Array[(Int, Boolean)] = {
    val m = scala.collection.mutable.SortedMap.empty[Int, Boolean]
    visit(leafOrd)((lab, in, _) => m.update(lab, m.getOrElse(lab, false) || in))
    m.toArray
  }

  /** Most-intersecting label for a covering (S2RegionSharder
    * GetMostIntersectingShard semantics: maximize leaf cells of the
    * intersection; ties → smallest label; miss → default). */
  def mostIntersecting(covering: Array[Long], default: Int): Int = {
    val weights = scala.collection.mutable.SortedMap.empty[Int, Long]
    var k = 0
    while (k < covering.length) {
      val c = covering(k)
      val cLo = S2CellId.orderKey(S2CellId.rangeMin(c))
      val cHi = S2CellId.orderKey(S2CellId.rangeMax(c))
      // overlap of [cLo,cHi] with each interval: find first interval with
      // lo <= cHi, walk back while overlap possible
      if (lo.length > 0) {
        var l = 0; var r = lo.length
        while (l < r) { val m = (l + r) >>> 1; if (lo(m) <= cHi) l = m + 1 else r = m }
        var i = l - 1
        val floor = satSub(cLo, maxSpan)
        while (i >= 0 && lo(i) >= floor) {
          val ovLo = math.max(lo(i), cLo); val ovHi = math.min(hi(i), cHi)
          if (ovLo <= ovHi) {
            // leaf count of overlap: ranges are leaf-aligned inclusive
            val w = (ovHi - ovLo) / 2 + 1 // leaf ids step by 2 in id space
            weights.update(label(i), weights.getOrElse(label(i), 0L) + w)
          }
          i -= 1
        }
      }
      k += 1
    }
    if (weights.isEmpty) default
    else weights.maxBy { case (lab, w) => (w, -lab) }._1
  }

  /** All labels whose covering intersects the given covering. */
  def intersectingLabels(covering: Array[Long]): Array[Int] = {
    val out = scala.collection.mutable.SortedSet.empty[Int]
    var k = 0
    while (k < covering.length) {
      val c = covering(k)
      val cLo = S2CellId.orderKey(S2CellId.rangeMin(c))
      val cHi = S2CellId.orderKey(S2CellId.rangeMax(c))
      if (lo.length > 0) {
        var l = 0; var r = lo.length
        while (l < r) { val m = (l + r) >>> 1; if (lo(m) <= cHi) l = m + 1 else r = m }
        var i = l - 1
        val floor = satSub(cLo, maxSpan)
        while (i >= 0 && lo(i) >= floor) {
          if (math.min(hi(i), cHi) >= math.max(lo(i), cLo)) out += label(i)
          i -= 1
        }
      }
      k += 1
    }
    out.toArray
  }
}

object CellIntervalIndex {
  /** Build from (label, covering, interiorCovering) triples. The interior
    * covering (cells fully inside the region) may be empty; its cells are
    * marked so lookups can skip the exact containment refine. */
  def build(entries: Seq[(Int, Array[Long], Array[Long])]): CellIntervalIndex = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Int, Boolean)]
    for ((lab, covering, interiorCells) <- entries) {
      val interiorSet = interiorCells.toSet
      // interior cells may not be listed in `covering`; index both, marking
      // interior ones. A covering cell that equals an interior cell is
      // indexed once as interior.
      val all = (covering.map(c => (c, interiorSet.contains(c)))
        ++ interiorCells.filterNot(covering.contains).map(c => (c, true)))
      for ((c, isInt) <- all) {
        rows += ((S2CellId.orderKey(S2CellId.rangeMin(c)),
                  S2CellId.orderKey(S2CellId.rangeMax(c)),
                  lab, S2CellId.level(c), isInt))
      }
    }
    val sorted = rows.sortBy(_._1).toArray
    val n = sorted.length
    val lo = new Array[Long](n); val hi = new Array[Long](n)
    val lab = new Array[Int](n); val lvl = new Array[Int](n)
    val inte = new Array[Boolean](n)
    var maxSpan = 0L
    var i = 0
    while (i < n) {
      val (a, b, l, v, t) = sorted(i)
      lo(i) = a; hi(i) = b; lab(i) = l; lvl(i) = v; inte(i) = t
      if (b - a > maxSpan) maxSpan = b - a
      i += 1
    }
    new CellIntervalIndex(lo, hi, lab, lvl, inte, maxSpan)
  }

  /** Build from regions: covering + interior covering via the reference
    * coverer semantics. */
  def fromRegions(regions: Seq[(Int, S2Region)], maxCells: Int = 64,
                  maxLevel: Int = 30): CellIntervalIndex = {
    val cov = new S2RegionCoverer(maxCells, 0, maxLevel)
    build(regions.map { case (lab, r) =>
      (lab, cov.getCovering(r), cov.getInteriorCovering(r))
    })
  }
}
