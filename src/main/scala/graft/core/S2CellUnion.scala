package graft.core

import S2CellId._

/** Operations over sorted, normalized arrays of cell ids ("cell unions").
  * All arrays are sorted in UNSIGNED id order (use orderKey for signed
  * containers). Semantics match reference s2cell_union.cc. */
object S2CellUnion {

  /** Four cells forming a complete sibling group
    * (reference s2cell_union.cc:127-143). */
  @inline private def areSiblings(a: Long, b: Long, c: Long, d: Long): Boolean = {
    if ((a ^ b ^ c) != d) return false
    var mask = lsb(d) << 1
    mask = ~(mask + (mask << 1))
    val dMasked = d & mask
    (a & mask) == dMasked && (b & mask) == dMasked &&
      (c & mask) == dMasked && !isFace(d)
  }

  /** Sort (unsigned) + drop contained cells + merge 4-sibling groups
    * (reference s2cell_union.cc:171-197). */
  def normalize(idsIn: Array[Long]): Array[Long] = {
    val ids = idsIn.map(orderKey).sorted.map(fromOrderKey)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    for (id0 <- ids) {
      var id = id0
      if (!(out.nonEmpty && contains(out.last, id))) {
        while (out.nonEmpty && contains(id, out.last)) out.remove(out.length - 1)
        while (out.length >= 3 && areSiblings(out(out.length - 3),
            out(out.length - 2), out(out.length - 1), id)) {
          id = parent(id)
          out.remove(out.length - 3, 3)
        }
        out += id
      }
    }
    out.toArray
  }

  /** Binary search: does the union contain the single cell id?
    * (reference s2cell_union.cc:289-308). `ids` must be normalized. */
  def containsCellId(ids: Array[Long], id: Long): Boolean = {
    val i = lowerBound(ids, id)
    if (i < ids.length && uLe(rangeMin(ids(i)), id)) return true
    i > 0 && uGe(rangeMax(ids(i - 1)), id)
  }

  def intersectsCellId(ids: Array[Long], id: Long): Boolean = {
    val i = lowerBound(ids, id)
    if (i < ids.length && uLe(rangeMin(ids(i)), rangeMax(id))) return true
    i > 0 && uGe(rangeMax(ids(i - 1)), rangeMin(id))
  }

  /** First index whose id is (unsigned) >= key. */
  def lowerBound(ids: Array[Long], key: Long): Int = {
    var lo = 0; var hi = ids.length
    val k = orderKey(key)
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (orderKey(ids(mid)) < k) lo = mid + 1 else hi = mid
    }
    lo
  }

  def containsUnion(a: Array[Long], b: Array[Long]): Boolean =
    b.forall(id => containsCellId(a, id))

  def intersectsUnion(a: Array[Long], b: Array[Long]): Boolean =
    b.exists(id => intersectsCellId(a, id))

  def union(a: Array[Long], b: Array[Long]): Array[Long] =
    normalize(a ++ b)

  /** First index in [from, ids.length) whose cell does NOT entirely
    * precede `key` (i.e. rangeMax(ids(i)) >= rangeMin(key)). */
  private def skipEntirelyPreceding(ids: Array[Long], from: Int, key: Long): Int = {
    val target = rangeMin(key)
    var lo = from; var hi = ids.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (uLt(rangeMax(ids(mid)), target)) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Sorted-merge intersection exploiting range nesting
    * (reference s2cell_union.cc:355-410). Inputs normalized. */
  def intersection(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val iMin = rangeMin(a(i))
      val jMin = rangeMin(b(j))
      if (uGt(iMin, jMin)) {
        if (uLe(a(i), rangeMax(b(j)))) { out += a(i); i += 1 }
        else j = skipEntirelyPreceding(b, j + 1, a(i))
      } else if (uGt(jMin, iMin)) {
        if (uLe(b(j), rangeMax(a(i)))) { out += b(j); j += 1 }
        else i = skipEntirelyPreceding(a, i + 1, b(j))
      } else {
        if (uLt(a(i), b(j))) { out += a(i); i += 1 }
        else { out += b(j); j += 1 }
      }
    }
    out.toArray
  }

  /** Intersection with a single cell. */
  def intersectionWithCell(ids: Array[Long], id: Long): Array[Long] = {
    if (containsCellId(ids, id)) Array(id)
    else {
      val lo = lowerBound(ids, rangeMin(id))
      val hiKey = orderKey(rangeMax(id))
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      var i = lo
      while (i < ids.length && orderKey(ids(i)) <= hiKey) {
        out += ids(i); i += 1
      }
      out.toArray
    }
  }

  /** a \ b via recursive descent (reference s2cell_union.cc:441-452). */
  def difference(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    def recurse(id: Long): Unit = {
      if (!intersectsCellId(b, id)) out += id
      else if (!containsCellId(b, id)) {
        var k = 0
        while (k < 4) { recurse(child(id, k)); k += 1 }
      }
    }
    a.foreach(recurse)
    out.toArray
  }

  /** Re-split cells to satisfy minLevel/levelMod constraints
    * (reference s2cell_union.cc:199-233). */
  def denormalize(ids: Array[Long], minLevel: Int, levelMod: Int): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    for (id <- ids) {
      val lvl = level(id)
      var newLevel = math.max(minLevel, lvl)
      if (levelMod > 1) {
        newLevel += (MaxLevel - (newLevel - minLevel)) % levelMod
        newLevel = math.min(MaxLevel, newLevel)
      }
      if (newLevel == lvl) out += id
      else {
        val end = childEnd(id, newLevel)
        var c = childBegin(id, newLevel)
        while (c != end) { out += c; c = next(c) }
      }
    }
    out.toArray
  }

  /** Add a buffer of cells at `level` around the union
    * (reference s2cell_union.cc:454-484 Expand(level)). */
  def expand(ids: Array[Long], expandLevel: Int): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val levelLsb = lsbForLevel(expandLevel)
    var i = ids.length - 1
    while (i >= 0) {
      var id = ids(i)
      if (lsb(id) < levelLsb) {
        id = parent(id, expandLevel)
        // Skip over sibling cells we've subsumed.
        while (i > 0 && contains(id, ids(i - 1))) i -= 1
      }
      out += id
      out ++= allNeighbors(id, expandLevel)
      i -= 1
    }
    normalize(out.toArray)
  }

  /** Expand by a minimum radius in radians
    * (reference s2cell_union.cc:466-484). */
  def expandByRadius(ids: Array[Long], minRadius: Double, maxLevelDiff: Int): Array[Long] = {
    var minLevel = MaxLevel
    for (id <- ids) minLevel = math.min(minLevel, level(id))
    val radiusLevel = S2Metrics.MinWidth.levelForMinValue(minRadius)
    var cur = ids
    if (radiusLevel == 0 && minRadius > S2Metrics.MinWidth.value(0)) {
      // Wider than a face cell: expand once extra at the top level.
      cur = expand(cur, 0)
    }
    expand(cur, math.min(minLevel + maxLevelDiff, radiusLevel))
  }

  /** Number of leaf cells covered (reference s2cell_union.cc:486-492). */
  def leafCellsCovered(ids: Array[Long]): Long = {
    // Each cell at level L covers 4^(30-L) leaves = lsb(id)^2 ... use shift:
    var num = 0L
    for (id <- ids) num += 1L << (2 * (MaxLevel - level(id)))
    num
  }

  def averageBasedArea(ids: Array[Long]): Double =
    S2Metrics.AvgArea.value(MaxLevel) * leafCellsCovered(ids)

  def approxArea(ids: Array[Long]): Double =
    ids.map(id => S2Cell(id).approxArea).sum

  def exactArea(ids: Array[Long]): Double =
    ids.map(id => S2Cell(id).exactArea).sum

  /** Wrap a normalized union as a region for covering/joins. */
  def asRegion(ids: Array[Long]): S2Region = new S2CellUnionRegion(ids)
}

/** A normalized cell union as an S2Region
  * (reference s2cell_union.cc:294-345 region methods). */
final class S2CellUnionRegion(val ids: Array[Long]) extends S2Region {
  override def capBound: S2Cap = {
    if (ids.isEmpty) return S2Cap.Empty
    // Compute the approximate centroid, then expand to cover all cells.
    var cx = 0.0; var cy = 0.0; var cz = 0.0
    for (id <- ids) {
      val area = S2Metrics.AvgArea.value(S2CellId.level(id))
      val p = S2CellId.toPoint(id)
      cx += area * p(0); cy += area * p(1); cz += area * p(2)
    }
    var centroid = V3(cx, cy, cz)
    centroid = if (centroid == V3.Zero) V3(1, 0, 0) else centroid.normalize
    var cap = S2Cap.fromPoint(centroid)
    for (id <- ids) cap = cap.addCap(S2Cell(id).capBound)
    cap
  }

  override def rectBound: S2LatLngRect = {
    var bound = S2LatLngRect.Empty
    for (id <- ids) bound = bound.union(S2Cell(id).rectBound)
    bound
  }

  override def cellUnionBound: Array[Long] = ids

  override def containsCell(cell: S2Cell): Boolean =
    S2CellUnion.containsCellId(ids, cell.id)

  override def mayIntersectCell(cell: S2Cell): Boolean =
    S2CellUnion.intersectsCellId(ids, cell.id)

  override def contains(p: V3): Boolean =
    S2CellUnion.containsCellId(ids, S2CellId.fromPoint(p.x, p.y, p.z))
}
