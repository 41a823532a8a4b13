package graft.core

import scala.collection.mutable.ArrayBuffer

/** Deterministic region → cell-union approximation, replicating the
  * reference's best-first refinement exactly (s2region_coverer.cc:144-331):
  * identical candidate generation, identical priority function
  * -(((level << 2k) + numChildren) << 2k + numTerminals), and identical
  * tie-break order (the priority queue replicates libstdc++'s
  * push_heap/pop_heap so equal-priority candidates pop in the same order).
  */
final class S2RegionCoverer(val maxCells: Int = 8,
                            val minLevel: Int = 0,
                            val maxLevel: Int = S2CellId.MaxLevel,
                            val levelMod: Int = 1) {
  require(minLevel >= 0 && maxLevel <= S2CellId.MaxLevel && minLevel <= maxLevel)
  require(levelMod >= 1 && levelMod <= 3)

  private def trueMaxLevel: Int =
    if (levelMod == 1) maxLevel
    else maxLevel - (maxLevel - minLevel) % levelMod

  private def maxChildrenShift: Int = 2 * levelMod

  private final class Candidate(val cell: S2Cell, maxChildren: Int) {
    var isTerminal: Boolean = maxChildren == 0
    var numChildren: Int = 0
    val children: Array[Candidate] =
      if (maxChildren == 0) null else new Array[Candidate](maxChildren)
  }

  // ---- libstdc++-compatible max-heap on (priority, insertion payload) ----
  private final class GnuHeap {
    private val heap = ArrayBuffer[(Int, Candidate)]()
    def size: Int = heap.length
    def isEmpty: Boolean = heap.isEmpty
    def top: (Int, Candidate) = heap(0)

    @inline private def less(a: (Int, Candidate), b: (Int, Candidate)): Boolean =
      a._1 < b._1

    def push(value: (Int, Candidate)): Unit = {
      heap += value
      // __push_heap: sift the hole up while parent < value.
      var holeIndex = heap.length - 1
      var parent = (holeIndex - 1) / 2
      while (holeIndex > 0 && less(heap(parent), value)) {
        heap(holeIndex) = heap(parent)
        holeIndex = parent
        parent = (holeIndex - 1) / 2
      }
      heap(holeIndex) = value
    }

    def pop(): (Int, Candidate) = {
      val result = heap(0)
      val value = heap(heap.length - 1)
      heap.remove(heap.length - 1)
      if (heap.nonEmpty) adjustHeap(0, heap.length, value)
      result
    }

    // libstdc++ __adjust_heap: walk the hole down along max-children,
    // then sift the displaced value back up.
    private def adjustHeap(holeIndexIn: Int, len: Int, value: (Int, Candidate)): Unit = {
      val topIndex = holeIndexIn
      var holeIndex = holeIndexIn
      var secondChild = holeIndex
      while (secondChild < (len - 1) / 2) {
        secondChild = 2 * (secondChild + 1)
        if (less(heap(secondChild), heap(secondChild - 1))) secondChild -= 1
        heap(holeIndex) = heap(secondChild)
        holeIndex = secondChild
      }
      if ((len & 1) == 0 && secondChild == (len - 2) / 2) {
        secondChild = 2 * (secondChild + 1)
        heap(holeIndex) = heap(secondChild - 1)
        holeIndex = secondChild - 1
      }
      // __push_heap(first, holeIndex, topIndex, value)
      var parent = (holeIndex - 1) / 2
      while (holeIndex > topIndex && less(heap(parent), value)) {
        heap(holeIndex) = heap(parent)
        holeIndex = parent
        parent = (holeIndex - 1) / 2
      }
      heap(holeIndex) = value
    }
  }

  private var region: S2Region = _
  private var interiorCovering = false
  private var result: ArrayBuffer[Long] = _
  private var pq: GnuHeap = _

  private def newCandidate(cell: S2Cell): Candidate = {
    if (!region.mayIntersectCell(cell)) return null
    var isTerminal = false
    if (cell.level >= minLevel) {
      if (interiorCovering) {
        if (region.containsCell(cell)) isTerminal = true
        else if (cell.level + levelMod > maxLevel) return null
      } else {
        if (cell.level + levelMod > maxLevel || region.containsCell(cell))
          isTerminal = true
      }
    }
    new Candidate(cell, if (isTerminal) 0 else 1 << maxChildrenShift)
  }

  private def expandChildren(candidate: Candidate, cell: S2Cell,
                             numLevelsIn: Int): Int = {
    val numLevels = numLevelsIn - 1
    var numTerminals = 0
    var childId = S2CellId.childBegin(cell.id)
    var i = 0
    while (i < 4) {
      val childCell = S2Cell(childId)
      if (numLevels > 0) {
        if (region.mayIntersectCell(childCell)) {
          numTerminals += expandChildren(candidate, childCell, numLevels)
        }
      } else {
        val child = newCandidate(childCell)
        if (child != null) {
          candidate.children(candidate.numChildren) = child
          candidate.numChildren += 1
          if (child.isTerminal) numTerminals += 1
        }
      }
      childId = S2CellId.next(childId)
      i += 1
    }
    numTerminals
  }

  private def addCandidate(candidate: Candidate): Unit = {
    if (candidate == null) return
    if (candidate.isTerminal) {
      result += candidate.cell.id
      return
    }
    val numLevels = if (candidate.cell.level < minLevel) 1 else levelMod
    val numTerminals = expandChildren(candidate, candidate.cell, numLevels)
    if (candidate.numChildren == 0) ()
    else if (!interiorCovering && numTerminals == (1 << maxChildrenShift) &&
             candidate.cell.level >= minLevel) {
      candidate.isTerminal = true
      addCandidate(candidate)
    } else {
      val priority = -((((candidate.cell.level << maxChildrenShift) +
        candidate.numChildren) << maxChildrenShift) + numTerminals)
      pq.push((priority, candidate))
    }
  }

  private def adjustLevel(level: Int): Int =
    if (levelMod > 1 && level > minLevel)
      level - (level - minLevel) % levelMod
    else level

  private def adjustCellLevels(cells: Array[Long]): Array[Long] = {
    if (levelMod == 1) return cells
    val out = ArrayBuffer[Long]()
    for (idIn <- cells) {
      var id = idIn
      val lvl = S2CellId.level(id)
      val newLevel = adjustLevel(lvl)
      if (newLevel != lvl) id = S2CellId.parent(id, newLevel)
      if (!(out.nonEmpty && S2CellId.contains(out.last, id))) {
        while (out.nonEmpty && S2CellId.contains(id, out.last))
          out.remove(out.length - 1)
        out += id
      }
    }
    out.toArray
  }

  private def getInitialCandidates(): Unit = {
    val tmp = new S2RegionCoverer(math.min(4, maxCells), 0, maxLevel, 1)
    val cells = adjustCellLevels(tmp.getFastCovering(region))
    for (id <- cells) addCandidate(newCandidate(S2Cell(id)))
  }

  private def getCoveringInternal(r: S2Region): Array[Long] = {
    region = r
    result = ArrayBuffer[Long]()
    pq = new GnuHeap
    getInitialCandidates()
    while (!pq.isEmpty && (!interiorCovering || result.length < maxCells)) {
      val candidate = pq.pop()._2
      if (interiorCovering || candidate.cell.level < minLevel ||
          candidate.numChildren == 1 ||
          result.length + pq.size + candidate.numChildren <= maxCells) {
        var i = 0
        while (i < candidate.numChildren) {
          if (!(interiorCovering && result.length >= maxCells)) {
            addCandidate(candidate.children(i))
          }
          i += 1
        }
      } else {
        candidate.isTerminal = true
        addCandidate(candidate)
      }
    }
    region = null
    var out = S2CellUnion.normalize(result.toArray)
    if (minLevel > 0 || levelMod > 1)
      out = S2CellUnion.denormalize(out, minLevel, levelMod)
    out
  }

  def getCovering(r: S2Region): Array[Long] = {
    interiorCovering = false
    getCoveringInternal(r)
  }

  def getInteriorCovering(r: S2Region): Array[Long] = {
    interiorCovering = true
    getCoveringInternal(r)
  }

  def getFastCovering(r: S2Region): Array[Long] = {
    canonicalizeCovering(r.cellUnionBound)
  }

  def isCanonical(covering: Array[Long]): Boolean = {
    import S2CellId._
    val maxLvl = trueMaxLevel
    val tooManyCells = covering.length > maxCells
    var sameParentCount = 1
    var prevId = 0L
    var havePrev = false
    for (id <- covering) {
      if (!isValid(id)) return false
      val lvl = level(id)
      if (lvl < minLevel || lvl > maxLvl) return false
      if (levelMod > 1 && (lvl - minLevel) % levelMod != 0) return false
      if (havePrev) {
        if (uGe(rangeMax(prevId), rangeMin(id))) return false
        if (tooManyCells && commonAncestorLevel(id, prevId) >= minLevel)
          return false
        val plevel = lvl - levelMod
        if (plevel < minLevel || lvl != level(prevId) ||
            parent(id, plevel) != parent(prevId, plevel)) {
          sameParentCount = 1
        } else {
          sameParentCount += 1
          if (sameParentCount == (1 << (2 * levelMod))) return false
        }
      }
      prevId = id
      havePrev = true
    }
    true
  }

  private def containsAllChildren(covering: ArrayBuffer[Long], id: Long): Boolean = {
    import S2CellId._
    var it = lowerBoundBuf(covering, rangeMin(id))
    val lvl = level(id) + levelMod
    var child = childBegin(id, lvl)
    val end = childEnd(id, lvl)
    while (child != end) {
      if (it >= covering.length || covering(it) != child) return false
      it += 1
      child = next(child)
    }
    true
  }

  private def lowerBoundBuf(buf: ArrayBuffer[Long], key: Long): Int = {
    var lo = 0; var hi = buf.length
    val k = S2CellId.orderKey(key)
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (S2CellId.orderKey(buf(mid)) < k) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def upperBoundBuf(buf: ArrayBuffer[Long], key: Long): Int = {
    var lo = 0; var hi = buf.length
    val k = S2CellId.orderKey(key)
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (S2CellId.orderKey(buf(mid)) <= k) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def replaceCellsWithAncestor(covering: ArrayBuffer[Long], id: Long): Unit = {
    import S2CellId._
    val begin = lowerBoundBuf(covering, rangeMin(id))
    val end = upperBoundBuf(covering, rangeMax(id))
    covering.remove(begin + 1, end - begin - 1)
    covering(begin) = id
  }

  /** Enforce sort/level/max-cells constraints on an arbitrary covering
    * (reference s2region_coverer.cc:389-486). */
  def canonicalizeCovering(coveringIn: Array[Long]): Array[Long] = {
    import S2CellId._
    var ids = coveringIn
    if (maxLevel < MaxLevel || levelMod > 1) {
      ids = ids.map { id =>
        val lvl = level(id)
        val newLevel = adjustLevel(math.min(lvl, maxLevel))
        if (newLevel != lvl) parent(id, newLevel) else id
      }
    }
    ids = S2CellUnion.normalize(ids)
    if (minLevel > 0 || levelMod > 1)
      ids = S2CellUnion.denormalize(ids, minLevel, levelMod)
    val excess = ids.length - maxCells
    if (excess <= 0 || isCanonical(ids)) return ids
    if (excess.toLong * ids.length > 10000) {
      interiorCovering = false
      return getCoveringInternal(S2CellUnion.asRegion(ids))
    }
    val covering = ArrayBuffer[Long](ids: _*)
    var break = false
    while (!break && covering.length > maxCells) {
      var bestIndex = -1
      var bestLevel = -1
      var i = 0
      while (i + 1 < covering.length) {
        var lvl = commonAncestorLevel(covering(i), covering(i + 1))
        lvl = adjustLevel(lvl)
        if (lvl > bestLevel) { bestLevel = lvl; bestIndex = i }
        i += 1
      }
      if (bestLevel < minLevel) break = true
      else {
        var id = parent(covering(bestIndex), bestLevel)
        replaceCellsWithAncestor(covering, id)
        var innerBreak = false
        var lvl = bestLevel
        while (!innerBreak && lvl > minLevel) {
          lvl -= levelMod
          id = parent(id, lvl)
          if (!containsAllChildren(covering, id)) innerBreak = true
          else replaceCellsWithAncestor(covering, id)
        }
      }
    }
    covering.toArray
  }
}

object S2RegionCoverer {
  /** Convenience: default-options covering. */
  def covering(r: S2Region, maxCells: Int = 8, minLevel: Int = 0,
               maxLevel: Int = S2CellId.MaxLevel, levelMod: Int = 1): Array[Long] =
    new S2RegionCoverer(maxCells, minLevel, maxLevel, levelMod).getCovering(r)

  /** BFS covering at a fixed level from a seed cell
    * (reference s2region_coverer.cc:488-516). */
  def simpleCovering(r: S2Region, start: V3, level: Int): Array[Long] = {
    val startCell = S2CellId.parent(S2CellId.fromPoint(start.x, start.y, start.z), level)
    val all = scala.collection.mutable.HashSet[Long](startCell)
    val frontier = scala.collection.mutable.Queue[Long](startCell)
    val output = ArrayBuffer[Long]()
    while (frontier.nonEmpty) {
      val id = frontier.dequeue()
      if (r.mayIntersectCell(S2Cell(id))) {
        output += id
        for (nbr <- S2CellId.edgeNeighbors(id)) {
          if (!all.contains(nbr)) {
            all += nbr
            frontier.enqueue(nbr)
          }
        }
      }
    }
    output.toArray
  }
}
