package graft.core

/** Vertex alignment of polylines by dynamic timewarping — exact, windowed,
  * and the coarsen→align→refine approximation — plus the medoid and
  * iterative-barycenter consensus aggregates
  * (/root/reference/src/s2/s2polyline_alignment.h:28-244, cc:40-440).
  *
  * Semantics match the reference: cell cost is the Euclidean chord norm
  * |a(row) − b(col)|, a cell's table cost is min(diag, up, left) + cell
  * cost, ties on the backtrack prefer diagonal then up, and the
  * approximate path halves both polylines recursively, aligns the coarse
  * pair, then refines inside the projected warp path upsampled to full
  * resolution and dilated by `radius` (same size/density switchovers to
  * the exact solver). Costs are sums over warp-path cells, so the approx
  * cost upper-bounds the exact cost and equals it whenever the dilated
  * window contains the true optimum.
  *
  * Scale shape: each alignment is O(window) time and memory and runs
  * per-row inside Spark kernels (trajectory pairs, per-key consensus after
  * a grouped collect); nothing here shuffles.
  */
object PolylineAlignment {

  /** Half-open column range [start, end) filled for one row. */
  final case class Stride(start: Int, end: Int) {
    def inRange(col: Int): Boolean = start <= col && col < end
  }

  final case class VertexAlignment(cost: Double, path: Array[(Int, Int)])

  /** Search window: one column stride per row; monotone non-decreasing
    * starts and ends (s2polyline_alignment_internal.h Window contract). */
  final class Window(val strides: Array[Stride]) {
    val rows: Int = strides.length
    val cols: Int = strides.last.end

    /** Window tightly enclosing a warp path (reference
      * Window(WarpPath) ctor). */
    def this(path: Array[(Int, Int)]) = this {
      val rows = path.last._1 + 1
      val out = new Array[Stride](rows)
      var prevRow = 0; var strideStart = 0; var strideStop = 0
      path.foreach { case (r, c) =>
        if (r > prevRow) {
          out(prevRow) = Stride(strideStart, strideStop)
          strideStart = c
          prevRow = r
        }
        strideStop = c + 1
      }
      out(rows - 1) = Stride(strideStart, strideStop)
      out
    }

    /** Project onto a finer grid (reference Window::Upsample). */
    def upsample(newRows: Int, newCols: Int): Window = {
      val rowScale = newRows.toDouble / rows
      val colScale = newCols.toDouble / cols
      new Window(Array.tabulate(newRows) { row =>
        val from = strides(((row + 0.5) / rowScale).toInt)
        Stride((colScale * from.start + 0.5).toInt,
          (colScale * from.end + 0.5).toInt)
      })
    }

    /** Square dilation by `radius` cells (reference Window::Dilate). */
    def dilate(radius: Int): Window =
      new Window(Array.tabulate(rows) { row =>
        val prevRow = math.max(0, row - radius)
        val nextRow = math.min(row + radius, rows - 1)
        Stride(math.max(0, strides(prevRow).start - radius),
          math.min(strides(nextRow).end + radius, cols))
      })
  }

  @inline private def cellCost(a: Array[V3], b: Array[V3], r: Int, c: Int)
  : Double = {
    val dx = a(r).x - b(c).x; val dy = a(r).y - b(c).y
    val dz = a(r).z - b(c).z
    math.sqrt(dx * dx + dy * dy + dz * dz)
  }

  private def tableCost(row: Int, col: Int, stride: Stride,
                        table: Array[Array[Double]]): Double =
    if (row < 0 && col < 0) 0.0
    else if (row < 0 || col < 0 || !stride.inRange(col)) Double.MaxValue
    else table(row)(col)

  /** DP restricted to `w`; returns cost and the warp path (backtrack ties
    * prefer diagonal, then up — reference DynamicTimewarp). */
  def dynamicTimewarp(a: Array[V3], b: Array[V3], w: Window)
  : VertexAlignment = {
    val rows = a.length; val cols = b.length
    val costs = Array.fill(rows)(new Array[Double](cols))
    var prev = Stride(0, cols) // row -1 bound checks always fail on row<0
    var row = 0
    while (row < rows) {
      val curr = w.strides(row)
      var col = curr.start
      while (col < curr.end) {
        val d = tableCost(row - 1, col - 1, prev, costs)
        val u = tableCost(row - 1, col, prev, costs)
        val l = tableCost(row, col - 1, curr, costs)
        costs(row)(col) = math.min(d, math.min(u, l)) + cellCost(a, b, row, col)
        col += 1
      }
      prev = curr
      row += 1
    }
    val path = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var r = rows - 1; var c = cols - 1
    def strideAt(i: Int): Stride =
      if (i < 0 || i >= rows) Stride(0, 0) else w.strides(i)
    while (r >= 0 && c >= 0) {
      path += ((r, c))
      val d = tableCost(r - 1, c - 1, strideAt(r - 1), costs)
      val u = tableCost(r - 1, c, strideAt(r - 1), costs)
      val l = tableCost(r, c - 1, strideAt(r), costs)
      if (d <= u && d <= l) { r -= 1; c -= 1 }
      else if (u <= l) r -= 1
      else c -= 1
    }
    VertexAlignment(costs(rows - 1)(cols - 1), path.reverseIterator.toArray)
  }

  /** Exact alignment: full window (reference GetExactVertexAlignment). */
  def exactVertexAlignment(a: Array[V3], b: Array[V3]): VertexAlignment =
    dynamicTimewarp(a, b, new Window(Array.fill(a.length)(Stride(0, b.length))))

  /** Constant-space exact cost (reference GetExactVertexAlignmentCost). */
  def exactCost(a: Array[V3], b: Array[V3]): Double = {
    val bn = b.length
    val cost = Array.fill(bn)(Double.MaxValue)
    var leftDiagMin = 0.0
    var row = 0
    while (row < a.length) {
      var col = 0
      while (col < bn) {
        val up = cost(col)
        cost(col) = math.min(leftDiagMin, up) + cellCost(a, b, row, col)
        leftDiagMin = math.min(cost(col), up)
        col += 1
      }
      leftDiagMin = Double.MaxValue
      row += 1
    }
    cost(bn - 1)
  }

  private def halfResolution(in: Array[V3]): Array[V3] =
    Array.tabulate((in.length + 1) / 2)(i => in(2 * i))

  /** Coarsen → align → refine approximation (reference
    * GetApproxVertexAlignment, cc:303-338, incl. the experimentally-derived
    * switchovers to the exact solver). Cost upper-bounds the exact cost. */
  def approxVertexAlignment(a: Array[V3], b: Array[V3], radius: Int)
  : VertexAlignment = {
    val SizeSwitchover = 32
    val DensitySwitchover = 0.85
    val an = a.length; val bn = b.length
    require(an > 0 && bn > 0 && radius >= 0)
    if (an - radius < SizeSwitchover || bn - radius < SizeSwitchover)
      return exactVertexAlignment(a, b)
    if (math.max(an, bn).toLong * (2 * radius + 1) >
        an.toLong * bn * DensitySwitchover)
      return exactVertexAlignment(a, b)
    val proj = approxVertexAlignment(halfResolution(a), halfResolution(b), radius)
    val w = new Window(proj.path).upsample(an, bn).dilate(radius)
    dynamicTimewarp(a, b, w)
  }

  /** Default radius = max(|a|, |b|)^0.25 (reference convenience overload). */
  def approxVertexAlignment(a: Array[V3], b: Array[V3]): VertexAlignment =
    approxVertexAlignment(a, b,
      math.pow(math.max(a.length, b.length), 0.25).toInt)

  private def costFn(a: Array[V3], b: Array[V3], approx: Boolean): Double =
    if (approx) approxVertexAlignment(a, b).cost else exactCost(a, b)

  /** Index of the polyline minimizing summed alignment cost to all others
    * (reference GetMedoidPolyline; symmetric costs computed once). */
  def medoidPolyline(polylines: IndexedSeq[Array[V3]],
                     approx: Boolean = false): Int = {
    require(polylines.nonEmpty)
    val n = polylines.length
    val costs = new Array[Double](n)
    for (i <- 0 until n; j <- i + 1 until n) {
      val c = costFn(polylines(i), polylines(j), approx)
      costs(i) += c
      costs(j) += c
    }
    costs.indexOf(costs.min)
  }

  /** Iterative dynamic-timewarp barycenter averaging (reference
    * GetConsensusPolyline; Petitjean et al. DBA): align the running
    * consensus to every input, average the matched vertices, iterate to
    * convergence or the cap. */
  def consensusPolyline(polylines: IndexedSeq[Array[V3]],
                        iterationCap: Int = 10,
                        seedMedoid: Boolean = false,
                        approx: Boolean = false): Array[V3] = {
    require(polylines.nonEmpty)
    val seed =
      if (seedMedoid) medoidPolyline(polylines, approx) else 0
    var consensus = polylines(seed).clone()
    val n = consensus.length
    var converged = false
    var iter = 0
    while (!converged && iter < iterationCap) {
      val sums = Array.fill(n)(V3(0, 0, 0))
      polylines.foreach { p =>
        val alignment =
          if (approx) approxVertexAlignment(consensus, p)
          else exactVertexAlignment(consensus, p)
        alignment.path.foreach { case (ci, pi) =>
          sums(ci) = sums(ci) + p(pi)
        }
      }
      val next = sums.map(_.normalize)
      converged = next.indices.forall(i => next(i) == consensus(i))
      consensus = next
      iter += 1
    }
    consensus
  }
}
