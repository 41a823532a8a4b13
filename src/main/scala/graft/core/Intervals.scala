package graft.core

/** Closed interval on the real line; empty = (lo > hi).
  * Matches the reference r1interval.h semantics. */
final case class R1Interval(lo: Double, hi: Double) {
  def isEmpty: Boolean = lo > hi
  def length: Double = hi - lo
  def center: Double = 0.5 * (lo + hi)
  def contains(p: Double): Boolean = p >= lo && p <= hi
  def interiorContains(p: Double): Boolean = p > lo && p < hi
  def contains(y: R1Interval): Boolean =
    if (y.isEmpty) true else y.lo >= lo && y.hi <= hi
  def interiorContains(y: R1Interval): Boolean =
    if (y.isEmpty) true else y.lo > lo && y.hi < hi
  def intersects(y: R1Interval): Boolean =
    if (lo <= y.lo) y.lo <= hi && y.lo <= y.hi
    else lo <= y.hi && lo <= hi
  def interiorIntersects(y: R1Interval): Boolean =
    y.lo < hi && lo < y.hi && lo < hi && y.lo <= y.hi
  def addPoint(p: Double): R1Interval =
    if (isEmpty) R1Interval(p, p)
    else if (p < lo) R1Interval(p, hi)
    else if (p > hi) R1Interval(lo, p)
    else this
  def expanded(margin: Double): R1Interval = {
    if (isEmpty) this
    else {
      val r = R1Interval(lo - margin, hi + margin)
      if (r.isEmpty) R1Interval.Empty else r
    }
  }
  def union(y: R1Interval): R1Interval =
    if (isEmpty) y
    else if (y.isEmpty) this
    else R1Interval(math.min(lo, y.lo), math.max(hi, y.hi))
  def intersection(y: R1Interval): R1Interval =
    R1Interval(math.max(lo, y.lo), math.min(hi, y.hi))
  def setLo(p: Double): R1Interval = R1Interval(p, hi)
  def setHi(p: Double): R1Interval = R1Interval(lo, p)

  /** Directed Hausdorff distance to `y`: max over points of this of the
    * distance to y (reference r1interval.h:144-148). */
  def directedHausdorffDistance(y: R1Interval): Double =
    if (isEmpty) 0.0
    else if (y.isEmpty) Double.PositiveInfinity
    else math.max(0.0, math.max(hi - y.hi, y.lo - lo))
}
object R1Interval {
  val Empty: R1Interval = R1Interval(1, 0)
  def fromPointPair(p1: Double, p2: Double): R1Interval =
    if (p1 <= p2) R1Interval(p1, p2) else R1Interval(p2, p1)
}

/** Closed interval on the unit circle (longitudes, radians in [-Pi,Pi]);
  * inverted (lo > hi) = wraps through Pi. Matches the reference
  * s1interval.h/cc exactly, including the ±Pi normalization rules. */
final case class S1Interval(lo: Double, hi: Double) {
  import S1Interval._
  def isFull: Boolean = lo == -math.Pi && hi == math.Pi
  def isEmpty: Boolean = lo == math.Pi && hi == -math.Pi
  def isInverted: Boolean = lo > hi

  def center: Double = {
    val c = 0.5 * (lo + hi)
    if (!isInverted) c
    else if (c <= 0) c + math.Pi
    else c - math.Pi
  }

  def length: Double = {
    var l = hi - lo
    if (l >= 0) l
    else {
      l += 2 * math.Pi
      if (l > 0) l else -1
    }
  }

  def complement: S1Interval =
    if (lo == hi) S1Interval.Full else S1Interval(hi, lo)

  def complementCenter: Double =
    if (lo != hi) complement.center
    else if (hi <= 0) hi + math.Pi
    else hi - math.Pi

  private[core] def fastContains(p: Double): Boolean =
    if (isInverted) (p >= lo || p <= hi) && !isEmpty
    else p >= lo && p <= hi

  def contains(pIn: Double): Boolean = {
    val p = if (pIn == -math.Pi) math.Pi else pIn
    fastContains(p)
  }

  def interiorContains(pIn: Double): Boolean = {
    val p = if (pIn == -math.Pi) math.Pi else pIn
    if (isInverted) p > lo || p < hi
    else (p > lo && p < hi) || isFull
  }

  def contains(y: S1Interval): Boolean =
    if (isInverted) {
      if (y.isInverted) y.lo >= lo && y.hi <= hi
      else (y.lo >= lo || y.hi <= hi) && !isEmpty
    } else {
      if (y.isInverted) isFull || y.isEmpty
      else y.lo >= lo && y.hi <= hi
    }

  def interiorContains(y: S1Interval): Boolean =
    if (isInverted) {
      if (!y.isInverted) y.lo > lo || y.hi < hi
      else (y.lo > lo && y.hi < hi) || y.isEmpty
    } else {
      if (y.isInverted) isFull || y.isEmpty
      else (y.lo > lo && y.hi < hi) || isFull
    }

  def intersects(y: S1Interval): Boolean =
    if (isEmpty || y.isEmpty) false
    else if (isInverted) y.isInverted || y.lo <= hi || y.hi >= lo
    else if (y.isInverted) y.lo <= hi || y.hi >= lo
    else y.lo <= hi && y.hi >= lo

  def interiorIntersects(y: S1Interval): Boolean =
    if (isEmpty || y.isEmpty || lo == hi) false
    else if (isInverted) y.isInverted || y.lo < hi || y.hi > lo
    else if (y.isInverted) y.lo < hi || y.hi > lo
    else (y.lo < hi && y.hi > lo) || isFull

  def addPoint(pIn: Double): S1Interval = {
    val p = if (pIn == -math.Pi) math.Pi else pIn
    if (fastContains(p)) this
    else if (isEmpty) S1Interval(p, p)
    else {
      val dlo = positiveDistance(p, lo)
      val dhi = positiveDistance(hi, p)
      if (dlo < dhi) S1Interval(p, hi) else S1Interval(lo, p)
    }
  }

  def expanded(margin: Double): S1Interval = {
    if (margin >= 0) {
      if (isEmpty) return this
      if (length + 2 * margin + 2 * S2Predicates.DblEpsilon >= 2 * math.Pi)
        return Full
    } else {
      if (isFull) return this
      if (length + 2 * margin - 2 * S2Predicates.DblEpsilon <= 0)
        return Empty
    }
    val rLo = math.IEEEremainder(lo - margin, 2 * math.Pi)
    val rHi = math.IEEEremainder(hi + margin, 2 * math.Pi)
    val result = S1Interval.checked(rLo, rHi)
    if (result.lo <= -math.Pi) S1Interval.checked(math.Pi, result.hi)
    else result
  }

  def union(y: S1Interval): S1Interval = {
    if (y.isEmpty) this
    else if (fastContains(y.lo)) {
      if (fastContains(y.hi)) { if (contains(y)) this else Full }
      else S1Interval.checked(lo, y.hi)
    } else if (fastContains(y.hi)) S1Interval.checked(y.lo, hi)
    else if (isEmpty || y.fastContains(lo)) y
    else {
      val dlo = positiveDistance(y.hi, lo)
      val dhi = positiveDistance(hi, y.lo)
      if (dlo < dhi) S1Interval.checked(y.lo, hi)
      else S1Interval.checked(lo, y.hi)
    }
  }

  def intersection(y: S1Interval): S1Interval = {
    if (y.isEmpty) Empty
    else if (fastContains(y.lo)) {
      if (fastContains(y.hi)) { if (y.length < length) y else this }
      else S1Interval.checked(y.lo, hi)
    } else if (fastContains(y.hi)) S1Interval.checked(lo, y.hi)
    else if (y.fastContains(lo)) this
    else Empty
  }

  def project(pIn: Double): Double = {
    val p = if (pIn == -math.Pi) math.Pi else pIn
    if (fastContains(p)) p
    else {
      val dlo = positiveDistance(p, lo)
      val dhi = positiveDistance(hi, p)
      if (dlo < dhi) lo else hi
    }
  }

  /** Directed Hausdorff distance to `y` on the circle: max over points of
    * this of the angular distance to y (reference s1interval.cc:145-162 —
    * realized either inside y's complement center or at matching hi/lo
    * endpoint pairs). */
  def directedHausdorffDistance(y: S1Interval): Double = {
    if (y.contains(this)) 0.0 // includes the case where this is empty
    else if (y.isEmpty) math.Pi // maximum possible distance on S1
    else {
      val yc = y.complementCenter
      if (contains(yc)) positiveDistance(y.hi, yc)
      else {
        val hiHi =
          if (S1Interval(y.hi, yc).contains(hi)) positiveDistance(y.hi, hi)
          else 0.0
        val loLo =
          if (S1Interval(yc, y.lo).contains(lo)) positiveDistance(lo, y.lo)
          else 0.0
        math.max(hiHi, loLo)
      }
    }
  }
}

object S1Interval {
  val Empty: S1Interval = S1Interval(math.Pi, -math.Pi)
  val Full: S1Interval = S1Interval(-math.Pi, math.Pi)

  /** Construct without the ±Pi fixups (already-normalized args). */
  private[core] def checked(lo: Double, hi: Double): S1Interval =
    new S1Interval(lo, hi)

  /** The public constructor semantics: ±Pi are identified. */
  def normalized(loIn: Double, hiIn: Double): S1Interval = {
    var lo = loIn; var hi = hiIn
    if (lo == -math.Pi && hi != math.Pi) lo = math.Pi
    if (hi == -math.Pi && lo != math.Pi) hi = math.Pi
    S1Interval(lo, hi)
  }

  def fromPoint(pIn: Double): S1Interval = {
    val p = if (pIn == -math.Pi) math.Pi else pIn
    S1Interval(p, p)
  }

  def fromPointPair(p1In: Double, p2In: Double): S1Interval = {
    val p1 = if (p1In == -math.Pi) math.Pi else p1In
    val p2 = if (p2In == -math.Pi) math.Pi else p2In
    if (positiveDistance(p1, p2) <= math.Pi) S1Interval(p1, p2)
    else S1Interval(p2, p1)
  }

  @inline def positiveDistance(a: Double, b: Double): Double = {
    val d = b - a
    if (d >= 0) d else (b + math.Pi) - (a - math.Pi)
  }
}
