package graft.core

import S2Coords._

/** S2 cell-id algebra over raw `Long` bit patterns (interpreted as uint64).
  *
  * A cell id is 3 face bits followed by a Hilbert-curve position; the level
  * is encoded by the lowest set bit. Semantics (including every bit of the
  * Hilbert encode/decode) match the reference implementation
  * (/root/reference/src/s2/s2cell_id.h, s2cell_id.cc) so that ids, tokens
  * and neighbor sets are bit-identical to its unit-test goldens.
  *
  * All functions are static over `Long` so they can be called from Catalyst
  * expressions with zero allocation.
  */
object S2CellId {
  final val MaxLevel = 30
  final val FaceBits = 3
  final val NumFaces = 6
  final val PosBits = 2 * MaxLevel + 1 // 61
  final val MaxSize = 1 << MaxLevel
  /** End-of-space marker: 6 faces' worth of positions. */
  final val WrapOffset: Long = NumFaces.toLong << PosBits

  final val None0: Long = 0L
  final val Sentinel: Long = -1L // ~0 = max uint64

  // ---- unsigned comparison helpers --------------------------------------
  @inline def uLt(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) < 0
  @inline def uLe(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) <= 0
  @inline def uGt(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) > 0
  @inline def uGe(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) >= 0
  @inline def uMax(a: Long, b: Long): Long = if (uGe(a, b)) a else b
  /** Order-preserving signed key for an unsigned id (for range joins/sorts). */
  @inline def orderKey(id: Long): Long = id ^ Long.MinValue
  @inline def fromOrderKey(k: Long): Long = k ^ Long.MinValue

  // ---- Hilbert 4-bit-block lookup tables ---------------------------------
  // lookupPos: key (iiiijjjjoo) -> (ppppppppoo); lookupIj is the inverse.
  private final val LookupBits = 4
  val lookupPos: Array[Int] = new Array[Int](1 << (2 * LookupBits + 2))
  val lookupIj: Array[Int] = new Array[Int](1 << (2 * LookupBits + 2))

  private def initLookup(level: Int, i: Int, j: Int, origOrient: Int,
                         pos: Int, orient: Int): Unit = {
    if (level == LookupBits) {
      val ij = (i << LookupBits) + j
      lookupPos((ij << 2) + origOrient) = (pos << 2) + orient
      lookupIj((pos << 2) + origOrient) = (ij << 2) + orient
    } else {
      val l = level + 1; val i2 = i << 1; val j2 = j << 1; val p2 = pos << 2
      val r = PosToIj(orient)
      var k = 0
      while (k < 4) {
        initLookup(l, i2 + (r(k) >> 1), j2 + (r(k) & 1), origOrient,
          p2 + k, orient ^ PosToOrientation(k))
        k += 1
      }
    }
  }
  initLookup(0, 0, 0, 0, 0, 0)
  initLookup(0, 0, 0, SwapMask, 0, SwapMask)
  initLookup(0, 0, 0, InvertMask, 0, InvertMask)
  initLookup(0, 0, 0, SwapMask | InvertMask, 0, SwapMask | InvertMask)

  // ---- basic accessors ----------------------------------------------------
  @inline def lsb(id: Long): Long = id & -id
  @inline def lsbForLevel(level: Int): Long = 1L << (2 * (MaxLevel - level))
  @inline def face(id: Long): Int = (id >>> PosBits).toInt
  @inline def pos(id: Long): Long = id & (-1L >>> FaceBits)
  @inline def level(id: Long): Int =
    MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)
  @inline def isLeaf(id: Long): Boolean = (id & 1L) != 0
  @inline def isFace(id: Long): Boolean = (id & (lsbForLevel(0) - 1)) == 0
  @inline def isValid(id: Long): Boolean =
    face(id) < NumFaces && (lsb(id) & 0x1555555555555555L) != 0

  @inline def sizeIJ(level: Int): Int = 1 << (MaxLevel - level)
  @inline def sizeST(level: Int): Double = ijToSTMin(sizeIJ(level))

  def childPosition(id: Long, level: Int): Int =
    ((id >>> (2 * (MaxLevel - level) + 1)) & 3).toInt

  // ---- hierarchy ----------------------------------------------------------
  def parent(id: Long, level: Int): Long = {
    val newLsb = lsbForLevel(level)
    (id & -newLsb) | newLsb
  }
  def parent(id: Long): Long = {
    val newLsb = lsb(id) << 2
    (id & -newLsb) | newLsb
  }
  def child(id: Long, position: Int): Long = {
    val newLsb = lsb(id) >>> 2
    id + (2L * position + 1 - 4) * newLsb
  }
  def childBegin(id: Long): Long = { val l = lsb(id); id - l + (l >>> 2) }
  def childEnd(id: Long): Long = { val l = lsb(id); id + l + (l >>> 2) }
  def childBegin(id: Long, level: Int): Long = id - lsb(id) + lsbForLevel(level)
  def childEnd(id: Long, level: Int): Long = id + lsb(id) + lsbForLevel(level)

  def rangeMin(id: Long): Long = id - (lsb(id) - 1)
  def rangeMax(id: Long): Long = id + (lsb(id) - 1)
  def contains(id: Long, other: Long): Boolean =
    uGe(other, rangeMin(id)) && uLe(other, rangeMax(id))
  def intersects(id: Long, other: Long): Boolean =
    uLe(rangeMin(other), rangeMax(id)) && uGe(rangeMax(other), rangeMin(id))

  def next(id: Long): Long = id + (lsb(id) << 1)
  def prev(id: Long): Long = id - (lsb(id) << 1)
  def nextWrap(id: Long): Long = {
    val n = next(id); if (uLt(n, WrapOffset)) n else n - WrapOffset
  }
  def prevWrap(id: Long): Long = {
    val p = prev(id); if (uLt(p, WrapOffset)) p else p + WrapOffset
  }

  def fromFace(f: Int): Long = (f.toLong << PosBits) + lsbForLevel(0)
  def fromFacePosLevel(f: Int, p: Long, level: Int): Long =
    parent((f.toLong << PosBits) + (p | 1L), level)

  def begin(level: Int): Long = childBegin(fromFace(0), level)
  def end(level: Int): Long = childEnd(fromFace(5), level)

  def advance(id: Long, stepsIn: Long): Long = {
    if (stepsIn == 0) return id
    var steps = stepsIn
    val stepShift = 2 * (MaxLevel - level(id)) + 1
    if (steps < 0) {
      val minSteps = -(id >>> stepShift)
      if (steps < minSteps) steps = minSteps
    } else {
      val maxSteps = (WrapOffset + lsb(id) - id) >>> stepShift
      if (steps > maxSteps) steps = maxSteps
    }
    id + (steps << stepShift)
  }

  def advanceWrap(id: Long, stepsIn: Long): Long = {
    if (stepsIn == 0) return id
    var steps = stepsIn
    val stepShift = 2 * (MaxLevel - level(id)) + 1
    if (steps < 0) {
      val minSteps = -(id >>> stepShift)
      if (steps < minSteps) {
        val stepWrap = WrapOffset >>> stepShift
        steps %= stepWrap
        if (steps < minSteps) steps += stepWrap
      }
    } else {
      val maxSteps = (WrapOffset - id) >>> stepShift
      if (steps > maxSteps) {
        val stepWrap = WrapOffset >>> stepShift
        steps %= stepWrap
        if (steps > maxSteps) steps -= stepWrap
      }
    }
    id + (steps << stepShift)
  }

  def distanceFromBegin(id: Long): Long =
    id >>> (2 * (MaxLevel - level(id)) + 1)

  /** Largest cell with range_min() == this.range_min() that fits before
    * `limit`; used to tile an id range greedily. */
  def maximumTile(idIn: Long, limit: Long): Long = {
    var id = idIn
    val start = rangeMin(id)
    if (uGe(start, rangeMin(limit))) return limit
    if (uGe(rangeMax(id), limit)) {
      do { id = child(id, 0) } while (uGe(rangeMax(id), limit))
      return id
    }
    while (!isFace(id)) {
      val par = parent(id)
      if (rangeMin(par) != start || uGe(rangeMax(par), limit)) return id
      id = par
    }
    id
  }

  def commonAncestorLevel(id: Long, other: Long): Int = {
    val bits = uMax(id ^ other, uMax(lsb(id), lsb(other)))
    val bitWidth = 64 - java.lang.Long.numberOfLeadingZeros(bits)
    math.max(61 - bitWidth, -1) >> 1
  }

  // ---- encode / decode ----------------------------------------------------
  def fromFaceIJ(f: Int, i: Int, j: Int): Long = {
    var n: Long = f.toLong << (PosBits - 1)
    var bits: Long = (f & SwapMask).toLong
    val mask = (1 << LookupBits) - 1
    var k = 7
    while (k >= 0) {
      bits += ((i >> (k * LookupBits)) & mask).toLong << (LookupBits + 2)
      bits += ((j >> (k * LookupBits)) & mask).toLong << 2
      bits = lookupPos(bits.toInt).toLong
      n |= (bits >>> 2) << (k * 2 * LookupBits)
      bits &= (SwapMask | InvertMask)
      k -= 1
    }
    n * 2 + 1
  }

  def fromPoint(x: Double, y: Double, z: Double): Long = {
    val f = S2Coords.face(x, y, z)
    val u = validFaceXYZtoU(f, x, y, z)
    val v = validFaceXYZtoV(f, x, y, z)
    fromFaceIJ(f, stToIJ(uvToST(u)), stToIJ(uvToST(v)))
  }

  def fromLatLngRadians(lat: Double, lng: Double): Long = {
    val cosLat = math.cos(lat)
    fromPoint(math.cos(lng) * cosLat, math.sin(lng) * cosLat, math.sin(lat))
  }
  def fromLatLngDegrees(lat: Double, lng: Double): Long =
    fromLatLngRadians(math.toRadians(lat), math.toRadians(lng))

  /** Decode id → (face, i, j, orientation); returns packed values via
    * the provided 3-element out array [i, j, orientation] and face in the
    * return value. orientation is filled only if wantOrientation. */
  def toFaceIJOrientation(id: Long, out: Array[Int],
                          wantOrientation: Boolean = false): Int = {
    var i = 0; var j = 0
    val f = face(id)
    var bits = f & SwapMask
    var k = 7
    while (k >= 0) {
      val nbits = if (k == 7) MaxLevel - 7 * LookupBits else LookupBits
      bits += ((id >>> (k * 2 * LookupBits + 1)).toInt &
        ((1 << (2 * nbits)) - 1)) << 2
      bits = lookupIj(bits)
      i += (bits >> (LookupBits + 2)) << (k * LookupBits)
      j += ((bits >> 2) & ((1 << LookupBits) - 1)) << (k * LookupBits)
      bits &= (SwapMask | InvertMask)
      k -= 1
    }
    out(0) = i; out(1) = j
    if (wantOrientation) {
      if ((lsb(id) & 0x1111111111111110L) != 0) bits ^= SwapMask
      out(2) = bits
    }
    f
  }

  /** (face, si, ti) of the cell center. out = [si, ti] as Ints holding
    * values up to 2^31 (use & 0xFFFFFFFFL to read unsigned). */
  def getCenterSiTi(id: Long, out: Array[Long]): Int = {
    val ij = new Array[Int](3)
    val f = toFaceIJOrientation(id, ij)
    val delta =
      if (isLeaf(id)) 1
      else if (((ij(0) ^ (id.toInt >> 2)) & 1) != 0) 2
      else 0
    out(0) = 2L * ij(0) + delta
    out(1) = 2L * ij(1) + delta
    f
  }

  /** Direction vector of the cell center (not unit length). */
  def toPointRaw(id: Long): Array[Double] = {
    val siTi = new Array[Long](2)
    val f = getCenterSiTi(id, siTi)
    faceSiTitoXYZ(f, siTi(0), siTi(1))
  }

  /** Unit-length cell center. */
  def toPoint(id: Long): Array[Double] = {
    val p = toPointRaw(id)
    val n = math.sqrt(p(0) * p(0) + p(1) * p(1) + p(2) * p(2))
    Array(p(0) / n, p(1) / n, p(2) / n)
  }

  def centerLatRadians(id: Long): Double = {
    val p = toPointRaw(id)
    math.atan2(p(2), math.sqrt(p(0) * p(0) + p(1) * p(1)))
  }

  def centerLngRadians(id: Long): Double = {
    val p = toPointRaw(id)
    math.atan2(p(1), p(0))
  }

  def toLatLng(id: Long): (Double, Double) = {
    val p = toPointRaw(id)
    val lat = math.atan2(p(2), math.sqrt(p(0) * p(0) + p(1) * p(1)))
    val lng = math.atan2(p(1), p(0))
    (lat, lng)
  }

  // ---- (u,v) bounds -------------------------------------------------------
  /** Returns [uLo, uHi, vLo, vHi] of the cell. */
  def boundUV(id: Long): Array[Double] = {
    val ij = new Array[Int](3)
    toFaceIJOrientation(id, ij)
    ijLevelToBoundUV(ij(0), ij(1), level(id))
  }

  def ijLevelToBoundUV(i: Int, j: Int, level: Int): Array[Double] = {
    val cellSize = sizeIJ(level)
    val iLo = i & -cellSize; val jLo = j & -cellSize
    Array(
      stToUV(ijToSTMin(iLo)), stToUV(ijToSTMin(iLo + cellSize)),
      stToUV(ijToSTMin(jLo)), stToUV(ijToSTMin(jLo + cellSize)))
  }

  // ---- tokens & debug strings ---------------------------------------------
  private final val HexDigits = "0123456789abcdef"

  def toToken(id: Long): String = {
    if (id == 0) return "X"
    val numZeroDigits = java.lang.Long.numberOfTrailingZeros(id) / 4
    val v = id >>> (4 * numZeroDigits)
    val numDigits = 16 - numZeroDigits
    val sb = new java.lang.StringBuilder(numDigits)
    var k = numDigits - 1
    while (k >= 0) {
      sb.append(HexDigits(((v >>> (4 * k)) & 0xF).toInt))
      k -= 1
    }
    sb.toString
  }

  /** Returns None0 (0) for malformed tokens, matching the reference. */
  def fromToken(token: String): Long = {
    if (token == null || token.length > 16) return None0
    var id = 0L
    var i = 0; var shift = 60
    while (i < token.length) {
      val c = token.charAt(i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return None0
      id |= d.toLong << shift
      i += 1; shift -= 4
    }
    id
  }

  def toDebugString(id: Long): String = {
    if (!isValid(id)) return "Invalid: " + f"${id}%016x"
    val sb = new java.lang.StringBuilder
    sb.append(face(id)).append('/')
    val lvl = level(id)
    var l = 1
    while (l <= lvl) { sb.append(("0123").charAt(childPosition(id, l))); l += 1 }
    sb.toString
  }

  def fromDebugString(str: String): Long = {
    val lvl = str.length - 2
    if (lvl < 0 || lvl > MaxLevel) return None0
    val f = str.charAt(0) - '0'
    if (f < 0 || f > 5 || str.charAt(1) != '/') return None0
    var id = fromFace(f)
    var i = 2
    while (i < str.length) {
      val cp = str.charAt(i) - '0'
      if (cp < 0 || cp > 3) return None0
      id = child(id, cp)
      i += 1
    }
    id
  }

  // ---- neighbors ----------------------------------------------------------
  def fromFaceIJWrap(fIn: Int, iIn: Int, jIn: Int): Long = {
    val i = math.max(-1, math.min(MaxSize, iIn))
    val j = math.max(-1, math.min(MaxSize, jIn))
    val kScale = 1.0 / MaxSize
    val kLimit = 1.0 + 2.220446049250313e-16
    var u = math.max(-kLimit, math.min(kLimit, kScale * (2.0 * (i - MaxSize / 2) + 1)))
    var v = math.max(-kLimit, math.min(kLimit, kScale * (2.0 * (j - MaxSize / 2) + 1)))
    val p = faceUVtoXYZ(fIn, u, v)
    val f = S2Coords.face(p(0), p(1), p(2))
    u = validFaceXYZtoU(f, p(0), p(1), p(2))
    v = validFaceXYZtoV(f, p(0), p(1), p(2))
    fromFaceIJ(f, stToIJ(0.5 * (u + 1)), stToIJ(0.5 * (v + 1)))
  }

  @inline private def fromFaceIJSame(f: Int, i: Int, j: Int, sameFace: Boolean): Long =
    if (sameFace) fromFaceIJ(f, i, j) else fromFaceIJWrap(f, i, j)

  /** Down, right, up, left neighbors at the cell's own level. */
  def edgeNeighbors(id: Long): Array[Long] = {
    val ij = new Array[Int](3)
    val lvl = level(id)
    val size = sizeIJ(lvl)
    val f = toFaceIJOrientation(id, ij)
    val i = ij(0); val j = ij(1)
    Array(
      parent(fromFaceIJSame(f, i, j - size, j - size >= 0), lvl),
      parent(fromFaceIJSame(f, i + size, j, i + size < MaxSize), lvl),
      parent(fromFaceIJSame(f, i, j + size, j + size < MaxSize), lvl),
      parent(fromFaceIJSame(f, i - size, j, i - size >= 0), lvl))
  }

  /** 3-4 neighbors sharing the vertex of this cell closest to it, at
    * `level` < this cell's level. */
  def vertexNeighbors(id: Long, level: Int): Array[Long] = {
    val ij = new Array[Int](3)
    val f = toFaceIJOrientation(id, ij)
    val i = ij(0); val j = ij(1)
    val halfSize = sizeIJ(level + 1)
    val size = halfSize << 1
    var iSame = false; var jSame = false
    var iOffset = 0; var jOffset = 0
    if ((i & halfSize) != 0) { iOffset = size; iSame = (i + size) < MaxSize }
    else { iOffset = -size; iSame = (i - size) >= 0 }
    if ((j & halfSize) != 0) { jOffset = size; jSame = (j + size) < MaxSize }
    else { jOffset = -size; jSame = (j - size) >= 0 }
    val out = scala.collection.mutable.ArrayBuffer[Long](
      parent(id, level),
      parent(fromFaceIJSame(f, i + iOffset, j, iSame), level),
      parent(fromFaceIJSame(f, i, j + jOffset, jSame), level))
    if (iSame || jSame)
      out += parent(fromFaceIJSame(f, i + iOffset, j + jOffset, iSame && jSame), level)
    out.toArray
  }

  /** All neighbors (edge + vertex) of this cell at `nbrLevel` >= level. */
  def allNeighbors(id: Long, nbrLevel: Int): Array[Long] = {
    val ij = new Array[Int](3)
    val f = toFaceIJOrientation(id, ij)
    val size = sizeIJ(level(id))
    val i = ij(0) & -size; val j = ij(1) & -size
    val nbrSize = sizeIJ(nbrLevel)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var k = -nbrSize
    var done = false
    while (!done) {
      var sameFace = false
      if (k < 0) sameFace = (j + k >= 0)
      else if (k >= size) sameFace = (j + k < MaxSize)
      else {
        sameFace = true
        out += parent(fromFaceIJSame(f, i + k, j - nbrSize, j - size >= 0), nbrLevel)
        out += parent(fromFaceIJSame(f, i + k, j + size, j + size < MaxSize), nbrLevel)
      }
      out += parent(fromFaceIJSame(f, i - nbrSize, j + k, sameFace && i - size >= 0), nbrLevel)
      out += parent(fromFaceIJSame(f, i + size, j + k, sameFace && i + size < MaxSize), nbrLevel)
      if (k >= size) done = true else k += nbrSize
    }
    out.toArray
  }
}
