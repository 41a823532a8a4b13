package graft.core

/** Compact point-sequence codec — the Spark-first re-expression of the
  * reference's point-compression family (EncodedS2PointVector /
  * s2point_compression.{h,cc}: point chains snapped to level-L cell
  * centers whose positions are encoded as Hilbert-curve deltas, ~4 bits
  * per vertex for spatially-coherent chains). Re-expressed, not
  * byte-copied: same capability — cell-center snapping + curve-position
  * delta coding, 1-3 bytes/vertex on coherent chains vs 24 bytes raw —
  * in an own little format:
  *
  *   [version: 1 byte][level: 1 byte][count: varint]
  *   [first curve position: varint][zigzag-varint position deltas]*
  *
  * The curve position of a level-L cell is its (face ++ Hilbert-curve)
  * prefix, i.e. `id >>> (2*(30-L)+1)` — consecutive chain vertices are
  * curve-near, so deltas are small and varints short. Decoding returns
  * the EXACT snapped cell centers (`S2CellId.toPoint` is deterministic),
  * so encode→decode is lossless on snapped chains; callers needing
  * unsnapped exactness keep raw doubles (Parquet columns supersede the
  * reference's exception machinery — the agreed scoping note in SURVEY
  * §8 — this codec covers the in-flight/compact-storage use).
  */
object S2PointCodec {
  val Version: Int = 1

  /** Snap points to level-`level` cell centers (the codec's domain). */
  def snap(points: Array[V3], level: Int): Array[V3] =
    cellsOf(points, level).map { id =>
      val p = S2CellId.toPoint(id); V3(p(0), p(1), p(2))
    }

  def cellsOf(points: Array[V3], level: Int): Array[Long] =
    points.map(p => S2CellId.parent(S2CellId.fromPoint(p.x, p.y, p.z), level))

  def encode(points: Array[V3], level: Int): Array[Byte] =
    encodeCells(cellsOf(points, level), level)

  def decode(bytes: Array[Byte]): Array[V3] =
    decodeCells(bytes).map { id =>
      val p = S2CellId.toPoint(id); V3(p(0), p(1), p(2))
    }

  /** Encode same-level cell ids (level taken from the argument). */
  def encodeCells(cells: Array[Long], level: Int): Array[Byte] = {
    require(level >= 0 && level <= 30, s"level $level out of [0,30]")
    val shift = 2 * (30 - level) + 1
    val out = new java.io.ByteArrayOutputStream(2 + 2 * cells.length)
    out.write(Version)
    out.write(level)
    writeVarint(out, cells.length.toLong)
    var prev = 0L
    var i = 0
    while (i < cells.length) {
      require(S2CellId.level(cells(i)) == level,
        s"cell ${S2CellId.toToken(cells(i))} is not level $level")
      val pos = cells(i) >>> shift
      if (i == 0) writeVarint(out, pos)
      else writeVarint(out, zigzag(pos - prev))
      prev = pos
      i += 1
    }
    out.toByteArray
  }

  def decodeCells(bytes: Array[Byte]): Array[Long] = {
    val in = new Cursor(bytes)
    val version = in.byte()
    require(version == Version, s"unknown codec version $version")
    val level = in.byte()
    require(level >= 0 && level <= 30, s"corrupt level byte $level")
    val shift = 2 * (30 - level) + 1
    val n = readVarint(in)
    // Every encoded position takes >= 1 byte, so a count beyond the
    // remaining buffer is corrupt — reject before allocating (a crafted
    // count byte must not drive a multi-GB Array allocation).
    require(n >= 0 && n <= bytes.length - in.p,
      s"corrupt count $n for ${bytes.length - in.p} remaining bytes")
    val out = new Array[Long](n.toInt)
    // valid level-L curve positions are [0, 6 * 4^L): 3 face bits + 2L
    // Hilbert bits. Validate the POSITION, not the shifted id — a high-bit
    // drift shifts out of the 64-bit id and aliases to a valid cell, the
    // exact silent-wrong-chain failure this guard exists to reject.
    val posLimit = 6L << (2 * level)
    var pos = 0L
    var i = 0
    while (i < n) {
      pos = if (i == 0) readVarint(in) else pos + unzigzag(readVarint(in))
      require(pos >= 0 && pos < posLimit,
        s"corrupt position $pos at index $i (valid range [0, $posLimit) at level $level)")
      out(i) = (pos << 1 | 1L) << (shift - 1)
      i += 1
    }
    require(in.p == bytes.length,
      s"corrupt stream: ${bytes.length - in.p} trailing bytes after $n positions")
    out
  }

  @inline private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  @inline private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  private final class Cursor(val bytes: Array[Byte]) {
    var p = 0
    def byte(): Int = { val b = bytes(p) & 0xFF; p += 1; b }
  }

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def readVarint(in: Cursor): Long = {
    var v = 0L; var s = 0; var b = 0
    do {
      require(s < 64, "corrupt varint")
      b = in.byte(); v |= (b & 0x7FL) << s; s += 7
    } while ((b & 0x80) != 0)
    v
  }
}
