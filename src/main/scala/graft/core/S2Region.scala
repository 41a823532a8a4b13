package graft.core

/** Region interface used by the coverer (reference s2region.h:39-98). */
trait S2Region extends Serializable {
  def capBound: S2Cap
  def rectBound: S2LatLngRect
  /** Loose covering used to seed the coverer; default via cap bound. */
  def cellUnionBound: Array[Long] = capBound.cellUnionBound
  /** True only if the cell is entirely contained. */
  def containsCell(cell: S2Cell): Boolean
  /** False only if intersection is impossible (may err true). */
  def mayIntersectCell(cell: S2Cell): Boolean
  def contains(p: V3): Boolean
}
