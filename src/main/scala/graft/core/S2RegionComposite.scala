package graft.core

/** Composite region types — S2RegionUnion / S2RegionIntersection
  * (/root/reference/src/s2/s2region_union.h:37-89,
  *  /root/reference/src/s2/s2region_intersection.h:36-88): set-operation
  * combinators closed over the [[S2Region]] interface. Because every
  * covering / stab / join path in the engine is written against
  * `S2Region`, a composite drops directly into
  * [[graft.operators.S2Joins.broadcastContainsJoin]] — joining docs
  * against "A ∪ B" needs no caller-side pre-merge of coverings and no
  * second join pass.
  *
  * Bound semantics mirror the reference: conservative (may err on the
  * loose side). `containsCell` on a union answers true only when a single
  * member contains the cell (a union may jointly cover a cell none of its
  * members contains — that cell is simply not reported as interior, which
  * is always safe for the coverer and the stab refine).
  */
final case class S2RegionUnion(regions: Seq[S2Region]) extends S2Region {
  require(regions.nonEmpty, "S2RegionUnion of zero regions")

  override def capBound: S2Cap = rectBound.capBound

  override def rectBound: S2LatLngRect =
    regions.iterator.map(_.rectBound).reduce(_.union(_))

  override def containsCell(cell: S2Cell): Boolean =
    regions.exists(_.containsCell(cell))

  override def mayIntersectCell(cell: S2Cell): Boolean =
    regions.exists(_.mayIntersectCell(cell))

  override def contains(p: V3): Boolean = regions.exists(_.contains(p))
}

final case class S2RegionIntersection(regions: Seq[S2Region]) extends S2Region {
  require(regions.nonEmpty, "S2RegionIntersection of zero regions")

  override def capBound: S2Cap = rectBound.capBound

  override def rectBound: S2LatLngRect =
    regions.iterator.map(_.rectBound).reduce(_.intersection(_))

  override def containsCell(cell: S2Cell): Boolean =
    regions.forall(_.containsCell(cell))

  /** May err true (reference semantics): a precise answer would need the
    * members' pairwise geometry; all-members-may-intersect is the
    * strongest conservative test available through the interface. */
  override def mayIntersectCell(cell: S2Cell): Boolean =
    regions.forall(_.mayIntersectCell(cell))

  override def contains(p: V3): Boolean = regions.forall(_.contains(p))
}
