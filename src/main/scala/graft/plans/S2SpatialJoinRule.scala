package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import graft.functions._

/** Plans pure-SQL spatial-predicate joins as term-index candidate joins.
  *
  * A user writing plain SQL
  * {{{
  *   SELECT ... FROM docs d JOIN regions r
  *   ON s2_contains(r.poly, d.lat, d.lng)
  * }}}
  * gives Catalyst a join with no equi-condition, so the planner falls back
  * to BroadcastNestedLoopJoin — every (doc, region) pair evaluated, the
  * exact plan shape the reference's term scheme exists to avoid
  * (s2region_term_indexer.cc:27-72, end-to-end doc/examples/term_index.cc:
  * 70-120). This rule rewrites such joins at plan time into the scheme
  * [[graft.operators.S2Joins.termPolygonJoin]] provides behind the Scala
  * API:
  *
  *  - the point side explodes its ~13 ancestor index terms,
  *  - the region side explodes its covering query terms,
  *  - the join becomes a term EQUI-join (hash/sort-merge + AQE skew split,
  *    broadcastable when one side is small),
  *  - the original spatial predicate stays on top as the exact refine.
  *
  * No pair deduplication is needed: point index terms are all plain
  * tokens, and the only plain tokens a region query emits are its
  * covering cells — a normalized, DISJOINT union, of which at most one
  * can lie on the point's ancestor chain. Each intersecting pair
  * therefore shares exactly one term, and the rewrite preserves row
  * multiplicity exactly (SpatialSqlJoinSpec's term-scheme invariant fuzz asserts it).
  *
  * Scope: Inner/Cross joins whose condition (a) contains an
  * [[graft.functions.S2ContainsPoint]] or
  * [[graft.functions.S2WithinDistance]] conjunct with each argument group
  * bound to one side, and (b) has NO equality conjunct between the sides
  * — if one exists the join is already hash-joinable and the predicate is
  * cheaper as a post-join filter than a second explode would be.
  *
  * Inject via [[graft.S2Extensions]] (runs inside the operator
  * optimization fixpoint) or `spark.experimental.extraOptimizations`
  * (runs as the final optimizer batch; same plan, minus a late
  * column-pruning pass that rarely matters because the original join
  * already pruned to the columns the condition and output need).
  *
  * Consciously NOT rewritten (each is unsound without extra machinery):
  *
  *  - LeftSemi/LeftAnti (`WHERE [NOT] EXISTS`): the point side must
  *    explode ~13 ancestor terms, so a semi join over the exploded child
  *    emits up to 13 copies of a matching row. Collapsing them back
  *    needs a per-row identity; `monotonically_increasing_id()` is
  *    non-deterministic across the two plan branches that would need it,
  *    and a materialization barrier is not a logical-rule's call to
  *    make. Users with an EXISTS-shaped query get the same plan by
  *    rewriting it as an inner join + `dropDuplicates(id)`, or via
  *    [[graft.operators.S2Joins.termPolygonJoin]].
  *  - region×region `s2_intersects`: the two-sided term scheme can give
  *    one intersecting pair SEVERAL shared terms (covering cells at
  *    different levels), so the inner rewrite inflates multiplicity;
  *    deduping again needs row identity. The Scala API
  *    ([[graft.operators.RegionJoins.intersectsJoin]]) requires id
  *    columns for exactly this reason. */
object S2SpatialJoinRule extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def boundTo(e: Expression, side: LogicalPlan): Boolean =
    e.deterministic && e.references.subsetOf(side.outputSet)

  /** Equality conjunct usable as a hash-join key (one side each). */
  private def isEquiConjunct(e: Expression, l: LogicalPlan, r: LogicalPlan): Boolean =
    e match {
      case EqualTo(a, b) =>
        (boundTo(a, l) && boundTo(b, r)) || (boundTo(a, r) && boundTo(b, l))
      case EqualNullSafe(a, b) =>
        (boundTo(a, l) && boundTo(b, r)) || (boundTo(a, r) && boundTo(b, l))
      case _ => false
    }

  /** If `c` is a rewritable spatial conjunct: (point-side index-term
    * expression, its side is the LEFT side?, query-side term expression).
    * The term expressions are built from the predicate's own argument
    * expressions, so non-attribute args (e.g. `lat + 0.5`) work. */
  private def spatialConjunct(c: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Boolean, Expression)] = c match {
    case S2ContainsPoint(poly, lat, lng) =>
      if (boundTo(poly, right) && boundTo(lat, left) && boundTo(lng, left))
        Some((S2PointIndexTermsExpr(lat, lng), true, S2PolyQueryTermsExpr(poly)))
      else if (boundTo(poly, left) && boundTo(lat, right) && boundTo(lng, right))
        Some((S2PointIndexTermsExpr(lat, lng), false, S2PolyQueryTermsExpr(poly)))
      else None
    case S2WithinDistance(latA, lngA, latB, lngB, radius) =>
      // the cap side needs the radius; it may reference the cap's own side
      // (or be a literal). Point side indexes its own coordinates.
      if (boundTo(latA, left) && boundTo(lngA, left) &&
          boundTo(latB, right) && boundTo(lngB, right) && boundTo(radius, right))
        Some((S2PointIndexTermsExpr(latA, lngA), true,
          S2CapQueryTermsExpr(latB, lngB, radius)))
      else if (boundTo(latA, right) && boundTo(lngA, right) &&
               boundTo(latB, left) && boundTo(lngB, left) && boundTo(radius, left))
        Some((S2PointIndexTermsExpr(latA, lngA), false,
          S2CapQueryTermsExpr(latB, lngB, radius)))
      else None
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross, Some(cond), _) =>
      val cs = conjuncts(cond)
      val rewritable =
        if (cs.exists(isEquiConjunct(_, left, right))) None
        else cs.iterator.map(spatialConjunct(_, left, right))
          .collectFirst { case Some(t) => t }
      rewritable match {
        case None => j
        case Some((docTerms, docIsLeft, queryTerms)) =>
          val termDoc = AttributeReference("_s2_term_d", StringType, nullable = false)()
          val termQry = AttributeReference("_s2_term_q", StringType, nullable = false)()
          // Generate with outer=false: rows whose term array is null
          // (null coordinates / null polygon) vanish — identical to the
          // original inner join, whose null predicate dropped them too.
          val genDoc = Generate(Explode(docTerms), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(termDoc),
            child = if (docIsLeft) left else right)
          val genQry = Generate(Explode(queryTerms), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(termQry),
            child = if (docIsLeft) right else left)
          val (newLeft, newRight) = if (docIsLeft) (genDoc, genQry) else (genQry, genDoc)
          // preserve user join hints: each Generate wraps the original
          // side in place, so the original left/right hints still apply
          // (e.g. /*+ BROADCAST(regions) */ keeps the candidate join a
          // broadcast join instead of shuffling the exploded doc terms)
          val candidates = Join(newLeft, newRight, Inner,
            Some(EqualTo(termDoc, termQry)), j.hint)
          // full original condition as the exact refine (spatial predicate
          // + any remaining conjuncts)
          Project(j.output, Filter(cond, candidates))
      }
  }
}
