package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core._

/** Shell/hole nesting detection — S2ShapeNestingQuery semantics
  * (/root/reference/src/s2/s2shape_nesting_query.h:77-160): given a
  * multi-ring shape whose nesting is NOT pre-declared, classify each ring
  * as shell or hole and compute its parent. For valid (non-crossing)
  * rings, nesting depth is the count of other rings whose interior
  * contains a representative vertex, and a hole's parent is its deepest
  * container. Rings are first normalized to their small interior (the
  * datum choice that makes the outermost ring a shell — the reference's
  * FIRST_CHAIN datum with standard orientation). Degenerate geometry is
  * out of scope, as in the reference ("the query currently doesn't handle
  * any sort of degeneracy"). */
object Nesting {

  final case class ChainRelation(chainId: Int, isShell: Boolean, parent: Int,
                                 depth: Int, holes: Array[Int])

  /** Normalize a ring to its small interior (area <= 2pi). */
  private def normalized(vertices: Array[V3]): S2Loop = {
    val l = S2Loop(vertices)
    if (l.area > 2 * math.Pi) S2Loop(vertices.reverse) else l
  }

  /** Nesting relations of a set of rings (1:1 with input order). */
  def shapeNesting(rings: Seq[Array[V3]]): Array[ChainRelation] = {
    val loops = rings.map(normalized).toArray
    val n = loops.length
    val contains = Array.tabulate(n, n) { (i, j) =>
      i != j && loops(j).numVertices > 0 && {
        val rep = loops(j).vertex(0)
        loops(i).bound.contains(rep) && loops(i).bruteForceContains(rep)
      }
    }
    val depth = Array.tabulate(n)(j => (0 until n).count(i => contains(i)(j)))
    val parent = Array.tabulate(n) { j =>
      // immediate parent: the containing ring of greatest depth
      val containers = (0 until n).filter(i => contains(i)(j))
      if (containers.isEmpty) -1 else containers.maxBy(depth)
    }
    Array.tabulate(n) { j =>
      val isShell = depth(j) % 2 == 0
      val holes = (0 until n).filter(h => parent(h) == j && depth(h) % 2 == 1)
      ChainRelation(j, isShell, if (isShell) -1 else parent(j), depth(j),
        holes.toArray)
    }
  }

  /** Assemble rings with undeclared nesting into a parity-model polygon:
    * rings normalized to small interiors; parity containment then yields
    * shell/hole semantics automatically. Returns the polygon plus the
    * relations. */
  def assemblePolygon(rings: Seq[Array[V3]]): (S2Polygon, Array[ChainRelation]) = {
    val relations = shapeNesting(rings)
    (new S2Polygon(rings.map(normalized(_)).toArray), relations)
  }

  /** Column form over polygon text ("loop; loop; …"): array of
    * (chain_id, is_shell, parent, depth) structs. */
  private val nestingUdf = udf { (text: String) =>
    val poly = graft.functions.PolyCache.get(text)
    shapeNesting(poly.loops.toSeq.map(_.vertices))
      .map(r => (r.chainId, r.isShell, r.parent, r.depth))
  }
  def shapeNestingCol(polyText: Column): Column = nestingUdf(polyText)
}
