package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._
import scala.collection.mutable

/** Edge-graph polygon assembly — the S2Builder layer-stack core
  * (/root/reference/src/s2/s2builder.h:59-69) reduced to its polygon
  * essentials: snap input edges with the cell-id snap function, discard
  * degenerate edges, cancel sibling pairs, and stitch the remaining
  * balanced directed graph into loops (S2PolygonLayer with
  * DegenerateEdges::DISCARD + SiblingPairs::DISCARD semantics). This is
  * the ingestion path for geometry that arrives as unordered edge soup —
  * tile boundaries, clipped fragments, merged layers. */
object Builder {

  /** Assemble a parity-model polygon from directed edges (interior-left).
    * Steps: snap endpoints at `snapLevel` (30 = leaf ≈ identity), drop
    * edges that collapse, cancel sibling pairs (k copies of u→v and m of
    * v→u leave |k-m| copies in the majority direction), stitch loops,
    * drop sliver loops (< 3 vertices), normalize to small interiors.
    * Throws IllegalArgumentException when the snapped graph is not
    * balanced (dangling boundary). */
  def assemblePolygon(edges: Seq[(V3, V3)], snapLevel: Int = 30): S2Polygon =
    assemblePolygon(edges, SnapFunction.fromLevel(snapLevel))

  /** Vertex-on-edge splitting (S2Builder semantics: sites within the snap
    * radius of an edge split it). `sites` is the site set to split
    * against — the edges' own endpoints for single-layer assembly, the
    * UNION of all layers' snapped vertices for a layer stack. Candidate
    * pruning for large soups: past the threshold, sites are sorted by
    * leaf-cell order key and each edge probes only the sites inside a
    * covering of its tol-expanded bounding cap (exact distance test
    * unchanged, so the split set is identical to the naive scan). */
  private[operators] def splitEdgesAtSites(direct: Seq[(V3, V3)],
                                           sites: Array[V3],
                                           tol: Double): Seq[(V3, V3)] = {
    val tolChord2 = S1ChordAngle.fromRadians(tol)
    val usePrune = direct.size.toLong * sites.length > (1L << 22)
    val (vOrds, vByOrd) =
      if (!usePrune) (null: Array[Long], null: Array[V3])
      else {
        val sorted = sites.map(w =>
          (S2CellId.orderKey(S2CellId.fromPoint(w.x, w.y, w.z)), w)).sortBy(_._1)
        (sorted.map(_._1), sorted.map(_._2))
      }
    val cov = if (usePrune) new S2RegionCoverer(8, 0, 30) else null
    def candidatesNear(u: V3, v: V3): Iterator[V3] =
      if (!usePrune) sites.iterator
      else {
        val c0 = u + v
        val center = if (c0.norm2 < 1e-30) u else c0.normalize
        val radius = math.min(math.Pi, center.angle(u) + 2 * tol)
        val cells = cov.getCovering(S2Cap.fromCenterAngle(center, radius))
        cells.iterator.flatMap { c =>
          val lo = S2CellId.orderKey(S2CellId.rangeMin(c))
          val hi = S2CellId.orderKey(S2CellId.rangeMax(c))
          var i = java.util.Arrays.binarySearch(vOrds, lo)
          if (i < 0) i = -i - 1
          Iterator.from(i).takeWhile(j => j < vOrds.length && vOrds(j) <= hi)
            .map(vByOrd)
        }
      }
    direct.flatMap { case (u, v) =>
      val splits = candidatesNear(u, v)
        .filter(w => w != u && w != v)
        .filter { w =>
          val xa2 = (w - u).norm2; val xb2 = (w - v).norm2
          S2EdgeDistances.interiorDistance2(w, u, v, xa2, xb2) match {
            case d if d >= 0 => d <= tolChord2
            case _ => false
          }
        }
        .toArray.distinct.sortBy(w => (w - u).norm2)
      if (splits.isEmpty) Seq((u, v))
      else {
        val chain: Array[V3] = (u +: splits) :+ v
        chain.indices.dropRight(1)
          .map(i => (chain(i), chain(i + 1)))
          .filter { case (a, b) => a != b }
      }
    }
  }

  /** As above with a pluggable [[SnapFunction]] (cell-id, IntLatLng grid,
    * or identity — the reference's snap-function layer). */
  def assemblePolygon(edges: Seq[(V3, V3)], snapFn: SnapFunction): S2Polygon = {
    // 1-2. snap + drop degenerate
    val direct = edges.iterator
      .map { case (u, v) => (snapFn(u), snapFn(v)) }
      .filter { case (u, v) => u != v }
      .toSeq
    // 2b. vertex-on-edge splitting. This is what lets boundaries with
    // MISMATCHED subdivision cancel: a long edge facing two shorter
    // sibling edges splits at their shared vertex and then cancels
    // segment-by-segment. Tolerance 4x the snap radius bounds the
    // deviation a snapped midpoint can have from its snapped-endpoint
    // geodesic. Identity snap uses the leaf-level tolerance.
    val tol = 4 * snapFn.snapRadius
    val vertices = direct.iterator.flatMap { case (u, v) => Iterator(u, v) }
      .toArray.distinct
    val snapped = splitEdgesAtSites(direct, vertices, tol)
    // 3-4. cancel sibling pairs, stitch, normalize
    new S2Polygon(LoopStitcher.stitchNormalized(cancelSiblings(snapped),
      "polygon assembly (not a closed boundary at this snap level?)"))
  }

  /** Sibling-pair cancellation with multiplicity: k copies of u→v and m
    * copies of v→u leave |k-m| copies in the majority direction. */
  private[operators] def cancelSiblings(snapped: Seq[(V3, V3)]): Seq[(V3, V3)] = {
    val countByEdge = mutable.HashMap.empty[(V3, V3), Int]
    snapped.foreach { e => countByEdge(e) = countByEdge.getOrElse(e, 0) + 1 }
    val survivors = mutable.ArrayBuffer.empty[(V3, V3)]
    val done = mutable.HashSet.empty[(V3, V3)]
    for ((e @ (u, v), k) <- countByEdge if !done.contains(e)) {
      val sib = (v, u)
      val m = countByEdge.getOrElse(sib, 0)
      done += e; done += sib
      if (k > m) for (_ <- 0 until k - m) survivors += e
      else if (m > k) for (_ <- 0 until m - k) survivors += sib
    }
    survivors.toSeq
  }

  /** N-way union of polygons with PAIRWISE-DISJOINT INTERIORS whose
    * boundaries may share whole edges (adjacent tiles, parcels, clipped
    * fragments) — the shared-edge case the crossing-based
    * [[graft.core.S2BooleanOps]] clipper excludes. Each polygon
    * contributes its interior-left directed edges; shared boundaries
    * appear as sibling pairs and cancel, leaving exactly the outer
    * boundary. Boundaries digitized at MISMATCHED densities also cancel:
    * vertex-on-edge splitting decomposes a long edge at every facing
    * vertex within the snap tolerance before cancellation (see
    * assemblePolygon step 2b) — vertex-exact matching is not required as
    * long as the two digitizations agree to within the snap radius. */
  def unionDisjoint(polys: Seq[S2Polygon], snapLevel: Int = 30): S2Polygon = {
    val edges = for {
      p <- polys
      (l, li) <- p.loops.zipWithIndex
      i <- 0 until l.numVertices
    } yield {
      if (p.loopSigns(li) > 0) (l.vertex(i), l.vertex(i + 1))
      else (l.vertex(i + 1), l.vertex(i))
    }
    assemblePolygon(edges, snapLevel)
  }

  /** Assemble polylines from directed edge soup — the S2Builder polyline
    * layers (S2PolylineVectorLayer, PolylineType::WALK,
    * /root/reference/src/s2/s2builderutil_s2polyline_vector_layer.h:41-77):
    * snap, drop degenerate edges, then decompose the directed multigraph
    * into maximal edge-disjoint walks. Each vertex with more outgoing
    * than incoming edges heads that many walks; leftover edges (balanced
    * sub-digraphs) come out as closed walks. Deterministic: heads and
    * next-edge choices are taken in lexicographic vertex order.
    *
    * `simplifyTolerance` > 0 tolerance-subsamples each assembled chain
    * (simplify_edge_chains semantics: every dropped vertex stays within
    * the tolerance of the simplified edge; pass the snap radius to mirror
    * the reference's guarantee). */
  def assemblePolylines(edges: Seq[(V3, V3)],
                        snapFn: SnapFunction = SnapFunction.Identity,
                        simplifyTolerance: Double = 0.0): Seq[Array[V3]] = {
    val direct = edges.iterator
      .map { case (u, v) => (snapFn(u), snapFn(v)) }
      .filter { case (u, v) => u != v }
      .toSeq
    val chains = walkDecompose(direct)
    if (simplifyTolerance <= 0) chains
    else chains.map { c =>
      Polylines.subsampleIdx(c, simplifyTolerance).map(c)
    }
  }

  /** Decompose a directed edge multigraph into maximal edge-disjoint
    * walks (deterministic lexicographic head/next order). */
  private[operators] def walkDecompose(direct: Seq[(V3, V3)]): Seq[Array[V3]] = {
    val vOrd: Ordering[V3] =
      (a: V3, b: V3) => if (a == b) 0 else if (a.lexLess(b)) -1 else 1
    val outs = mutable.HashMap.empty[V3, mutable.ArrayBuffer[V3]]
    val inDeg = mutable.HashMap.empty[V3, Int]
    direct.foreach { case (u, v) =>
      outs.getOrElseUpdate(u, mutable.ArrayBuffer.empty[V3]) += v
      inDeg(v) = inDeg.getOrElse(v, 0) + 1
    }
    outs.values.foreach(_.sortInPlace()(vOrd))
    var remaining = direct.size
    def walk(start: V3): Array[V3] = {
      val chain = mutable.ArrayBuffer(start)
      var cur = start
      var go = true
      while (go) {
        outs.get(cur) match {
          case Some(buf) if buf.nonEmpty =>
            val nxt = buf.remove(0)
            if (buf.isEmpty) outs.remove(cur)
            remaining -= 1
            chain += nxt
            cur = nxt
          case _ => go = false
        }
      }
      chain.toArray
    }
    val res = mutable.ArrayBuffer.empty[Array[V3]]
    // path heads: out-degree surplus, each starting `surplus` walks
    val heads = outs.keysIterator.toSeq.sorted(vOrd)
      .map(u => (u, outs(u).size - inDeg.getOrElse(u, 0)))
      .filter(_._2 > 0)
    for ((h, surplus) <- heads; _ <- 0 until surplus) res += walk(h)
    // leftover balanced components: closed walks
    while (remaining > 0) {
      val start = outs.keysIterator.toSeq.sorted(vOrd).head
      res += walk(start)
    }
    res.filter(_.length >= 2).toSeq
  }

  /** Per-group distributed assembly: rows carry one directed edge each
    * ((latA,lngA) → (latB,lngB)); groups are assembled independently.
    * Returns (group, poly) with the polygon in text format; groups whose
    * edge soup cannot close produce null (inspect with the validator). */
  def assemblePolygons(df: DataFrame, groupCol: String,
                       latA: String, lngA: String, latB: String, lngB: String,
                       snapLevel: Int = 30): DataFrame = {
    val in = df.select(col(groupCol).cast("string").as("g"),
      col(latA).cast("double"), col(lngA).cast("double"),
      col(latB).cast("double"), col(lngB).cast("double"))
    val outSchema = StructType(Seq(
      StructField("group", StringType), StructField("poly", StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    import in.sparkSession.implicits._
    in.groupByKey(_.getString(0))
      .mapGroups { (g, rows) =>
        val edges = rows.map { r =>
          (V3.fromLatLngDegrees(r.getDouble(1), r.getDouble(2)),
            V3.fromLatLngDegrees(r.getDouble(3), r.getDouble(4)))
        }.toSeq
        val poly = try Some(assemblePolygon(edges, snapLevel))
        catch { case _: IllegalArgumentException => None }
        Row(g, poly.map(S2TextFormat.polygonToString).orNull)
      }(enc)
  }

  /** Point layer (S2PointVectorLayer,
    * /root/reference/src/s2/s2builderutil_s2point_vector_layer.h:36-61):
    * snap isolated points and merge duplicates (DuplicateEdges::MERGE),
    * deterministic lexicographic order. */
  def assemblePoints(points: Seq[V3],
                     snapFn: SnapFunction = SnapFunction.Identity): Seq[V3] =
    points.map(snapFn(_)).distinct
      .sortWith((a, b) => a.lexLess(b))

  /** One layer of a [[buildLayers]] stack — the analogue of the edges
    * added between two S2Builder::StartLayer calls
    * (/root/reference/src/s2/s2builder.h:59-69,199-233). */
  sealed trait Layer extends Serializable
  object Layer {
    /** Assembled like [[assemblePolygon]] (parity model, interior-left). */
    final case class Polygon(edges: Seq[(V3, V3)]) extends Layer
    /** Assembled like [[assemblePolylines]]. `simplifyTolerance` > 0
      * simplifies each walk BETWEEN cross-layer sites: a vertex another
      * layer snapped or split at is never dropped, preserving the stack's
      * shared-vertex guarantee (the reference's simplify_edge_chains
      * makes the same promise, s2builder.h:300-324). */
    final case class Polylines(edges: Seq[(V3, V3)],
                               simplifyTolerance: Double = 0.0) extends Layer
    /** Isolated points, merged like [[assemblePoints]]. */
    final case class Points(points: Seq[V3]) extends Layer
  }

  sealed trait LayerResult extends Serializable
  object LayerResult {
    final case class PolygonResult(polygon: S2Polygon) extends LayerResult
    final case class PolylinesResult(chains: Seq[Array[V3]]) extends LayerResult
    final case class PointsResult(points: Seq[V3]) extends LayerResult
  }

  /** General layer-stack build — the full S2Builder contract rather than
    * the single-layer helpers above: ALL layers share ONE snap pass and
    * ONE site set, so geometry is consistent ACROSS layers after the
    * build. Concretely: every input vertex of every layer snaps with the
    * same `snapFn`, the union of the snapped vertices forms the global
    * site set, and every edge of every layer splits at each site within
    * the snap tolerance — so a polyline (roads) acquires a vertex exactly
    * where a polygon layer (parcels) has a boundary vertex nearby, and
    * two polygon layers with shared boundaries end up vertex-aligned.
    * Results are returned in layer order. */
  def buildLayers(layers: Seq[Layer],
                  snapFn: SnapFunction = SnapFunction.Identity): Seq[LayerResult] = {
    val tol = 4 * snapFn.snapRadius
    // one snap pass over every layer's geometry
    val snappedLayers: Seq[Layer] = layers.map {
      case Layer.Polygon(es) => Layer.Polygon(
        es.map { case (u, v) => (snapFn(u), snapFn(v)) }.filter(e => e._1 != e._2))
      case Layer.Polylines(es, s) => Layer.Polylines(
        es.map { case (u, v) => (snapFn(u), snapFn(v)) }.filter(e => e._1 != e._2), s)
      case Layer.Points(ps) => Layer.Points(ps.map(snapFn(_)))
    }
    // global site set: every snapped vertex from every layer, plus a
    // per-vertex count of how many layers contributed it (for the
    // simplify force-keep rule below)
    def layerVerts(l: Layer): Iterator[V3] = l match {
      case Layer.Polygon(es) => es.iterator.flatMap(e => Iterator(e._1, e._2))
      case Layer.Polylines(es, _) => es.iterator.flatMap(e => Iterator(e._1, e._2))
      case Layer.Points(ps) => ps.iterator
    }
    val layerVertSets: Seq[Set[V3]] = snappedLayers.map(layerVerts(_).toSet)
    val sites: Array[V3] = layerVertSets.flatten.distinct.toArray
    val layerCount = mutable.HashMap.empty[V3, Int]
    layerVertSets.foreach(_.foreach(v =>
      layerCount(v) = layerCount.getOrElse(v, 0) + 1))
    snappedLayers.zipWithIndex.map {
      case (Layer.Polygon(es), _) =>
        LayerResult.PolygonResult(new S2Polygon(LoopStitcher.stitchNormalized(
          cancelSiblings(splitEdgesAtSites(es, sites, tol)),
          "polygon layer (not a closed boundary at this snap level?)")))
      case (Layer.Polylines(es, simp), i) =>
        val own = layerVertSets(i)
        val chains = walkDecompose(splitEdgesAtSites(es, sites, tol))
        val out =
          if (simp <= 0) chains
          else chains.map { c =>
            // force-keep every site contributed by ANOTHER layer —
            // whether split-injected or coincident with an own vertex —
            // so the stack's shared-vertex guarantee survives simplify
            simplifyKeeping(c, simp,
              v => layerCount.getOrElse(v, 0) > (if (own.contains(v)) 1 else 0))
          }
        LayerResult.PolylinesResult(out)
      case (Layer.Points(ps), _) =>
        LayerResult.PointsResult(ps.distinct.sortWith((a, b) => a.lexLess(b)))
    }
  }

  /** Simplify a chain while force-keeping marked vertices: the chain is
    * cut at every kept vertex, each piece simplified independently, and
    * the pieces re-joined (kept vertices survive by construction). */
  private def simplifyKeeping(chain: Array[V3], tol: Double,
                              keep: V3 => Boolean): Array[V3] = {
    val cuts = (0 +: chain.indices.drop(1).dropRight(1).filter(i => keep(chain(i)))
      :+ (chain.length - 1)).distinct
    val out = mutable.ArrayBuffer.empty[V3]
    for (k <- cuts.indices.dropRight(1)) {
      val piece = chain.slice(cuts(k), cuts(k + 1) + 1)
      val kept = Polylines.subsampleIdx(piece, tol).map(piece)
      out ++= (if (k == 0) kept else kept.drop(1))
    }
    out.toArray
  }

  /** Per-group distributed POLYLINE assembly (dirty-polyline ingestion):
    * rows carry one directed segment each; each group's soup is
    * decomposed into maximal walks. Emits one row per assembled polyline:
    * (group, idx, polyline) with "lat:lng, lat:lng, …" text. */
  def assemblePolylinesDf(df: DataFrame, groupCol: String,
                          latA: String, lngA: String, latB: String, lngB: String,
                          snapFn: SnapFunction = SnapFunction.Identity,
                          simplifyTolerance: Double = 0.0): DataFrame = {
    val in = df.select(col(groupCol).cast("string").as("g"),
      col(latA).cast("double"), col(lngA).cast("double"),
      col(latB).cast("double"), col(lngB).cast("double"))
    val outSchema = StructType(Seq(
      StructField("group", StringType), StructField("idx", IntegerType),
      StructField("polyline", StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    import in.sparkSession.implicits._
    in.groupByKey(_.getString(0))
      .flatMapGroups { (g, rows) =>
        val edges = rows.map { r =>
          (V3.fromLatLngDegrees(r.getDouble(1), r.getDouble(2)),
            V3.fromLatLngDegrees(r.getDouble(3), r.getDouble(4)))
        }.toSeq
        assemblePolylines(edges, snapFn, simplifyTolerance).zipWithIndex.map {
          case (chain, i) =>
            Row(g, i, chain.map(p =>
              s"${V3.latDegrees(p)}:${V3.lngDegrees(p)}").mkString(", "))
        }
      }(enc)
  }

  /** Deterministic two-layer stack kernel for the driver gate
    * `q_s2_layer_stack`: a quad polygon layer plus a corner-to-corner
    * diagonal polyline layer, snapped in ONE shared CellIdSnap(10) pass
    * (the coincident corners become shared snapped sites, and each
    * layer's edges split at every layer's sites). Output = the assembled
    * polygon's loops ("lat:lng, …" joined by "; ") and the assembled
    * chains (joined by " | "). */
  def layerStackKernel(i: Int): Array[String] = {
    val b = 10.0 + 3.0 * i
    def p(lat: Double, lng: Double) = V3.fromLatLngDegrees(lat, lng)
    val quad = Seq((p(b, b), p(b, b + 2)), (p(b, b + 2), p(b + 2, b + 2)),
      (p(b + 2, b + 2), p(b + 2, b)), (p(b + 2, b), p(b, b)))
    val line = Seq((p(b, b), p(b + 2, b + 2)))
    val rs = buildLayers(Seq(Layer.Polygon(quad), Layer.Polylines(line)),
      SnapFunction.CellIdSnap(10))
    def fmt(v: V3) = s"${V3.latDegrees(v)}:${V3.lngDegrees(v)}"
    val poly = rs.head match {
      case LayerResult.PolygonResult(pg) =>
        pg.loops.map(l => l.vertices.map(fmt).mkString(", ")).mkString("; ")
      case _ => ""
    }
    val lines = rs(1) match {
      case LayerResult.PolylinesResult(cs) =>
        cs.map(c => c.map(fmt).mkString(", ")).mkString(" | ")
      case _ => ""
    }
    Array(poly, lines)
  }
}
