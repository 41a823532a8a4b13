package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.functions.S2

/** Distributed spatial joins over S2 cell keys — the engine's flagship
  * operators (SURVEY.md §2.10). Three physical strategies, chosen by the
  * caller (or `containsJoin` auto):
  *
  *  1. broadcast  — regions side fits in memory: build a
  *     [[CellIntervalIndex]] of all region coverings, broadcast it, and
  *     stab it with each doc's leaf cell. Zero shuffle over the big side;
  *     exact refine runs only on candidates whose covering cell was not an
  *     interior cell. This is the 100 TB plan whenever the dimension side
  *     is ≤ ~1M covering cells (the common case: country/tile/geofence
  *     tables).
  *
  *  2. terms      — both sides large: S2RegionTermIndexer semantics
  *     (/root/reference/src/s2/s2region_term_indexer.cc:27-72): docs emit
  *     ancestor terms for their leaf cell, regions emit covering +
  *     ancestor-covering terms; two regions intersect iff they share ≥1
  *     term, so the spatial join becomes a plain equi-join Catalyst can
  *     hash/sort-merge + AQE-skew-split, followed by the exact refine.
  *
  *  3. range      — both sides large and Hilbert-sorted: covering cells
  *     against leaf cells as an interval containment join on order keys.
  *
  * All joins carry every payload column (notably `spans`) untouched —
  * the span-sequence invariant is preserved structurally because spans are
  * never exploded or rebuilt.
  */
object S2Joins {

  /** Ingest: add derived geometry columns from lat/lng degrees —
    * unit-vector point, leaf cell id, and the order-preserving Hilbert
    * sort key (id ^ Long.MinValue; see SURVEY.md §7.4 on signed order). */
  def withCellId(df: DataFrame, latDeg: Column, lngDeg: Column): DataFrame =
    df.withColumn("cell_id", S2.cellId(latDeg, lngDeg))
      .withColumn("cell_ord", S2.orderKey(col("cell_id")))

  /** Hilbert-range repartition: co-locates spatially-near rows, making
    * parquet min/max stats on `cell_ord` prune like an S2CellUnion binary
    * search (SURVEY.md §4.2). Use before writing any large spatial table. */
  def hilbertRepartition(df: DataFrame, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, col("cell_ord"))

  // =======================================================================
  // 1. broadcast contains/intersects join
  // =======================================================================

  /** docs ⋈ regions with `region.contains(point)` semantics.
    *
    * @param docs     must carry `cell_id` (see withCellId) + point source
    *                 columns latCol/lngCol for the exact refine
    * @param regions  labeled regions, broadcast as covering intervals
    * @return docs rows × matching region label (column `qid`), all doc
    *         columns preserved.
    */
  def broadcastContainsJoin(docs: DataFrame, regions: Seq[(Int, S2Region)],
                            latCol: String = "lat", lngCol: String = "lng",
                            maxCellsPerRegion: Int = 64): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val index = CellIntervalIndex.fromRegions(regions, maxCellsPerRegion)
    // single native stab-and-refine expression per row (codegen, no arg
    // boxing): emits only the matching labels; interior covering cells
    // skip the exact test. The index rides the serialized plan (small:
    // dimension-side coverings). No size()>0 pre-filter — explode of an
    // empty array emits no rows, and a filter would be pushed into the
    // scan and evaluate the kernel twice.
    val stab = toCol(graft.functions.S2StabMatch(
      toExpr(col("cell_ord")), toExpr(col(latCol).cast("double")),
      toExpr(col(lngCol).cast("double")), index, regions.toArray))
    docs.withColumn("qid", explode(stab))
  }

  // =======================================================================
  // 2. term equi-join (large × large)
  // =======================================================================

  /** Explode docs into index terms for their point — the point scheme
    * (ancestor terms at levels minLevel..trueMaxLevel only, ~13 terms with
    * reference defaults; s2region_term_indexer.cc:155-175). */
  def docIndexTerms(docs: DataFrame, indexer: S2TermIndexer,
                    latCol: String = "lat", lngCol: String = "lng"): DataFrame = {
    val termsUdf = udf { (lat: Double, lng: Double) =>
      val p = V3.fromLatLngDegrees(lat, lng)
      indexer.indexTermsForPoint(p.x, p.y, p.z)
    }
    docs.withColumn("term", explode(termsUdf(col(latCol), col(lngCol))))
  }

  /** Full term-join pipeline for polygon regions given as text: emits
    * (doc columns…, qid) after exact PIP refine. Both sides may be
    * arbitrarily large; the candidate shuffle is the term equi-join (AQE
    * skew split applies; pre-salt with [[Skew.saltedTermJoin]] when a
    * region covers a hot cell).
    *
    * Contract: `doc_id` must be UNIQUE in `docs` (same contract as
    * [[Similarity.annTopK]]). The exactly-one-shared-term invariant makes
    * each (doc_id, qid) candidate arrive once PER DOC ROW — with
    * duplicate ids the final id-keyed payload re-join multiplies rows
    * (n matches × n payload rows); pre-dedupe upstream
    * (`dropDuplicates("doc_id")`) if ids can repeat.
    *
    * Shuffle discipline (the 100 TB shape): candidate generation runs
    * over an (doc_id, lat, lng) projection — each doc's ~13 exploded
    * ancestor terms carry three scalars through the exchange, never the
    * document payload (`spans` would otherwise ride the shuffle 13×).
    * Refined (doc_id, qid) matches re-join the full rows once, id-keyed
    * (AQE broadcasts the match side when selectivity allows).
    *
    * Skew handling is AUTOMATIC: before the candidate join, a sampled
    * doc-term histogram (one cheap job over `saltSampleFraction` of the
    * doc side) detects terms whose doc population exceeds
    * `saltThreshold` — the reference's own motivating skew case, a
    * continent-sized region's coarse ancestor term matching a whole
    * clustered doc population (s2density_tree.h:45-50) — and the join
    * runs through [[Skew.saltedTermJoin]]: hot-term doc rows spread over
    * `hash(doc_id) % saltFactor` sub-keys, region rows replicated only
    * for those terms. Results are identical (plan-level rebalancing
    * only); AQE skew split remains as backstop. Set `saltThreshold <= 0`
    * to disable detection entirely.
    *
    * The detection job itself is a fixed ~0.3 s cost, so it is SIZE-GATED:
    * it only runs when the doc side's optimizer size estimate is at least
    * `minDetectBytes` (default 64 MB — half a default shuffle partition:
    * below that the whole doc side is one reducer's comfortable load, so
    * the worst straggler is bounded by the input itself and cannot repay
    * a detection job; the skew A/B's measured salted win is at ~200 MB,
    * comfortably above the gate). At 100 TB the gate always passes; set
    * `minDetectBytes <= 0` to force detection regardless of size (tests,
    * A/B harnesses). */
  def termPolygonJoin(docs: DataFrame, polys: DataFrame,
                      polyTextCol: String = "poly", qidCol: String = "qid",
                      indexer: S2TermIndexer = new S2TermIndexer(),
                      saltThreshold: Long = 2000000L,
                      saltSampleFraction: Double = 0.001,
                      minDetectBytes: Long = 64L << 20): DataFrame = {
    val queryTermsUdf = udf { (text: String) =>
      indexer.queryTerms(graft.functions.PolyCache.get(text))
    }
    val slim = docs.select(col("doc_id"),
      col("lat").cast("double").as("lat"), col("lng").cast("double").as("lng"))
    val d = docIndexTerms(slim, indexer)
    val q = polys.select(col(qidCol), col(polyTextCol),
      explode(queryTermsUdf(col(polyTextCol))).as("term"))
    val salts: Map[String, Int] =
      if (saltThreshold <= 0 ||
          (minDetectBytes > 0 &&
            slim.queryExecution.optimizedPlan.stats.sizeInBytes <
              BigInt(minDetectBytes))) Map.empty
      else {
        // sample the DOCS (not the exploded terms) so the detection job
        // computes terms only for the sampled fraction
        val f = math.min(1.0, math.max(saltSampleFraction, 0.0))
        val src = if (f < 1.0)
          slim.sample(withReplacement = false, f, seed = 42L) else slim
        Skew.hotTerms(docIndexTerms(src, indexer).select("term"), "term",
          threshold = math.max(1L, (saltThreshold * f).toLong))
      }
    val joined =
      if (salts.isEmpty) d.join(q, "term")
      else Skew.saltedTermJoin(d, q, "term", col("doc_id"), salts)
    val matches = joined
      .drop("term")
      // no (doc, qid) dedup: a point doc's plain ancestor tokens meet a
      // region query's plain tokens (its DISJOINT covering cells) at most
      // once, so each candidate pair arrives exactly once — the invariant
      // S2SpatialJoinRule proves and SpatialSqlJoinSpec fuzz-tests. Dropping
      // the dedup removes a full shuffle of the candidate set.
      .where(S2.polygonContains(col(polyTextCol), col("lat"), col("lng")))
      .select(col("doc_id"), col(qidCol))
    docs.join(matches, "doc_id")
  }

  /** `WHERE EXISTS` over a spatial predicate, re-expressed soundly.
    *
    * [[graft.plans.S2SpatialJoinRule]] consciously does NOT rewrite
    * LeftSemi joins: the point side explodes ~13 ancestor index terms, so
    * a semi join over the exploded child would admit a matching row up to
    * 13 times, and collapsing the copies back needs a per-row identity a
    * logical rule cannot invent (its scaladoc documents the scoping).
    * This helper is the documented safe path for the EXISTS shape: an
    * INNER join on `condition` — which the rule plans as the term
    * equi-join + exact refine, never BroadcastNestedLoopJoin — projected
    * back to the left side and collapsed over `idCols`.
    *
    * Contract: `idCols` must uniquely identify `left` rows (the same
    * requirement [[graft.operators.RegionJoins.intersectsJoin]] states
    * for its id columns); duplicate ids would collapse distinct rows.
    * Cost at scale: one term equi-join plus one dedup shuffle keyed on
    * the id columns of the MATCHED subset only — no second pass over
    * `left`. */
  def existsJoin(left: DataFrame, idCols: Seq[String], right: DataFrame,
                 condition: Column): DataFrame = {
    require(idCols.nonEmpty,
      "existsJoin needs id columns that uniquely identify left rows")
    left.join(right, condition, "inner")
      .select(left.columns.toIndexedSeq.map(left(_)): _*)
      .dropDuplicates(idCols)
  }

  /** `WHERE NOT EXISTS` counterpart of [[existsJoin]]: the matched id set
    * (term equi-join + id-only dedup) is anti-joined back onto `left`.
    * Two joins are unavoidable — a non-matching row never appears in the
    * candidate join at all — but the second join's build side is ids
    * only (broadcastable whenever the match set is small). */
  def notExistsJoin(left: DataFrame, idCols: Seq[String], right: DataFrame,
                    condition: Column): DataFrame = {
    require(idCols.nonEmpty,
      "notExistsJoin needs id columns that uniquely identify left rows")
    val matched = left.join(right, condition, "inner")
      .select(idCols.map(left(_)): _*).dropDuplicates(idCols)
    left.join(matched, idCols, "left_anti")
  }

  // =======================================================================
  // 3. tile assignment (S2RegionSharder semantics)
  // =======================================================================

  /** Assign each doc to the tile whose cell union contains its leaf cell
    * (most-intersecting on ties — S2RegionSharder
    * GetMostIntersectingShard, /root/reference/src/s2/s2region_sharder.cc:32-153).
    * Tiles broadcast; narrow map over docs; `default` for docs outside all
    * tiles. */
  def tileAssign(docs: DataFrame, tiles: Seq[(Int, Array[Long])],
                 default: Int = -1): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val index = CellIntervalIndex.build(
      tiles.map { case (id, cells) => (id, cells, Array.empty[Long]) })
    docs.withColumn("tile_id",
      toCol(graft.functions.S2TileAssign(toExpr(col("cell_id")), index, default)))
  }

  /** Fused covering+PIP join → tile assignment → per-(region, tile)
    * counts: ONE imperative pass per partition over the scanned (lat,lng)
    * columns with zero intermediate row materialization, followed by a
    * driver-side merge of |regions|×|tiles| count matrices (bounded,
    * dimension-sized — the distributed analogue is treeReduce).
    *
    * Produces exactly the rows of
    * `tileAssign(broadcastContainsJoin(docs, regions), tiles)
    *    .groupBy("qid", "tile_id").count()` (differential-tested), but
    * without the Generate/UnsafeRow churn between the stab and the agg —
    * that materialization was measured to inflate per-task CPU ~1.7x at
    * 32 threads (allocation pressure), capping the flagship's scaling.
    * This is the "genuine per-partition imperative logic" case: the whole
    * query is an aggregation whose groups are statically known.
    *
    * Executes EAGERLY (runs a job) and returns a small local DataFrame. */
  def regionTileCounts(docs: DataFrame, regions: Seq[(Int, S2Region)],
                       tiles: Seq[(Int, Array[Long])],
                       latCol: String = "lat", lngCol: String = "lng",
                       maxCellsPerRegion: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    val regIndex = CellIntervalIndex.fromRegions(regions, maxCellsPerRegion)
    val tileIndex = CellIntervalIndex.build(
      tiles.map { case (id, cells) => (id, cells, Array.empty[Long]) })
    val regArr = regions.toArray
    val maxLab = regArr.iterator.map(_._1).max
    val regByLabel = new Array[S2Region](maxLab + 1)
    val slotByLabel = Array.fill(maxLab + 1)(-1)
    regArr.zipWithIndex.foreach { case ((lab, r), i) =>
      regByLabel(lab) = r; slotByLabel(lab) = i }
    val tileIds = tiles.map(_._1).toArray
    val maxTile = tileIds.max
    val tileSlot = Array.fill(maxTile + 1)(-1)
    tileIds.zipWithIndex.foreach { case (t, i) => tileSlot(t) = i }
    val nR = regArr.length; val nT = tileIds.length
    val bc = spark.sparkContext.broadcast(
      (regIndex, tileIndex, regByLabel, slotByLabel, tileSlot))

    val in = docs.select(col(latCol).cast("double"), col(lngCol).cast("double"))
    val merged = in.queryExecution.toRdd.mapPartitions { it =>
      val (rIdx, tIdx, regs, rSlot, tSlot) = bc.value
      // slot layout: region-slot * (nT + 1) + tile-slot, last column =
      // outside-all-tiles default
      val counts = new Array[Long](nR * (nT + 1))
      while (it.hasNext) {
        val row = it.next()
        // null lat/lng rows are dropped — matching the compositional plan,
        // whose null-intolerant native expressions never emit them
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
        val lat = row.getDouble(0); val lng = row.getDouble(1)
        // one trig evaluation per row: the unit vector feeds BOTH the
        // cell id (S2CellId.fromPoint = fromLatLngDegrees bit-exactly)
        // and the exact refine
        val p = V3.fromLatLngDegrees(lat, lng)
        val cellId = S2CellId.fromPoint(p.x, p.y, p.z)
        val ord = S2CellId.orderKey(cellId)
        val seg = rIdx.segmentOf(ord)
        if (seg >= 0) {
          var e = rIdx.entryBegin(seg)
          val end = rIdx.entryEnd(seg)
          var tileSlotOfRow = -2 // lazily resolved once per matching row
          while (e < end) {
            val lab = rIdx.labelAt(e)
            var hit = rIdx.interiorAt(e)
            if (!hit) {
              val reg = if (lab <= regs.length - 1 && lab >= 0) regs(lab) else null
              hit = reg != null && reg.contains(p)
            }
            if (hit) {
              if (tileSlotOfRow == -2) {
                val ts = tIdx.segmentOf(ord)
                tileSlotOfRow =
                  if (ts < 0) -1
                  else {
                    val b = tIdx.entryBegin(ts)
                    if (tIdx.entryEnd(ts) - b == 1) tSlot(tIdx.labelAt(b))
                    else {
                      val t = tIdx.mostIntersecting(Array(cellId), -1)
                      if (t >= 0) tSlot(t) else -1
                    }
                  }
              }
              val col = if (tileSlotOfRow >= 0) tileSlotOfRow else nT
              counts(rSlot(lab) * (nT + 1) + col) += 1L
            }
            e += 1
          }
        }
        }
      }
      Iterator.single(counts)
    }.reduce { (a, b) =>
      var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
    }

    import spark.implicits._
    val rows = for {
      ri <- 0 until nR; ti <- 0 to nT
      c = merged(ri * (nT + 1) + ti) if c > 0
    } yield (regArr(ri)._1, if (ti < nT) tileIds(ti) else -1, c)
    rows.toDF("qid", "tile_id", "count")
  }

  // =======================================================================
  // 4. kNN join (S2ClosestPointQuery semantics)
  // =======================================================================

  /** For each target, the k nearest docs (chord-angle metric, exact).
    *
    * Physical plan: targets broadcast → each partition computes its local
    * top-k per target with a bounded insertion heap (map-side partial
    * top-k, the aggregation analogue of the reference's best-first prune,
    * s2closest_point_query_base.h:259-327) → one small shuffle of
    * ≤ partitions×targets×k rows → global top-k via window. Distance ties
    * break by doc_id ascending (deterministic).
    *
    * For target sets ≥ `prefilterFrom`, the per-doc O(targets) scan is
    * replaced by spatially-pruned candidate stabs (the index-pruned
    * best-first search, s2closest_point_query_base.h:259-327, re-expressed
    * for the per-TARGET top-k direction). Because correctness is per
    * target ("its k globally nearest docs"), a doc may only be skipped for
    * target t when its distance provably exceeds t's k-th distance — which
    * requires a bound on that k-th distance first. Two passes:
    *
    *  1. certify: one counting pass over docs through a geometric ladder
    *     of per-target cap coverings; each doc exact-distance-buckets
    *     itself into the smallest ring that contains it, giving per-target
    *     ring histograms. The smallest ring r_t holding ≥ k docs certifies
    *     kth(t) ≤ chord(r_t).
    *  2. collect: stab one interval index of cap(t, r_t) coverings; a doc
    *     updates target t's heap only when d ≤ chord(r_t) — every true
    *     top-k member qualifies, so results are exact.
    *
    * Targets the ladder cannot certify (< k docs within the largest ring)
    * fall back to the full scan — by construction they live in near-empty
    * space, and the fallback is never worse than the unpruned path.
    * Per-doc work scales with local target density, not target count
    * (asserted sublinear by the 10⁴-target differential in S2JoinsSpec via
    * `distEvals`).
    *
    * Contract: `docs` must be DETERMINISTIC across jobs — the two pruned
    * passes scan it independently, so a non-reproducible input (sample(),
    * limit() off an unordered shuffle, rand()) could make pass-2 rows
    * inconsistent with the bounds pass-1 certified and silently drop true
    * neighbors. Cache/checkpoint such inputs first (any parquet/table
    * scan plus deterministic transforms is fine as-is).
    *
    * Returns (qid, doc_id, dist2, rank). */
  def knnJoin(docs: DataFrame, targets: Seq[(Int, V3)], k: Int,
              idCol: String = "doc_id",
              latCol: String = "lat", lngCol: String = "lng",
              prefilterFrom: Int = 64,
              ringRadii: Seq[Double] = Seq(0.005, 0.02, 0.08, 0.32),
              distEvals: org.apache.spark.util.LongAccumulator = null): DataFrame = {
    val ts = targets.toArray
    if (ts.length < prefilterFrom)
      knnFinish(knnPartialScan(docs, ts, (0 until ts.length).toArray, k,
        idCol, latCol, lngCol, null, distEvals), k)
    else
      knnJoinPruned(docs, ts, k, idCol, latCol, lngCol, ringRadii, distEvals)
  }

  /** Shared heap ordering: keep the k smallest by (dist2, id asc); the
    * max-heap orders lexicographically so the worst kept element sits on
    * top. */
  private val knnHeapOrd = new Ordering[(Double, Any)] {
    def compare(a: (Double, Any), b: (Double, Any)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c
      else a._2.asInstanceOf[Comparable[Any]].compareTo(b._2)
    }
  }

  /** Map-side partial top-k: each partition keeps a bounded heap per
    * target slot listed in `slots`. When `pruner` is non-null it is
    * (capIndex, perSlotChordBound, tailSlots): docs stab the index and
    * test only candidate + tail slots, skipping any candidate whose exact
    * distance exceeds its slot's certified bound. Emits
    * ≤ partitions×|slots|×k rows (qid, doc_id, dist2). */
  private def knnPartialScan(docs: DataFrame, ts: Array[(Int, V3)],
                             slots: Array[Int], k: Int,
                             idCol: String, latCol: String, lngCol: String,
                             pruner: (CellIntervalIndex, Array[Double], Array[Int]),
                             distEvals: org.apache.spark.util.LongAccumulator): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = docs.sparkSession
    val bT = spark.sparkContext.broadcast(ts)
    val bP = spark.sparkContext.broadcast(pruner)

    val in = docs.select(col(idCol), col(latCol).cast("double"), col(lngCol).cast("double"))
    val outSchema = StructType(Seq(
      StructField("qid", IntegerType, nullable = false),
      in.schema.fields(0).copy(name = "doc_id"),
      StructField("dist2", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val slotsArr = slots
    val ord = knnHeapOrd

    in.mapPartitions { it =>
      val tsL = bT.value
      val pr = bP.value
      // heap per GLOBAL slot (sparse map avoided: slot count is bounded)
      val heaps = new Array[scala.collection.mutable.PriorityQueue[(Double, Any)]](tsL.length)
      slotsArr.foreach { s =>
        heaps(s) = new scala.collection.mutable.PriorityQueue[(Double, Any)]()(ord) }
      var evals = 0L
      @inline def push(slot: Int, d: Double, id: Any): Unit = {
        val h = heaps(slot)
        if (h.size < k) h.enqueue((d, id))
        else if (ord.compare((d, id), h.head) < 0) { h.dequeue(); h.enqueue((d, id)); () }
      }
      it.foreach { r =>
        if (!r.isNullAt(1) && !r.isNullAt(2)) {
          val id = r.get(0)
          val p = V3.fromLatLngDegrees(r.getDouble(1), r.getDouble(2))
          if (pr == null) {
            var i = 0
            while (i < slotsArr.length) {
              val s = slotsArr(i)
              evals += 1
              push(s, (p - tsL(s)._2).norm2, id)
              i += 1
            }
          } else {
            val (idx, bound, tail) = pr
            val ordKey = S2CellId.orderKey(S2CellId.fromPoint(p.x, p.y, p.z))
            val cand = idx.labelsContaining(ordKey)
            var i = 0
            while (i < cand.length) {
              val s = cand(i)
              evals += 1
              val d = (p - tsL(s)._2).norm2
              if (d <= bound(s)) push(s, d, id)
              i += 1
            }
            i = 0
            while (i < tail.length) {
              val s = tail(i)
              evals += 1
              push(s, (p - tsL(s)._2).norm2, id)
              i += 1
            }
          }
        }
      }
      if (distEvals != null) distEvals.add(evals)
      slotsArr.iterator.flatMap { s =>
        heaps(s).iterator.map { case (d, id) => Row(tsL(s)._1, id, d) }
      }
    }(enc)
  }

  /** Global top-k finish over the partial heap output: one small shuffle
    * of ≤ partitions×targets×k scalar rows + a window over that tiny set. */
  private def knnFinish(partial: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("dist2"), col("doc_id"))
    partial.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Ring-certified pruned kNN (see [[knnJoin]] scaladoc for the scheme). */
  private def knnJoinPruned(docs: DataFrame, ts: Array[(Int, V3)], k: Int,
                            idCol: String, latCol: String, lngCol: String,
                            ringRadii: Seq[Double],
                            distEvals: org.apache.spark.util.LongAccumulator): DataFrame = {
    val spark = docs.sparkSession
    val nT = ts.length
    val nRings = ringRadii.length
    val radii = ringRadii.toArray
    val ringChord2 = radii.map(S1ChordAngle.fromRadians)
    // ring indexes are independent: build them on driver threads (the
    // coverer is per-thread — it is cheap, not thread-shared state)
    val rings: Array[CellIntervalIndex] = {
      val out = new Array[CellIntervalIndex](nRings)
      val threads = radii.indices.map { ri =>
        new Thread(() => {
          val cov = new S2RegionCoverer(8, 0, 30)
          out(ri) = CellIntervalIndex.build((0 until nT).map { i =>
            (i, cov.getCovering(S2Cap.fromCenterAngle(ts(i)._2, radii(ri))),
              Array.empty[Long])
          })
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      out
    }
    val tPts = ts.map(_._2)
    val bc = spark.sparkContext.broadcast((rings, ringChord2, tPts))

    // ---- pass 1: per-target ring histograms (exact distances) ----
    val counts = docs
      .select(col(latCol).cast("double"), col(lngCol).cast("double"))
      .queryExecution.toRdd.mapPartitions { it =>
        val (ringsL, chord2L, pts) = bc.value
        val histo = new Array[Long](nT * nRings)
        val dStamp = new Array[Int](nT)
        val dVal = new Array[Double](nT)
        val counted = new Array[Int](nT)
        var docNo = 0
        var evals = 0L
        while (it.hasNext) {
          val row = it.next()
          if (!row.isNullAt(0) && !row.isNullAt(1)) {
            docNo += 1
            val p = V3.fromLatLngDegrees(row.getDouble(0), row.getDouble(1))
            val ordKey = S2CellId.orderKey(S2CellId.fromPoint(p.x, p.y, p.z))
            var ri = 0
            while (ri < nRings) {
              val cand = ringsL(ri).labelsContaining(ordKey)
              var ci = 0
              while (ci < cand.length) {
                val t = cand(ci)
                if (counted(t) != docNo) {
                  val d =
                    if (dStamp(t) == docNo) dVal(t)
                    else {
                      evals += 1
                      val dd = (p - pts(t)).norm2
                      dStamp(t) = docNo; dVal(t) = dd; dd
                    }
                  if (d <= chord2L(ri)) { histo(t * nRings + ri) += 1; counted(t) = docNo }
                }
                ci += 1
              }
              ri += 1
            }
          }
        }
        if (distEvals != null) distEvals.add(evals)
        Iterator.single(histo)
      }.reduce { (a, b) =>
        var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
      }

    // certified radius slot per target: smallest ring holding >= k docs
    val ringOf = Array.fill(nT)(-1)
    var t = 0
    while (t < nT) {
      var cum = 0L; var ri = 0
      while (ri < nRings && ringOf(t) < 0) {
        cum += counts(t * nRings + ri)
        if (cum >= k) ringOf(t) = ri
        ri += 1
      }
      t += 1
    }
    val certified = (0 until nT).filter(ringOf(_) >= 0).toArray
    val tail = (0 until nT).filter(ringOf(_) < 0).toArray

    // ---- pass 2: stab cap(t, r_t), heap only certified candidates + tail ----
    val cov2 = new S2RegionCoverer(8, 0, 30)
    val capIdx = CellIntervalIndex.build(certified.toSeq.map { s =>
      (s, cov2.getCovering(S2Cap.fromCenterAngle(tPts(s), radii(ringOf(s)))),
        Array.empty[Long])
    })
    val bound = new Array[Double](nT)
    certified.foreach(s => bound(s) = ringChord2(ringOf(s)))
    val partial = knnPartialScan(docs, ts, (0 until nT).toArray, k,
      idCol, latCol, lngCol, (capIdx, bound, tail), distEvals)
    knnFinish(partial, k)
  }

  /** kNN join with BOTH sides large (targets NOT broadcastable): for each
    * target row, the k nearest docs. Iterative radius escalation — each
    * round, still-unsatisfied targets emit cap(r) covering query terms and
    * equi-join the docs' (precomputed) index terms; a target is certified
    * once its k-th candidate distance provably lies inside the searched
    * radius (candidates at radius r include every doc within r). Each
    * round is one term equi-join + per-target top-k — the large×large
    * analogue of [[knnJoin]]'s broadcast path. The ladder always finishes
    * with a whole-sphere round, so every target with ≥ k docs anywhere
    * certifies inside the distributed join; only targets with < k docs in
    * the entire table fall to the (count-gated) driver-side broadcast
    * fallback.
    *
    * Contract: `idCol` must be UNIQUE in `docs` — the per-round candidate
    * stream relies on the exactly-one-shared-term invariant instead of a
    * (qid, doc) dedup shuffle, so a duplicated doc id would occupy
    * multiple top-k rank slots and displace a true neighbor; pre-dedupe
    * upstream if ids can repeat.
    *
    * Returns (qid, doc_id, dist2, rank) like [[knnJoin]]. */
  def knnJoinLarge(docs: DataFrame, targets: DataFrame, k: Int,
                   qidCol: String = "qid",
                   tLatCol: String = "t_lat", tLngCol: String = "t_lng",
                   idCol: String = "doc_id",
                   latCol: String = "lat", lngCol: String = "lng",
                   radii: Seq[Double] = Seq(0.005, 0.02, 0.08, 0.32),
                   maxFallbackTargets: Int = 100000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val indexer = new S2TermIndexer()
    val docTerms = docIndexTerms(
      docs.select(col(idCol), col(latCol).cast("double").as(latCol),
        col(lngCol).cast("double").as(lngCol)), indexer, latCol, lngCol)
      .select(col(idCol), col(latCol), col(lngCol), col("term"))
    val capTerms = udf { (lat: Double, lng: Double, r: Double) =>
      indexer.queryTerms(S2Cap.fromCenterAngle(V3.fromLatLngDegrees(lat, lng), r))
    }
    val dist2 = udf { (tLat: Double, tLng: Double, lat: Double, lng: Double) =>
      (V3.fromLatLngDegrees(tLat, tLng) - V3.fromLatLngDegrees(lat, lng)).norm2
    }
    val w = Window.partitionBy(qidCol).orderBy(col("dist2"), col(idCol))

    var unsatisfied = targets.select(col(qidCol),
      col(tLatCol).cast("double").as(tLatCol), col(tLngCol).cast("double").as(tLngCol))
    var results: DataFrame = null
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // the ladder always ends at pi: the final round's cap covers the whole
    // sphere, so every target with >= k docs ANYWHERE certifies inside the
    // distributed join — the driver-side fallback below can only see
    // targets for which fewer than k docs exist at all (or user-truncated
    // ladders), never "the radii under-covered"
    val fullRadii = if (radii.lastOption.contains(math.Pi)) radii else radii :+ math.Pi
    // per round: ONE action (the eager count of still-unsatisfied targets,
    // which also materializes its cache); candidates are cached because
    // both the certification aggregate and the result join read them
    var unsatCount = -1L
    for (r <- fullRadii if unsatCount != 0) {
      val chord2 = S1ChordAngle.fromRadians(r)
      val q = unsatisfied.withColumn("term",
        explode(capTerms(col(tLatCol), col(tLngCol), lit(r))))
      // No (qid, doc) dedup needed: a point doc's index terms are plain
      // ancestor tokens, and the only plain tokens a cap query emits are
      // its covering cells — a normalized DISJOINT union, of which at
      // most one lies on the doc's ancestor chain, so each (target, doc)
      // candidate pair arrives exactly once (same invariant
      // S2SpatialJoinRule relies on; fuzz-tested in SpatialSqlJoinSpec).
      // Skipping the dedup also lets Spark's WindowGroupLimit rewrite
      // run the rank filter map-side: each input task forwards at most k
      // rows per target into the window exchange, so the shuffled volume
      // is O(tasks × targets × k), independent of candidate count.
      val cands = docTerms.join(q, "term").drop("term")
        .withColumn("dist2", dist2(col(tLatCol), col(tLngCol), col(latCol), col(lngCol)))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .cache()
      cached += cands
      // certified iff k candidates exist and the k-th is inside radius r
      val perTarget = cands.groupBy(qidCol)
        .agg(count(lit(1)).as("n"), max("dist2").as("kth"))
        .where(col("n") >= k && col("kth") <= chord2)
      val roundResult = cands.join(perTarget.select(qidCol), qidCol)
        .select(qidCol, idCol, "dist2", "rank").cache()
      cached += roundResult
      results = if (results == null) roundResult
        else results.unionByName(roundResult)
      unsatisfied = unsatisfied.join(perTarget.select(qidCol), Seq(qidCol),
        "left_anti").cache()
      cached += unsatisfied
      unsatCount = unsatisfied.count()
    }
    // stragglers: only targets with < k docs in the whole table reach here
    // (the pi round certifies everything else). Count-gate the collect so a
    // pathological input fails loudly instead of exhausting driver memory.
    val leftoverCount = math.max(0L, unsatCount)
    require(leftoverCount <= maxFallbackTargets,
      s"knnJoinLarge: $leftoverCount targets uncertified after the radius " +
        s"ladder (cap $maxFallbackTargets) — fewer than k=$k docs exist for " +
        "them; raise maxFallbackTargets or filter such targets upstream")
    val leftovers = unsatisfied.collect()
    if (leftovers.nonEmpty) {
      val ts = leftovers.map(row =>
        (row.get(0).asInstanceOf[Number].intValue(),
          V3.fromLatLngDegrees(row.getDouble(1), row.getDouble(2)))).toSeq
      val fb = knnJoin(docs, ts, k, idCol, latCol, lngCol)
        .select(col("qid").as(qidCol), col("doc_id").as(idCol), col("dist2"), col("rank"))
      results = if (results == null) fb else results.unionByName(fb)
    }
    // materialize before releasing the per-round caches the plan reads
    val out = if (results == null) spark.emptyDataFrame
      else {
        val rows = results.cache()
        rows.count()
        rows
      }
    cached.foreach(df => { df.unpersist(blocking = false); () })
    out
  }

  /** Distance join: docs within `radiusRad` of any target cap center.
    * Broadcast caps as an interval index of their coverings; refine with
    * the exact chord test. */
  def withinDistanceJoin(docs: DataFrame, targets: Seq[(Int, V3)],
                         radiusRad: Double): DataFrame = {
    val regions = targets.map { case (id, c) =>
      (id, S2Cap.fromCenterAngle(c, radiusRad): S2Region) }
    broadcastContainsJoin(docs, regions)
  }
}
