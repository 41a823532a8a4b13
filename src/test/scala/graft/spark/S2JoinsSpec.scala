package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators._
import graft.sources.DocSource

/** Differential tests for the distributed spatial operators: every join
  * result is compared against the per-row brute-force kernel (the
  * reference's own test methodology — optimized vs use_brute_force,
  * /root/reference/src/s2/s2closest_edge_query_test.cc:748-877). */
class S2JoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val docs = S2Joins.withCellId(
    DocSource.docs(spark, 5000L, seed = 42L), col("lat"), col("lng")).cache()

  def collectDocs(): Array[(String, Double, Double)] =
    docs.select("doc_id", "lat", "lng").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))

  test("DocSource is deterministic and spans are interleaved with increasing offsets") {
    val a = DocSource.docs(spark, 300L).select("doc_id", "spans_fp").collect()
    val b = DocSource.docs(spark, 300L).select("doc_id", "spans_fp").collect()
    assert(a.map(r => (r.getString(0), r.getLong(1))).toSeq ==
           b.map(r => (r.getString(0), r.getLong(1))).toSeq)
    val spans = DocSource.docs(spark, 50L)
      .select(explode(col("spans")).as("s"), col("doc_id"))
      .select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset").collect()
    spans.foreach { r =>
      val kind = r.getString(1)
      assert(kind == "text" || kind == "media")
      if (kind == "text") { assert(r.getString(2) != null && r.getString(3) == null) }
      else { assert(r.getString(2) == null && r.getString(3) != null) }
    }
    // offsets strictly increasing per doc
    val byDoc = spans.groupBy(_.getString(0))
    byDoc.values.foreach { rs =>
      val offs = rs.map(_.getInt(4))
      assert(offs.sameElements(offs.sorted))
    }
  }

  test("broadcastContainsJoin matches brute-force region containment") {
    val regions: Seq[(Int, S2Region)] = Seq(
      1 -> S2Cap.fromCenterAngle(V3.fromLatLngDegrees(10, 20), 0.15),
      2 -> S2LatLngRect.fromDegrees(-25, 100, 5, 140),
      3 -> S2TextFormat.parsePolygon("0:0, 0:35, 30:35, 30:0"),
      4 -> S2Cap.fromCenterAngle(V3.fromLatLngDegrees(-80, 0), 0.3))
    val got = S2Joins.broadcastContainsJoin(docs, regions)
      .select("doc_id", "qid").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    val want = (for {
      (id, lat, lng) <- collectDocs()
      (q, reg) <- regions
      if reg.contains(V3.fromLatLngDegrees(lat, lng))
    } yield (id, q)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("composite regions (union/intersection) join like their pointwise combination") {
    val cap = S2Cap.fromCenterAngle(V3.fromLatLngDegrees(10, 20), 0.15)
    val rect = S2LatLngRect.fromDegrees(-25, 100, 5, 140)
    val poly = S2TextFormat.parsePolygon("0:0, 0:35, 30:35, 30:0")
    val regions: Seq[(Int, S2Region)] = Seq(
      1 -> S2RegionUnion(Seq(cap, poly)),
      2 -> S2RegionIntersection(Seq(cap, poly)),
      3 -> S2RegionUnion(Seq(rect, S2RegionIntersection(Seq(cap, poly)))))
    val got = S2Joins.broadcastContainsJoin(docs, regions)
      .select("doc_id", "qid").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    val want = (for {
      (id, lat, lng) <- collectDocs()
      p = V3.fromLatLngDegrees(lat, lng)
      (q, reg) <- regions
      if reg.contains(p)
    } yield (id, q)).toSet
    assert(got == want)
    assert(want.exists(_._2 == 2)) // intersection non-trivial
  }

  test("broadcast join preserves the span-sequence invariant") {
    val regions: Seq[(Int, S2Region)] =
      Seq(1 -> S2LatLngRect.fromDegrees(-90, -180, 90, 180))
    val joined = S2Joins.broadcastContainsJoin(docs, regions)
    val bad = joined
      .withColumn("fp2", DocSource.spansFingerprint(col("spans")))
      .where(col("fp2") =!= col("spans_fp")).count()
    assert(bad == 0)
    assert(joined.count() == docs.count()) // full rect keeps every doc
  }

  test("termPolygonJoin matches broadcast join on polygons") {
    import spark.implicits._
    val polyTexts = Seq(
      (3, "0:0, 0:35, 30:35, 30:0"),
      (7, "-40:-80, -40:-30, -10:-30, -10:-80"))
    val polys = polyTexts.toDF("qid", "poly")
    val got = S2Joins.termPolygonJoin(docs, polys)
      .select("doc_id", "qid").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    val regions = polyTexts.map { case (q, t) =>
      (q, S2TextFormat.parsePolygon(t): S2Region) }
    val want = (for {
      (id, lat, lng) <- collectDocs()
      (q, reg) <- regions
      if reg.contains(V3.fromLatLngDegrees(lat, lng))
    } yield (id, q)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("knnJoin matches brute-force k nearest") {
    val targets = Seq(
      1 -> V3.fromLatLngDegrees(10, 20),
      2 -> V3.fromLatLngDegrees(-45, 170),
      3 -> V3.fromLatLngDegrees(80, -60))
    val k = 7
    val got = S2Joins.knnJoin(docs, targets, k)
      .select("qid", "doc_id", "rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    val all = collectDocs()
    val want = (for ((q, t) <- targets) yield {
      all.map { case (id, lat, lng) =>
        (id, (V3.fromLatLngDegrees(lat, lng) - t).norm2) }
        .sortBy { case (id, d) => (d, id) }
        .take(k).zipWithIndex
        .map { case ((id, _), i) => (q, id, i + 1) }
    }).flatten.toSet
    assert(got == want)
  }

  test("knnJoin pruned path = full scan at 10^4 targets, with sublinear per-row work") {
    val rnd = new scala.util.Random(7)
    // 10^4 targets: most near doc clusters, a band of spread-out ones, and
    // a few in empty ocean (exercising the uncertified-tail fallback)
    val sample = docs.select("lat", "lng").limit(200).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val targets = (0 until 10000).map { i =>
      if (i % 50 == 49) // spread: uniform on the sphere
        (i, V3.fromLatLngDegrees(rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 360 - 180))
      else {
        val (la, ln) = sample(i % sample.length)
        (i, V3.fromLatLngDegrees(
          math.max(-89, math.min(89, la + rnd.nextDouble() * 4 - 2)),
          ln + rnd.nextDouble() * 4 - 2))
      }
    }
    val k = 3
    val acc = spark.sparkContext.longAccumulator("knn_dist_evals")
    val pruned = S2Joins.knnJoin(docs, targets, k, distEvals = acc)
      .select("qid", "doc_id", "rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    val scan = S2Joins.knnJoin(docs, targets, k, prefilterFrom = Int.MaxValue)
      .select("qid", "doc_id", "rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(pruned == scan)
    assert(pruned.size == 10000 * k)
    // unpruned work would be 2 passes x docs x targets = 1e8 exact
    // distances; require >=10x pruning (in practice far better)
    val full = 2L * docs.count() * targets.size
    assert(acc.value < full / 10,
      s"dist evals ${acc.value} not sublinear vs full $full")
  }

  test("knnJoin breaks exact distance ties by ascending doc id") {
    import spark.implicits._
    // two docs bit-identically equidistant from the target (mirrored lng
    // around 0 -> same chord distance), plus a filler
    val tied = Seq(("docB", 10.0, 15.0), ("docA", 10.0, -15.0),
      ("docZ", 50.0, 50.0)).toDF("doc_id", "lat", "lng")
    val target = Seq(1 -> V3.fromLatLngDegrees(10.0, 0.0))
    val got = S2Joins.knnJoin(tied, target, k = 1)
      .select("doc_id").head().getString(0)
    assert(got == "docA") // ascending id wins the tie
  }

  test("nearDupClusters merges buckets bridged by a shared non-minimal member") {
    import spark.implicits._
    // three identical texts: every pair shares every LSH band; ids chosen
    // so transitivity matters (all must collapse to min id 1)
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq((7L, t), (1L, t), (5L, t),
      (9L, "unrelated words that share nothing with the others at all ok"))
      .toDF("doc_id", "text")
    val labels = Dedup.nearDupClusters(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels.get(5L).contains(1L))
    assert(labels.get(7L).contains(1L))
    assert(!labels.contains(1L)) // representative emits no row
    assert(!labels.contains(9L)) // singleton
  }

  test("knnJoinLarge (large x large, radius ladder) = broadcast knnJoin") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // targets biased toward doc clusters + one isolated (fallback path)
    val sample = docs.select("lat", "lng").limit(25).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val targets = sample.zipWithIndex.map { case ((la, ln), i) =>
      (i, la + rnd.nextDouble() * 2 - 1, ln + rnd.nextDouble() * 2 - 1) } :+
      (25, -89.0, 170.0) // isolated near the pole
    val tDf = targets.toSeq.toDF("qid", "t_lat", "t_lng")
    val large = S2Joins.knnJoinLarge(docs, tDf, k = 5)
      .select("qid", "doc_id", "rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    val bcast = S2Joins.knnJoin(docs,
      targets.toSeq.map { case (q, la, ln) => (q, V3.fromLatLngDegrees(la, ln)) },
      k = 5)
      .select("qid", "doc_id", "rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(large == bcast)
    assert(large.size == 26 * 5)
  }

  test("knnJoinLarge: all-isolated targets certify in the pi round (no driver collect)") {
    import spark.implicits._
    // every target sits in doc-empty ocean — the old 'few by construction'
    // assumption is maximally violated; the pi round must certify them all
    // distributed, so the count-gated fallback sees zero targets
    val targets = (0 until 30).map(i => (i, -60.0 + i * 0.3, -120.0 + i * 0.5))
    val tDf = targets.toDF("qid", "t_lat", "t_lng")
    // cap of 0 would trip on ANY fallback -> proves nothing was collected
    val large = S2Joins.knnJoinLarge(docs, tDf, k = 4, maxFallbackTargets = 0)
      .select("qid", "doc_id", "rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    val bcast = S2Joins.knnJoin(docs,
      targets.map { case (q, la, ln) => (q, V3.fromLatLngDegrees(la, ln)) }, k = 4)
      .select("qid", "doc_id", "rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(large == bcast)
    assert(large.size == 30 * 4)
  }

  test("knnJoinLarge count-gates the degenerate fewer-than-k-docs fallback") {
    import spark.implicits._
    val tiny = S2Joins.withCellId(
      Seq(("a", 10.0, 10.0), ("b", 11.0, 11.0)).toDF("doc_id", "lat", "lng"),
      col("lat"), col("lng"))
    val tDf = Seq((1, 10.0, 10.0), (2, 50.0, 50.0)).toDF("qid", "t_lat", "t_lng")
    // k=5 > 2 docs: no target can certify; with cap 0 the gate must fire
    val e = intercept[IllegalArgumentException] {
      S2Joins.knnJoinLarge(tiny, tDf, k = 5, maxFallbackTargets = 0)
    }
    assert(e.getMessage.contains("uncertified"))
    // with the default cap the fallback finishes them exactly
    val got = S2Joins.knnJoinLarge(tiny, tDf, k = 5)
      .select("qid", "doc_id").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "a"), (1, "b"), (2, "a"), (2, "b")))
  }

  test("regionTileCounts (fused pass) = broadcastContainsJoin + tileAssign + groupBy") {
    val regions = graft.Bench.benchRegions
    val tiles = graft.Bench.benchTiles
    val fused = S2Joins.regionTileCounts(docs, regions, tiles)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val compositional = S2Joins.tileAssign(
        S2Joins.broadcastContainsJoin(docs, regions), tiles)
      .groupBy("qid", "tile_id").count()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(fused == compositional)
    assert(fused.nonEmpty)
  }

  test("tileAssign picks the containing tile; disjoint level-2 tiling partitions all docs") {
    // tiles = all level-2 cells grouped round-robin into 24 tiles: a
    // disjoint partition of the sphere, so every doc gets a tile.
    val level2 = Iterator.iterate(S2CellId.begin(2))(S2CellId.next)
      .takeWhile(_ != S2CellId.end(2)).toArray
    val tiles = level2.zipWithIndex.groupBy(_._2 % 24).toSeq
      .map { case (tid, cs) => (tid, cs.map(_._1)) }
    val assigned = S2Joins.tileAssign(docs, tiles)
    assert(assigned.where(col("tile_id") === -1).count() == 0)
    // per-doc check vs kernel: tile of parent(cell,2)
    val cellToTile = tiles.flatMap { case (tid, cs) => cs.map(_ -> tid) }.toMap
    val rows = assigned.select("cell_id", "tile_id").collect()
    rows.foreach { r =>
      assert(cellToTile(S2CellId.parent(r.getLong(0), 2)) == r.getInt(1))
    }
  }

  test("density rollup sums to doc count; equal-weight repartition balances skew") {
    val total = docs.count()
    val d = Density.cellDensity(docs, 4)
    assert(d.agg(sum("weight")).head().getLong(0) == total)
    val tree = Density.densityTree(docs, 1, 4)
    // each level's weights sum to total
    val perLevel = tree.groupBy("level").agg(sum("weight")).collect()
    perLevel.foreach(r => assert(r.getLong(1) == total))
    // equal-weight shards: no shard > 3x ideal despite 80% clustering
    val sharded = Density.equalWeightRepartition(docs, 6, 16)
    val sizes = sharded.groupBy(spark_partition_id()).count()
      .collect().map(_.getLong(1))
    assert(sizes.max <= total) // sanity
    assert(sizes.max < 3L * (total / 16 + 1),
      s"worst shard ${sizes.max} vs ideal ${total / 16}")
  }

  test("StageRunner resumes: second run skips completed stages") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stages").toString
    val r1 = new graft.runtime.StageRunner(spark, tmp, "job1")
    val out1 = r1.stage("ingest") { docs.select("doc_id", "cell_ord") }
    assert(out1.count() == docs.count())
    assert(!r1.results.head.skipped)
    val r2 = new graft.runtime.StageRunner(spark, tmp, "job1")
    val out2 = r2.stage("ingest") {
      throw new RuntimeException("must not rebuild a completed stage")
    }
    assert(out2.count() == docs.count())
    assert(r2.results.head.skipped)
  }

  test("hot-term salting preserves join results") {
    import spark.implicits._
    val big = (0 until 5000).map(i => (s"d$i", if (i % 10 < 8) "HOT" else s"t${i % 50}"))
      .toDF("doc_id", "term")
    val small = Seq(("HOT", 1), ("t3", 2), ("t7", 3)).toDF("term", "qid")
    val plain = big.join(small, "term").select("doc_id", "qid")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val salts = Skew.hotTerms(big, "term", threshold = 1000)
    assert(salts.contains("HOT"))
    val salted = Skew.saltedTermJoin(big, small, "term", col("doc_id"), salts)
      .select("doc_id", "qid").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(salted == plain)
  }
}
