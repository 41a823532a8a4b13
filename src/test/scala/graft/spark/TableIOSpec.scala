package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators.S2Joins
import graft.runtime.TableIO
import graft.sources.DocSource

class TableIOSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("spatial table: write, manifest pruning, region scan equals full filter") {
    val docs = S2Joins.withCellId(DocSource.docs(spark, 4000L),
      col("lat"), col("lng"))
    val path = java.nio.file.Files.createTempDirectory("graft-tbl").toString + "/docs"
    TableIO.writeSpatial(docs, path, partLevel = 3)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_graft_manifest.json")))

    val cap = S2Cap.fromCenterAngle(V3.fromLatLngDegrees(20, 30), 0.25)
    val keep = TableIO.partitionsForRegion(path, cap)
    val allParts = TableIO.readSpatial(spark, path)
      .select("cell_part").distinct().count()
    assert(keep.nonEmpty && keep.length < allParts,
      s"pruning kept ${keep.length} of $allParts")

    val scanned = TableIO.scanRegion(spark, path, cap)
    val expected = docs.collect().count { r =>
      cap.contains(V3.fromLatLngDegrees(
        r.getAs[Double]("lat"), r.getAs[Double]("lng")))
    }
    assert(scanned.count() == expected)
    assert(expected > 0)

    // partition pruning reaches the scan: the physical plan carries the
    // cell_part partition filter (directories skipped before file listing)
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell_part"), plan)

    // round-trip preserves the span fingerprint invariant
    val viol = TableIO.readSpatial(spark, path)
      .where(DocSource.spansFingerprint(col("spans")) =!= col("spans_fp"))
      .count()
    assert(viol == 0)
  }

  test("cell_ord range predicates reach the parquet scan as pushed filters") {
    // the Hilbert physical-design claim: rows are written cell_ord-sorted,
    // so a covering cell's [rangeMin, rangeMax] interval must arrive at
    // the parquet reader as pushed min/max filters — row groups outside
    // the interval are skipped without decode, the file-level analogue of
    // S2CellUnion::Contains binary search (s2cell_union.h:180-195)
    val docs = S2Joins.withCellId(DocSource.docs(spark, 2600L),
      col("lat"), col("lng"))
    val path = java.nio.file.Files.createTempDirectory("graft-ord").toString + "/docs"
    TableIO.writeSpatial(docs, path, partLevel = 3)
    val probe = S2CellId.parent(
      S2CellId.fromLatLngDegrees(20.0, 30.0), 8)
    val lo = S2CellId.orderKey(S2CellId.rangeMin(probe))
    val hi = S2CellId.orderKey(S2CellId.rangeMax(probe))
    val scanned = TableIO.readSpatial(spark, path)
      .where(col("cell_ord") >= lo && col("cell_ord") <= hi)
      .select("doc_id", "cell_ord")
    scanned.collect()
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThanOrEqual(cell_ord") &&
      plan.contains("LessThanOrEqual(cell_ord"), plan)
    // and the projection pruned the wide spans column out of the read
    assert(plan.contains("ReadSchema") && !plan.contains("spans:array"), plan)
  }

  test("dynamic partition pruning fires when covering tokens arrive as a table") {
    // scanRegion prunes with literal tokens; when the coverings live in
    // another TABLE (precomputed region coverings, a tile manifest), the
    // same skip must happen at runtime via Spark's DPP — the plan carries
    // a dynamicpruning subquery on cell_part instead of scanning all
    // partitions. At 100 TB this is the difference between reading 6
    // partitions and reading the table.
    val docs = S2Joins.withCellId(DocSource.docs(spark, 4200L),
      col("lat"), col("lng"))
    val path = java.nio.file.Files.createTempDirectory("graft-dpp").toString + "/docs"
    TableIO.writeSpatial(docs, path, partLevel = 3)
    // a coverings TABLE (qid -> partition token) for three regions;
    // the query selects one region — the selective filter Spark's DPP
    // rule needs to justify the pruning subquery
    val regions = Seq(
      1 -> S2Cap.fromCenterAngle(V3.fromLatLngDegrees(20, 30), 0.25),
      2 -> S2Cap.fromCenterAngle(V3.fromLatLngDegrees(-40, -100), 0.2),
      3 -> S2Cap.fromCenterAngle(V3.fromLatLngDegrees(55, 140), 0.15))
    import spark.implicits._
    val covPath = path + "_coverings"
    regions.flatMap { case (q, r) =>
      TableIO.partitionsForRegion(path, r).map(t => (q, t))
    }.toDF("qid", "tok").write.mode("overwrite").parquet(covPath)
    // materialized dim (a LocalRelation would constant-fold the filter
    // away before the PartitionPruning rule looks for it)
    val covDf = spark.read.parquet(covPath)
    val joined = TableIO.readSpatial(spark, path)
      .join(broadcast(covDf.where(col("qid") === 1)),
        col("cell_part") === col("tok"))
    val n = joined.count()
    val toks1 = TableIO.partitionsForRegion(path, regions.head._2)
    val expected = TableIO.readSpatial(spark, path)
      .where(col("cell_part").isin(toks1.toIndexedSeq: _*)).count()
    assert(n == expected && n > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
  }

  test("bucketed co-location join: both sides pre-shuffled, zero exchanges") {
    val docsA = S2Joins.withCellId(DocSource.docs(spark, 3000L),
      col("lat"), col("lng"))
    val docsB = S2Joins.withCellId(DocSource.docs(spark, 3001L),
      col("lat"), col("lng"))
    TableIO.writeBucketed(docsA, "graft_bkt_a", numBuckets = 8, partLevel = 4)
    TableIO.writeBucketed(docsB, "graft_bkt_b", numBuckets = 8, partLevel = 4)
    // disable broadcast so only bucket alignment can avoid the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.table("graft_bkt_a")
        .select(col("doc_id").as("a_id"), col("cell_part"))
      val b = spark.table("graft_bkt_b")
        .select(col("doc_id").as("b_id"), col("cell_part"))
      val joined = a.join(b, "cell_part")
      val got = joined.collect().length.toLong
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should read pre-shuffled buckets:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // multiset cardinality equals the per-key product of side counts
      val cA = docsA
        .withColumn("cell_part", graft.functions.S2.token(
          graft.functions.S2.parent(col("cell_id"), 4)))
        .groupBy("cell_part").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val cB = docsB
        .withColumn("cell_part", graft.functions.S2.token(
          graft.functions.S2.parent(col("cell_id"), 4)))
        .groupBy("cell_part").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = cA.map { case (k, n) => n * cB.getOrElse(k, 0L) }.sum
      assert(got == expected && expected > 0, s"got $got expected $expected")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
