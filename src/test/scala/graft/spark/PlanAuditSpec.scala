package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators._
import graft.sources.DocSource

/** Physical-plan audits: the properties that make these operators hold at
  * 100 TB are asserted on the executed plan, not just observed manually —
  * column pruning reaches the scan, broadcast joins stay exchange-free,
  * aggregations keep partial (map-side) phases, and native expressions
  * stay inside WholeStageCodegen. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val docsPath: String = {
    val p = java.nio.file.Files.createTempDirectory("plan-audit").toString + "/docs"
    DocSource.docs(spark, 2000L).write.mode("overwrite").parquet(p)
    p
  }

  def regions: Seq[(Int, S2Region)] = Seq(
    1 -> S2TextFormat.parsePolygon("0:0, 0:35, 30:35, 30:0"),
    2 -> S2Cap.fromCenterAngle(V3.fromLatLngDegrees(48, 2), 0.08))

  test("covering+PIP join: scan prunes to lat/lng, zero exchanges, codegen on") {
    val docs = S2Joins.withCellId(spark.read.parquet(docsPath), col("lat"), col("lng"))
    val joined = S2Joins.broadcastContainsJoin(docs, regions)
      .groupBy("qid").count()
    joined.collect() // materialize so AQE finalizes + codegen markers appear
    // AQE prints Final + Initial sections; audit the final plan only
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scanLine = plan.split("\n").find(_.contains("ReadSchema")).get
    assert(scanLine.contains("ReadSchema: struct<lat:double,lng:double>"),
      s"scan did not prune to lat/lng: $scanLine")
    // join itself adds no exchange; the single exchange is the final agg
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1)")) // *(n) = codegen stage markers
    // partial aggregation before the exchange
    assert(plan.contains("HashAggregate"), plan)
  }

  test("pre-join operators add no shuffle at all") {
    val docs = S2Joins.withCellId(spark.read.parquet(docsPath), col("lat"), col("lng"))
    val joined = S2Joins.broadcastContainsJoin(docs, regions)
    val tiled = S2Joins.tileAssign(joined, Seq((0, Array(S2CellId.fromFace(0)))))
    val plan = tiled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("density rollup keeps map-side partial aggregation") {
    val docs = S2Joins.withCellId(spark.read.parquet(docsPath), col("lat"), col("lng"))
    val plan = Density.cellDensity(docs, 6).queryExecution.executedPlan.toString
    // two HashAggregates (partial + final) around one exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }

  test("term join plans as an equi-join (hash or sort-merge, AQE-eligible)") {
    import spark.implicits._
    val docs = S2Joins.withCellId(spark.read.parquet(docsPath), col("lat"), col("lng"))
    val polys = Seq((1, "0:0, 0:35, 30:35, 30:0")).toDF("qid", "poly")
    val joined = S2Joins.termPolygonJoin(docs, polys)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("Join") || plan.contains("join"), plan)
    // equi-join on term: planner chose hash/sort-merge/broadcast, not BNLJ
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("term join candidate shuffles never carry the document payload") {
    import spark.implicits._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // force shuffle joins + non-adaptive plan so every exchange is visible
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = S2Joins.withCellId(spark.read.parquet(docsPath), col("lat"), col("lng"))
      val polys = Seq((1, "0:0, 0:35, 30:35, 30:0"),
        (2, "-40:-80, -40:-30, -10:-30, -10:-80")).toDF("qid", "poly")
      val joined = S2Joins.termPolygonJoin(docs, polys)
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty)
      // `spans` (the interleaved payload) may ride exactly ONE exchange:
      // the final id-keyed payload re-join — never the per-term explode
      // (13 terms/doc), the term equi-join, or the candidate dedup
      val spansCarrying = exchanges.filter(_.output.exists(_.name == "spans"))
      assert(spansCarrying.size <= 1,
        spansCarrying.map(_.output.map(_.name).mkString(",")).mkString("\n"))
      assert(exchanges.size - spansCarrying.size >= 2)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("closest-shapes join is a pure narrow map: zero exchanges") {
    val docs = S2Joins.withCellId(spark.read.parquet(docsPath), col("lat"), col("lng"))
    val shapes = Seq(
      EdgeQueries.Shape(1, Array(V3.fromLatLngDegrees(0, 0),
        V3.fromLatLngDegrees(0, 30)), closed = false),
      EdgeQueries.Shape(2, Array(V3.fromLatLngDegrees(40, 40),
        V3.fromLatLngDegrees(50, 60)), closed = false))
    val joined = EdgeQueries.closestShapesJoin(docs, shapes, k = 2, maxDist2 = 0.05)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan) // rank emitted in the flatMap
  }

  test("salted term join still plans as a single equi-join (no BNLJ)") {
    import spark.implicits._
    val docs = S2Joins.withCellId(spark.read.parquet(docsPath), col("lat"), col("lng"))
    val indexer = new S2TermIndexer()
    val docTerms = S2Joins.docIndexTerms(docs, indexer)
    val hot = Skew.hotTerms(docTerms, "term", threshold = 50)
    val polys = Seq((1, "0:0, 0:35, 30:35, 30:0")).toDF("qid", "poly")
    val queryTermsUdf = udf { (text: String) =>
      indexer.queryTerms(graft.functions.PolyCache.get(text)) }
    val q = polys.select(col("qid"),
      explode(queryTermsUdf(col("poly"))).as("term"))
    val joined = Skew.saltedTermJoin(docTerms, q, "term", col("doc_id"), hot)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert("Join".r.findAllIn(plan).length >= 1, plan)
  }

  test("termPolygonJoin auto-salts hot terms on clustered docs, same rows") {
    val docs = S2Joins.withCellId(spark.read.parquet(docsPath), col("lat"), col("lng"))
    import spark.implicits._
    // continent-scale quad: its coarse covering terms match whole clusters
    val polys = Seq((1, graft.SparkEntry.skewPolyText))
      .toDF("qid", "poly")
    // 2000 docs, 80% in 20 clusters -> ~80 docs share each cluster's
    // ancestor terms; threshold 20 must trigger detection
    val salted = S2Joins.termPolygonJoin(docs, polys,
      saltThreshold = 20L, saltSampleFraction = 1.0, minDetectBytes = 0L)
    val unsalted = S2Joins.termPolygonJoin(docs, polys, saltThreshold = 0L)
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"), s"auto-salt did not engage:\n$plan")
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("doc_id", "qid").collect().map(r => (r.getString(0), r.getInt(1))).sorted
    assert(key(salted).sameElements(key(unsalted)))
    assert(salted.count() > 0)
    // still a pure equi-join plan — no BNLJ from the salt columns
    val phys = salted.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!phys.contains("BroadcastNestedLoopJoin"), phys)
    assert(!phys.contains("CartesianProduct"), phys)
  }

  test("q_s2_sql_join driver gate plans term-join, not BNLJ/cartesian") {
    // the actual gate query text (pure SQL through S2SpatialJoinRule)
    for (name <- Seq("q_s2_sql_join", "q_s2_sql_within")) {
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name: $plan")
      assert(!plan.contains("CartesianProduct"), s"$name: $plan")
      assert(plan.contains("Generate"), s"$name: $plan") // term explode present
    }
  }

  test("exact dedup groupBy hashes small keys, not text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dedup.exactDuplicates(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // shuffle key is the md5 hash column, 2-phase agg
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
    assert(plan.contains("md5"), plan)
  }

  test("AQE skew-split backstop engages on a hot join key (thresholds scaled down)") {
    // BENCH/BASELINE documents AQE's OptimizeSkewedJoin as the backstop
    // behind our explicit salting; this proves the backstop is real, not
    // assumed. Thresholds are scaled to unit-test data — the same ratios
    // Spark applies at 256 MB partitions on a cluster.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of the left side lands on one key; right side is uniform
      val left = (0 until 60000).map { i =>
        (if (i % 10 == 0) i.toLong % 97 else 7L, s"payload-$i-${"x" * 40}")
      }.toDF("k", "payload")
      val right = (0L until 97L).map(k => (k, s"dim-$k")).toDF("k", "dim")
        .repartition(4) // defeat LocalRelation so the join shuffles both sides
      val joined = left.join(right, "k")
      assert(joined.collect().length == 60000) // executes THIS plan (AQE finalizes)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the hot partition:\n$finalPlan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
