package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.streaming.StreamOps

class StreamOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  case class Ev(ts: java.sql.Timestamp, lat: Double, lng: Double)
  def ev(minute: Int, lat: Double, lng: Double): Ev =
    Ev(java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00"), lat, lng)

  test("streaming cell density with watermark matches batch density") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val stream = StreamOps.withCellId(mem.toDF(), "lat", "lng")
    val counts = StreamOps.streamingCellDensity(
      stream, level = 4, tsCol = "ts", window = "10 minutes", lateness = "5 minutes")
    val q = counts.writeStream.format("memory")
      .queryName("cell_density").outputMode(OutputMode.Update()).start()
    try {
      mem.addData(ev(1, 10, 20), ev(2, 10.1, 20.1), ev(3, -40, 150), ev(12, 10, 20))
      q.processAllAvailable()
      val rows = spark.sql(
        "select cell, sum(weight) as w from cell_density group by cell").collect()
      val c1020 = S2CellId.parent(S2CellId.fromLatLngDegrees(10, 20), 4)
      val cNeg = S2CellId.parent(S2CellId.fromLatLngDegrees(-40, 150), 4)
      val byCell = rows.map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(byCell(c1020) == 3) // two in window 1, one in window 2
      assert(byCell(cNeg) == 1)
    } finally q.stop()
  }

  test("composed streaming ingest (tag -> tile -> counts) == batch plan") {
    // the StreamingDemo composition, spec'd with a deterministic
    // MemoryStream across multiple micro-batches (NoTimeout stateful ops)
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.operators.S2Joins
    val regions = graft.Bench.benchRegions
    val tiles = graft.Bench.benchTiles
    def geo(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("lat", (col("doc_id") * 7919 % 17000) / 100.0 - 85.0)
      .withColumn("lng", (col("doc_id") * 104729 % 36000) / 100.0 - 180.0)
    val mem = MemoryStream[Long]
    val cells = StreamOps.withCellId(geo(mem.toDF().toDF("doc_id")), "lat", "lng")
    val tagged = S2Joins.tileAssign(
      graft.streaming.StreamOps.streamingContainsTag(cells, regions), tiles)
      .select(explode(col("region_hits")).as("qid"), col("tile_id"))
    val q = tagged.groupBy("qid", "tile_id").count()
      .writeStream.format("memory").queryName("spec_tile_counts")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(0L until 4000L: _*)
      q.processAllAvailable()
      mem.addData(4000L until 12000L: _*) // second micro-batch
      q.processAllAvailable()
      val got = spark.table("spec_tile_counts").collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
      val batch = S2Joins.tileAssign(
          S2Joins.broadcastContainsJoin(
            S2Joins.withCellId(geo(spark.range(12000L).toDF("doc_id")),
              col("lat"), col("lng")), regions), tiles)
        .groupBy("qid", "tile_id").count()
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming region tagging matches batch broadcast join semantics") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val regions: Seq[(Int, S2Region)] = Seq(
      1 -> S2LatLngRect.fromDegrees(0, 0, 30, 35),
      2 -> S2Cap.fromCenterAngle(V3.fromLatLngDegrees(-40, 150), 0.1))
    val mem = MemoryStream[Ev]
    val tagged = StreamOps.streamingContainsTag(
      StreamOps.withCellId(mem.toDF(), "lat", "lng"), regions)
    val q = tagged.writeStream.format("memory")
      .queryName("tagged").outputMode(OutputMode.Append()).start()
    try {
      mem.addData(ev(1, 10, 20), ev(2, -40, 150), ev(3, 60, -100))
      q.processAllAvailable()
      val rows = spark.sql("select lat, region_hits from tagged").collect()
        .map(r => (r.getDouble(0), r.getSeq[Int](1).toSet)).toMap
      assert(rows(10.0) == Set(1))
      assert(rows(-40.0) == Set(2))
      assert(rows(60.0) == Set.empty)
    } finally q.stop()
  }

  test("streaming exact dedup emits each content hash once across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamOps.streamingExactDedup(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, "alpha beta"), (2L, "ALPHA   beta"), (3L, "gamma"))
      q.processAllAvailable()
      // batch 2: duplicate of batch 1 (cross-batch state) + a new doc
      mem.addData((4L, "alpha beta"), (5L, "delta"))
      q.processAllAvailable()
      val rows = spark.table("stream_dedup").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // normalization folds (1,2) into one hash; 4 is a cross-batch dup
      assert(rows.length == 3)
      val ids = rows.map(_._1).toSet
      assert(ids.contains(1L) && ids.contains(3L) && ids.contains(5L))
      assert(!ids.contains(2L) && !ids.contains(4L))
      // matches the batch dedup representative set on the same data
      val batch = Seq((1L, "alpha beta"), (2L, "ALPHA   beta"), (3L, "gamma"),
        (4L, "alpha beta"), (5L, "delta")).toDF("doc_id", "text")
      val batchKeep = graft.operators.Dedup
        .exactDuplicates(batch, "doc_id", "text")
        .collect().map(_.getLong(1)).toSet // keep_id
      assert(ids == batchKeep)
    } finally q.stop()
  }

  test("runningCellCounts keeps per-cell state across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val counts = StreamOps.runningCellCounts(
      StreamOps.withCellId(mem.toDF(), "lat", "lng"), level = 4)
    val q = counts.writeStream.format("memory")
      .queryName("running").outputMode(OutputMode.Update()).start()
    try {
      mem.addData(ev(1, 10, 20), ev(2, 10.05, 20.05))
      q.processAllAvailable()
      mem.addData(ev(3, 10.01, 20.02))
      q.processAllAvailable()
      val cell = S2CellId.parent(S2CellId.fromLatLngDegrees(10, 20), 4)
      val latest = spark.sql(
        s"select max(count) from running where cell = $cell").head().getLong(0)
      assert(latest == 3) // state accumulated across the two batches
    } finally q.stop()
  }
}
