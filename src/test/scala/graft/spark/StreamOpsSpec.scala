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

  test("append-mode density finalizes windows at the watermark and drops late rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val counts = StreamOps.streamingCellDensity(
      StreamOps.withCellId(mem.toDF(), "lat", "lng"),
      level = 4, tsCol = "ts", window = "10 minutes", lateness = "5 minutes")
    val q = counts.writeStream.format("memory")
      .queryName("density_append").outputMode(OutputMode.Append()).start()
    try {
      val c1020 = S2CellId.parent(S2CellId.fromLatLngDegrees(10, 20), 4)
      // window [10:00,10:10): two rows
      mem.addData(ev(1, 10, 20), ev(2, 10.1, 20.1))
      q.processAllAvailable()
      // nothing finalized yet — watermark hasn't passed 10:10
      assert(spark.table("density_append").count() == 0)
      // advance event time to 10:16 → watermark 10:11 > 10:10 closes window 1
      mem.addData(ev(16, 10, 20))
      q.processAllAvailable()
      val fin = spark.table("density_append")
        .selectExpr("cell", "weight").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(fin.toSeq == Seq((c1020, 2L))) // finalized exactly once, count 2
      // a LATE row for the closed window (event time 10:03 < watermark) is
      // dropped: re-emit never happens and the count stays 2
      mem.addData(ev(3, 10, 20))
      q.processAllAvailable()
      mem.addData(ev(31, 10, 20)) // push watermark past window 2 as well
      q.processAllAvailable()
      val all = spark.table("density_append")
        .selectExpr("cell", "weight", "window.start").collect()
      // window 1 still exactly one row with weight 2 (late row discarded);
      // window 2 finalized with just the 10:16 ping
      val w1 = all.filter(_.getTimestamp(2) ==
        java.sql.Timestamp.valueOf("2026-01-01 10:00:00"))
      assert(w1.length == 1 && w1.head.getLong(1) == 2)
      val w2 = all.filter(_.getTimestamp(2) ==
        java.sql.Timestamp.valueOf("2026-01-01 10:10:00"))
      assert(w2.length == 1 && w2.head.getLong(1) == 1)
      // the drop is observable in the state-operator metrics
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1)
    } finally q.stop()
  }

  test("bounded-state dedup suppresses dups within the watermark window") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    def t(minute: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")
    val out = StreamOps.streamingDedupBounded(
      mem.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", "5 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_bounded")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, "alpha beta", t(1)), (2L, "ALPHA   beta", t(2)),
        (3L, "gamma", t(1)))
      q.processAllAvailable()
      // duplicate INSIDE the window (watermark 9:57): suppressed
      mem.addData((4L, "alpha beta", t(3)))
      q.processAllAvailable()
      assert(spark.table("dedup_bounded").count() == 2) // alpha-beta, gamma
      // advance the watermark far past the hash's event time → its state
      // is evicted; the same content REAPPEARS (bounded-state contract)
      mem.addData((5L, "filler", t(30)))
      q.processAllAvailable()
      mem.addData((6L, "alpha beta", t(29)))
      q.processAllAvailable()
      val ids = spark.table("dedup_bounded").collect().map(_.getLong(0)).toSet
      assert(ids.contains(1L) && ids.contains(3L) && ids.contains(5L))
      assert(!ids.contains(2L) && !ids.contains(4L))
      assert(ids.contains(6L)) // re-admitted after state eviction
    } finally q.stop()
  }

  test("visitSessions closes a visit after the event-time gap and merges disorder") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    case class Ping(entity: Long, ts: java.sql.Timestamp, lat: Double, lng: Double)
    def p(e: Long, minute: Int, lat: Double, lng: Double) =
      (e, java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00"), lat, lng)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double, Double)]
    val visits = StreamOps.visitSessions(
      StreamOps.withCellId(mem.toDF().toDF("entity", "ts", "lat", "lng"),
        "lat", "lng"),
      "entity", "ts", level = 10, lateness = "2 minutes", gapSeconds = 300)
    val q = visits.writeStream.format("memory").queryName("visits")
      .outputMode(OutputMode.Append()).start()
    try {
      // entity 7 pings the same cell at 10:01, 10:03 (out of order with
      // 10:02 arriving later but inside the 2-minute lateness)
      mem.addData(p(7, 1, 10, 20), p(7, 3, 10, 20))
      q.processAllAvailable()
      mem.addData(p(7, 2, 10, 20)) // late-but-allowed: extends the visit
      q.processAllAvailable()
      assert(spark.table("visits").count() == 0) // still open
      // push the WATERMARK past last-ping + gap (10:03 + 5min = 10:08):
      // watermark needs event time ≥ 10:10; ping far away keeps cell quiet
      mem.addData(p(8, 11, -40, 150))
      q.processAllAvailable()
      mem.addData(p(8, 12, -40, 150)) // second advance so timeout fires
      q.processAllAvailable()
      val vs = spark.table("visits").as[StreamOps.Visit].collect()
      val v7 = vs.filter(_.entity == 7)
      assert(v7.length == 1)
      assert(v7.head.n_pings == 3) // all three pings incl. the late one
      assert(v7.head.enter_ts == java.sql.Timestamp.valueOf("2026-01-01 10:01:00").getTime)
      assert(v7.head.exit_ts == java.sql.Timestamp.valueOf("2026-01-01 10:03:00").getTime)
      assert(v7.head.cell ==
        S2CellId.parent(S2CellId.fromLatLngDegrees(10, 20), 10))
    } finally q.stop()
  }

  test("stream-stream co-location join pairs rows in the same cell within the gap") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def t(minute: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")
    val memA = MemoryStream[(Long, java.sql.Timestamp, Double, Double)]
    val memB = MemoryStream[(Long, java.sql.Timestamp, Double, Double)]
    def cells(m: MemoryStream[(Long, java.sql.Timestamp, Double, Double)]) =
      StreamOps.withCellId(m.toDF().toDF("id", "ts", "lat", "lng"), "lat", "lng")
    val joined = StreamOps.coLocationJoin(cells(memA), cells(memB), level = 10,
      "id", "id", "ts", "ts", lateness = "2 minutes", maxGapSeconds = 120)
    val q = joined.writeStream.format("memory").queryName("coloc")
      .outputMode(OutputMode.Append()).start()
    try {
      // a1 and b1 share a cell 1 minute apart -> pair
      // a2 and b2 share a cell 10 minutes apart -> no pair (outside gap)
      // a3 is alone in its cell -> no pair
      memA.addData((1L, t(1), 10, 20), (2L, t(1), -40, 150), (3L, t(1), 60, -100))
      memB.addData((11L, t(2), 10.0005, 20.0005), (12L, t(11), -40, 150))
      q.processAllAvailable()
      memA.addData((4L, t(30), 0.0, 0.0)) // advance both watermarks
      memB.addData((14L, t(30), 5.0, 5.0))
      q.processAllAvailable()
      val pairs = spark.table("coloc").selectExpr("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 11L)))
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

  test("streaming near-dup filter == sequential bucket-reserving mirror") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val other = "completely different words describing an unrelated subject matter entirely separate corpus"
    val third = "spark streaming stateful operators maintain keyed state across micro batch boundaries cleanly"
    val batch1 = Seq(
      (1L, base),
      (2L, base.replace("today", "tonight")), // near-dup of 1
      (3L, other))
    val batch2 = Seq(
      (4L, base.replace("river", "creek")), // near-dup of 1 (cross-batch)
      (5L, third), // fresh
      (6L, other + " indeed")) // near-dup of 3 (one appended word)
    val mem = MemoryStream[(Long, String)]
    val admitted = StreamOps.streamingNearDupFilter(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = admitted.writeStream.format("memory")
      .queryName("neardup_adm").outputMode(OutputMode.Update()).start()
    val got = try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
      spark.table("neardup_adm").collect().map(_.getLong(0)).toSet
    } finally q.stop()

    // sequential mirror over the SAME kernel band keys (batch DataFrame
    // path), replaying the operator's rule: bucket rep = min doc_id among
    // this batch's first-touchers; admitted = doc owns ALL its buckets
    def keysOf(rows: Seq[(Long, String)]): Map[Long, Seq[Long]] = rows.toDF("doc_id", "text")
      .select(col("doc_id"), graft.operators.Dedup.bandKeysColumn(
        col("text"), 3, 64, 16).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val seen = collection.mutable.Set[Long]()
    val expect = collection.mutable.Set[Long]()
    for (batch <- Seq(batch1, batch2)) {
      val ks = keysOf(batch)
      val rep = batch.flatMap { case (id, _) => ks(id).map(_ -> id) }
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).min }
      for ((id, _) <- batch)
        if (ks(id).nonEmpty && ks(id).forall(k => !seen(k) && rep(k) == id))
          expect += id
      batch.foreach { case (id, _) => seen ++= ks(id) }
    }
    assert(got == expect.toSet, s"got $got expected $expect")
    assert(got == Set(1L, 3L, 5L)) // near-dups 2, 4, 6 suppressed

    // watermarked variant: same admissions, but the per-doc conjunction
    // runs as a windowed aggregation whose state is EVICTED once the
    // watermark passes the doc's window — verified via the state
    // operator's numRowsRemoved after a far-future sentinel batch
    val mem2 = MemoryStream[(Long, java.sql.Timestamp, String)]
    val admitted2 = StreamOps.streamingNearDupFilter(
      mem2.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text",
      tsCol = Some("ts"), lateness = "10 minutes")
    val q2 = admitted2.writeStream.format("memory")
      .queryName("neardup_adm_ts").outputMode(OutputMode.Update()).start()
    val got2 = try {
      def at(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
      mem2.addData(batch1.map { case (id, t) => (id, at(1), t) })
      q2.processAllAvailable()
      mem2.addData(batch2.map { case (id, t) => (id, at(2), t) })
      q2.processAllAvailable()
      mem2.addData(Seq((100L, at(59), "sentinel text far in the future pushing the watermark forward now")))
      q2.processAllAvailable()
      mem2.addData(Seq((101L, at(59), "second sentinel text also far in the future for the final flush")))
      q2.processAllAvailable()
      val evicted = q2.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .exists(_.numRowsRemoved > 0)
      assert(evicted, "windowed conjunction state was never evicted")
      spark.table("neardup_adm_ts").collect().map(_.getLong(0)).toSet
    } finally q2.stop()
    assert(got2 == Set(1L, 3L, 5L, 100L, 101L), s"got2 $got2")
  }
}
