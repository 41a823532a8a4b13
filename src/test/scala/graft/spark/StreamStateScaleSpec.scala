package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps

/** State-store behavior AT VOLUME (not on planted rows): >= 1e6 keyed
  * state entries driven through the stateful streaming operators, with the
  * state-operator metrics (numRowsTotal, memory) read back from the query
  * progress. The claims proven here are the 100 TB-design ones:
  * visit/session state is bounded by OPEN visits (watermark timeout evicts
  * a closed visit exactly once, at any key count), and the near-dup
  * filter's windowed-conjunction state drains with the watermark while its
  * band-bucket admit set grows with exactly the distinct buckets seen —
  * the documented forever-state whose per-key cost is one boolean. */
class StreamStateScaleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (numRowsTotal, memoryUsedBytes) per state operator of the LAST
    * progress that carried state operators. */
  private def stateRows(q: StreamingQuery): Seq[(String, Long, Long)] = {
    val ps = q.recentProgress.filter(p =>
      Option(p.stateOperators).exists(_.nonEmpty))
    assert(ps.nonEmpty, "no state-operator progress recorded")
    ps.last.stateOperators.toSeq.map(so =>
      (so.operatorName, so.numRowsTotal, so.memoryUsedBytes))
  }

  test("visitSessions: 1e6 open visits, state evicted to ~0 after the gap passes") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val nKeys = 1000000L
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double, Double)]
    val visits = StreamOps.visitSessions(
      StreamOps.withCellId(mem.toDF().toDF("entity", "ts", "lat", "lng"),
        "lat", "lng"),
      "entity", "ts", level = 10, lateness = "2 minutes", gapSeconds = 300)
    val q = visits.writeStream.format("memory").queryName("visits_scale")
      .outputMode(OutputMode.Append()).start()
    try {
      // one ping per entity: 1e6 distinct (entity, cell) state keys
      val pings = (0L until nKeys).map { e =>
        (e, t0, (e * 7919 % 17000) / 100.0 - 85.0,
          (e * 104729 % 36000) / 100.0 - 180.0)
      }
      mem.addData(pings)
      q.processAllAvailable()
      val peak = stateRows(q)
      info(s"peak state after 1e6 one-ping visits: $peak")
      assert(peak.map(_._2).sum == nKeys,
        s"expected exactly one state row per (entity, cell): $peak")
      assert(spark.table("visits_scale").count() == 0) // all visits open
      // advance the watermark past every visit's last-ping + gap; the
      // timeout sweep fires in the batch AFTER the watermark moves
      mem.addData(Seq((nKeys + 1, at(60), 0.0, 0.0)))
      q.processAllAvailable()
      mem.addData(Seq((nKeys + 2, at(61), 0.0, 0.0)))
      q.processAllAvailable()
      val closed = spark.table("visits_scale").count()
      assert(closed == nKeys, s"expected all $nKeys visits closed, got $closed")
      val drained = stateRows(q)
      info(s"state after watermark passed all visits: $drained")
      // only the two sentinel visits may remain open
      assert(drained.map(_._2).sum <= 2,
        s"state not evicted at volume: $drained")
    } finally q.stop()
  }

  test("streamingNearDupFilter: 1e6 band buckets; conjunction state drains, admit set == distinct buckets") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val nDocs = 125000L
    val numHashes = 16; val bands = 8 // 8 band keys per doc -> 1e6 probes
    def text(i: Long): String =
      s"alpha w${i} beta x${i * 7 + 1} gamma y${i * 13 + 5} delta z${i * 31 + 3} tail"
    val docs = (0L until nDocs).map(i => (i, java.sql.Timestamp.valueOf(
      "2026-01-01 10:00:00"), text(i)))
    // ground truth: distinct band keys over the same texts via the batch
    // kernel — the band-bucket operator must hold EXACTLY this many rows
    val distinctBuckets = spark.createDataset(docs.map(d => (d._1, d._3)))
      .toDF("doc_id", "text")
      .select(explode(graft.operators.Dedup.bandKeysColumn(
        col("text"), 3, numHashes, bands)).as("k"))
      .agg(countDistinct(col("k"))).head().getLong(0)
    assert(distinctBuckets >= 990000L,
      s"fixture texts collide too much: $distinctBuckets distinct buckets")

    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val admitted = StreamOps.streamingNearDupFilter(
      mem.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text",
      shingleN = 3, numHashes = numHashes, bands = bands,
      tsCol = Some("ts"), lateness = "10 minutes")
    val q = admitted.writeStream.format("memory").queryName("neardup_scale")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(docs)
      q.processAllAvailable()
      val peak = stateRows(q)
      info(s"peak state after 1e6 probes: $peak")
      val bucketPeak = peak.filter(_._1.contains("flatMapGroupsWithState"))
      val aggPeak = peak.filter(_._1.contains("stateStoreSave"))
      assert(bucketPeak.nonEmpty && aggPeak.nonEmpty, s"operators: $peak")
      assert(bucketPeak.map(_._2).sum == distinctBuckets,
        s"band-bucket state ${bucketPeak.map(_._2).sum} != $distinctBuckets")
      // the conjunction aggregation holds one row per (window, doc) until
      // the watermark passes the window
      assert(aggPeak.map(_._2).sum >= nDocs)
      // push the watermark far past every doc's window (+lateness)
      def sentinel(id: Long, min: Int) = (id, java.sql.Timestamp.valueOf(
        f"2026-01-01 11:$min%02d:00"), s"sentinel unique payload $id distinct words")
      mem.addData(Seq(sentinel(nDocs + 1, 30)))
      q.processAllAvailable()
      mem.addData(Seq(sentinel(nDocs + 2, 31)))
      q.processAllAvailable()
      val after = stateRows(q)
      info(s"state after watermark passed all windows: $after")
      val aggAfter = after.filter(_._1.contains("stateStoreSave")).map(_._2).sum
      assert(aggAfter <= 4,
        s"windowed-conjunction state not drained at volume: $after")
      // the admit set is the DESIGNED forever-state: it grew by exactly
      // the sentinels' fresh buckets, nothing else
      val bucketAfter = after.filter(_._1.contains("flatMapGroupsWithState"))
        .map(_._2).sum
      assert(bucketAfter >= distinctBuckets &&
        bucketAfter <= distinctBuckets + 2L * bands,
        s"band-bucket state $bucketAfter vs $distinctBuckets + sentinels")
      // distinct texts => (near-)everything admitted; bucket collisions
      // can only suppress, never duplicate
      val adm = spark.table("neardup_scale").count()
      assert(adm > nDocs * 95 / 100 && adm <= nDocs + 2, s"admitted $adm")
    } finally q.stop()
  }

  test("visitSessions under the RocksDB state store: same semantics, off-heap state, eviction intact") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val nKeys = 200000L
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double, Double)]
    val visits = StreamOps.visitSessions(
      StreamOps.withCellId(mem.toDF().toDF("entity", "ts", "lat", "lng"),
        "lat", "lng"),
      "entity", "ts", level = 10, lateness = "2 minutes", gapSeconds = 300)
    val q = visits.writeStream.format("memory").queryName("visits_rocks")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((0L until nKeys).map { e =>
        (e, t0, (e * 7919 % 17000) / 100.0 - 85.0,
          (e * 104729 % 36000) / 100.0 - 180.0)
      })
      q.processAllAvailable()
      val peak = stateRows(q)
      assert(peak.map(_._2).sum == nKeys, s"rocksdb peak: $peak")
      // the provider actually engaged: RocksDB reports its own custom
      // metrics in the state-operator progress
      val custom = q.recentProgress
        .filter(p => Option(p.stateOperators).exists(_.nonEmpty))
        .last.stateOperators.head.customMetrics
      assert(custom != null && custom.keySet.toArray.exists(
        _.toString.toLowerCase.contains("rocksdb")),
        s"no rocksdb metrics in ${custom.keySet}")
      mem.addData(Seq((nKeys + 1, at(60), 0.0, 0.0)))
      q.processAllAvailable()
      mem.addData(Seq((nKeys + 2, at(61), 0.0, 0.0)))
      q.processAllAvailable()
      assert(spark.table("visits_rocks").count() == nKeys)
      assert(stateRows(q).map(_._2).sum <= 2, "rocksdb state not evicted")
    } finally {
      q.stop()
      saved match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
