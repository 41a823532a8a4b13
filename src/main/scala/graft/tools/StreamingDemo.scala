package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.streaming.StreamOps

/** Continuous-ingest demo at realistic shape: a `rate` source streams
  * synthetic docs (same deterministic doc_id→lat/lng formula as the
  * driver tables), the engine tags them with region hits (broadcast
  * interval-index stab — the batch join applied continuously), assigns
  * tiles, and maintains two sinks:
  *
  *   1. complete-mode (qid, tile_id) counts — the streaming flagship;
  *   2. update-mode per-cell running state via mapGroupsWithState
  *      (NoTimeout — ProcessingTimeTimeout needs a continuous trigger and
  *      hangs processAllAvailable in micro-batch).
  *
  * Both sinks are then checked against the BATCH plan over the identical
  * row set — the streaming and batch paths share the cell-id/stab/tile
  * kernels, so counts must match exactly.
  *
  * Usage: runMain graft.tools.StreamingDemo [nRows] [cores]
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val cores = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val regions = graft.Bench.benchRegions
    val tiles = graft.Bench.benchTiles

    def withGeo(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("lat", (col("doc_id") * 7919 % 17000) / 100.0 - 85.0)
      .withColumn("lng", (col("doc_id") * 104729 % 36000) / 100.0 - 180.0)

    // ---- streaming side ----
    val t0 = System.nanoTime()
    val stream = withGeo(spark.readStream.format("rate")
        .option("rowsPerSecond", 200000).load()
        .withColumn("doc_id", col("value")))
      .where(col("doc_id") < n)
    val cells = StreamOps.withCellId(stream, "lat", "lng")
    val tagged = S2Joins.tileAssign(
      StreamOps.streamingContainsTag(cells, regions), tiles)
      .select(explode(col("region_hits")).as("qid"), col("tile_id"))

    val qTiles = tagged.groupBy("qid", "tile_id").count()
      .writeStream.format("memory").queryName("stream_tile_counts")
      .outputMode("complete").start()
    val qTotal = stream.groupBy().count()
      .writeStream.format("memory").queryName("stream_ingest_total")
      .outputMode("complete").start()
    val qState = StreamOps.runningCellCounts(cells, level = 4)
      .writeStream.format("memory").queryName("stream_cell_state")
      .outputMode("update").start()

    // drain until every doc_id < n has arrived (rate keeps emitting; the
    // filter caps what reaches the sinks)
    var arrived = 0L
    while (arrived < n) {
      qTotal.processAllAvailable()
      qTiles.processAllAvailable()
      qState.processAllAvailable()
      val t = spark.table("stream_ingest_total").collect()
      arrived = if (t.isEmpty) 0L else t(0).getLong(0)
    }
    qTiles.processAllAvailable(); qState.processAllAvailable()
    qTiles.stop(); qTotal.stop(); qState.stop()
    val streamSec = (System.nanoTime() - t0) / 1e9

    val streamCounts = spark.table("stream_tile_counts")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    // update-mode emits cumulative counts per micro-batch: final = max
    val streamCells = spark.table("stream_cell_state")
      .groupBy("cell").agg(max("count").as("count"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // ---- batch reference over the identical rows ----
    val batchDocs = S2Joins.withCellId(
      withGeo(spark.range(n).toDF("doc_id")), col("lat"), col("lng"))
    val batchCounts = S2Joins.tileAssign(
        S2Joins.broadcastContainsJoin(batchDocs, regions), tiles)
      .groupBy("qid", "tile_id").count()
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val batchCells = batchDocs
      .groupBy(graft.functions.S2.parent(col("cell_id"), 4).as("cell")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    println(s"== streaming ingest: $n docs, ${regions.size} regions, ${tiles.size} tiles ==")
    println(f"  drained in $streamSec%.1f s (${n / streamSec}%.0f docs/sec end-to-end)")
    println(s"  stream (qid,tile) groups: ${streamCounts.size}  cells tracked: ${streamCells.size}")
    val tileMatch = streamCounts == batchCounts
    val cellMatch = streamCells == batchCells
    println(s"  tile counts == batch: ${if (tileMatch) "OK" else "MISMATCH"}")
    println(s"  per-cell running state == batch: ${if (cellMatch) "OK" else "MISMATCH"}")
    require(tileMatch, "streaming tile counts diverged from batch")
    require(cellMatch, "streaming cell state diverged from batch")
    spark.stop()
  }
}
