package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.S2
import graft.operators.CellIntervalIndex
import graft.core._

/** Structured-Streaming surface of the engine: continuous spatial ingest
  * and maintenance of cell-keyed state. The reference's only
  * streaming-shaped machinery is MutableS2ShapeIndex's buffered
  * Add/Remove + lazy batched rebuild
  * (/root/reference/src/s2/mutable_s2shape_index.cc:501,580-643); its
  * Spark-native analogue is a watermark-bounded windowed aggregation per
  * cell plus mapGroupsWithState for custom per-cell state.
  */
object StreamOps {

  /** Continuous ingest: derive leaf cell + order key on a stream. Narrow,
    * watermark-free — identical expressions to the batch path. */
  def withCellId(stream: DataFrame, latCol: String, lngCol: String): DataFrame =
    stream.withColumn("cell_id", S2.cellId(col(latCol), col(lngCol)))
      .withColumn("cell_ord", S2.orderKey(col("cell_id")))

  /** Streaming density: windowed counts per level-k cell with watermark
    * (late data beyond `lateness` dropped; output = append-able). The
    * streaming analogue of Density.cellDensity. */
  def streamingCellDensity(stream: DataFrame, level: Int,
                           tsCol: String, window: String,
                           lateness: String): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window),
        S2.parent(col("cell_id"), level).as("cell"))
      .agg(count(lit(1)).as("weight"))

  /** Streaming region hit-stream: tag each event with the region labels
    * whose covering contains it (broadcast interval index — same
    * zero-shuffle plan as the batch join, applied continuously). */
  def streamingContainsTag(stream: DataFrame, regions: Seq[(Int, S2Region)],
                           latCol: String = "lat", lngCol: String = "lng"): DataFrame = {
    val index = CellIntervalIndex.fromRegions(regions)
    val b = stream.sparkSession.sparkContext.broadcast(index)
    val bR = stream.sparkSession.sparkContext.broadcast(regions.toMap)
    val tag = udf { (ord: Long, lat: Double, lng: Double) =>
      b.value.candidates(ord).collect {
        case (lab, in) if in ||
          bR.value(lab).contains(V3.fromLatLngDegrees(lat, lng)) => lab
      }
    }
    stream.withColumn("region_hits", tag(col("cell_ord"), col(latCol), col(lngCol)))
  }

  /** Per-cell running state via mapGroupsWithState: maintains (count,
    * last-seen timestamp) per level-k cell with processing-time timeout —
    * the MutableS2ShapeIndex Add/lazy-apply analogue for point streams. */
  case class CellState(count: Long, lastSeenMs: Long)
  case class CellUpdate(cell: Long, count: Long, lastSeenMs: Long)

  /** Streaming exact dedup: emit only the FIRST occurrence of each
    * normalized-text content hash across the whole stream (the
    * training-pipeline dedup applied at ingest time). State per content
    * hash is one boolean — flatMapGroupsWithState keyed by the 64-bit
    * content hash, so state size is O(distinct docs), never text. Output
    * = (doc_id, content_hash) of first-seen rows (join back to payload
    * downstream by id, same discipline as the batch path). */
  case class DedupEmit(doc_id: Long, content_hash: Long)

  def streamingExactDedup(stream: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(idCol).cast("long").as("doc_id"),
        xxhash64(graft.operators.Dedup.normText(col(textCol))).as("content_hash"))
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, DedupEmit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (hash: Long, rows: Iterator[(Long, Long)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // hash already emitted
          else {
            state.update(true)
            // deterministic representative within the micro-batch: min id
            var minId = Long.MaxValue
            rows.foreach { r => if (r._1 < minId) minId = r._1 }
            Iterator.single(DedupEmit(minId, hash))
          }
      }.toDF()
  }

  def runningCellCounts(stream: DataFrame, level: Int,
                        timeout: Option[String] = None): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    // ProcessingTimeTimeout needs a continuous trigger to ever fire; the
    // default (no timeout) suits micro-batch + processAllAvailable flows.
    val mode = if (timeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    stream
      .select(S2.parent(col("cell_id"), level).as("cell"))
      .as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[CellState, CellUpdate](mode) {
        (cell: Long, rows: Iterator[Long], state: GroupState[CellState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            CellUpdate(cell, s.count, s.lastSeenMs)
          } else {
            val prev = state.getOption.getOrElse(CellState(0L, 0L))
            val now = System.currentTimeMillis()
            val next = CellState(prev.count + rows.size, now)
            state.update(next)
            timeout.foreach(state.setTimeoutDuration)
            CellUpdate(cell, next.count, next.lastSeenMs)
          }
      }.toDF()
  }
}
