package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._
import scala.jdk.CollectionConverters._

/** Closest-edge queries over polyline/polygon shape sets —
  * S2ClosestEdgeQuery semantics (options max_results / max_distance,
  * results ordered by S1ChordAngle with deterministic ties;
  * /root/reference/src/s2/s2closest_edge_query.h:54-110) re-expressed as a
  * broadcast join: the shape table (a dimension side) broadcasts as vertex
  * chains; each partition computes its local top-k per doc with the exact
  * edge-distance kernel, followed by a window top-k. Polygon interiors
  * report distance 0 (the reference's interior short-circuit). */
object EdgeQueries {

  /** A broadcastable shape: id, vertex chain, closed?, and (for closed
    * chains) a loop for the interior test. */
  final case class Shape(id: Int, vertices: Array[V3], closed: Boolean) {
    @transient lazy val loop: S2Loop = if (closed) S2Loop(vertices) else null
    def distance2(p: V3): Double =
      if (closed && loop.contains(p)) 0.0
      else S2EdgeDistances.distanceToChain2(p, vertices, closed)
  }

  /** For each doc row, the `k` closest shapes: (doc_id, shape_id, dist2,
    * rank); `maxDist2` (squared chord) prunes results. */
  def closestShapesJoin(docs: DataFrame, shapes: Seq[Shape], k: Int,
                        maxDist2: Double = 4.0,
                        idCol: String = "doc_id",
                        latCol: String = "lat", lngCol: String = "lng"): DataFrame = {
    val spark = docs.sparkSession
    val bS = spark.sparkContext.broadcast(shapes.toArray)
    val in = docs.select(col(idCol), col(latCol).cast("double"), col(lngCol).cast("double"))
    val outSchema = StructType(Seq(
      in.schema.fields(0).copy(name = "doc_id"),
      StructField("shape_id", IntegerType, nullable = false),
      StructField("dist2", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val partial = in.mapPartitions { it =>
      val ss = bS.value
      it.flatMap { r =>
        val p = V3.fromLatLngDegrees(r.getDouble(1), r.getDouble(2))
        // small shape sets: exact scan with a bounded insertion list
        val best = new java.util.TreeMap[(Double, Int), Null](
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
        var i = 0
        while (i < ss.length) {
          val d = ss(i).distance2(p)
          if (d <= maxDist2) {
            best.put((d, ss(i).id), null)
            if (best.size > k) best.pollLastEntry()
          }
          i += 1
        }
        val id = r.get(0)
        best.keySet().asScala.iterator
          .map { case (d, sid) => Row(id, sid, d) }
      }
    }(enc)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy(col("dist2"), col("shape_id"))
    partial.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Scalar distance column: squared chord from (lat,lng) to the closest
    * of the given shapes (Double.MaxValue when shapes empty). */
  def distanceToShapes(docs: DataFrame, shapes: Seq[Shape],
                       latCol: String = "lat", lngCol: String = "lng"): DataFrame = {
    val bS = docs.sparkSession.sparkContext.broadcast(shapes.toArray)
    val distUdf = udf { (lat: Double, lng: Double) =>
      val p = V3.fromLatLngDegrees(lat, lng)
      val ss = bS.value
      var best = Double.MaxValue
      var i = 0
      while (i < ss.length) {
        val d = ss(i).distance2(p)
        if (d < best) best = d
        i += 1
      }
      best
    }
    docs.withColumn("shape_dist2", distUdf(col(latCol), col(lngCol)))
  }
}
