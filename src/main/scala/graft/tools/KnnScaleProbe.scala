package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.S2Joins
import graft.sources.DocSource

/** Standalone probe for the knnJoinLarge amortization curve: fixed
  * ~2k-target query over a rising uniform doc count, printing wall and
  * docs/sec per size (the `knn_scale.knn_large` entry in BENCH_r{N}.json)
  * plus whether the per-round rank filter runs as a map-side
  * WindowGroupLimit.
  * Run: sbt "runMain graft.tools.KnnScaleProbe [sizes csv] [k]" */
object KnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("500000,1000000,2000000")
      .split(",").map(_.trim.toLong).toSeq
    val k = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def at(n: Long): Unit = {
      val docs = S2Joins.withCellId(
        DocSource.docs(spark, n, clusterFrac = 0.0)
          .select("doc_id", "lat", "lng"),
        col("lat"), col("lng")).cache()
      docs.count()
      val step = math.max(1L, n / 2000)
      val targets = docs.where(col("doc_id").substr(4, 9).cast("long") % step === 0)
        .select(col("doc_id").substr(4, 9).cast("int").as("qid"),
          (col("lat") * 0.97).as("t_lat"), (col("lng") * 0.97).as("t_lng"))
      val out = S2Joins.knnJoinLarge(docs, targets, k = k, radii = Seq(0.1, 0.4))
      val plan = out.queryExecution.executedPlan.toString
      val wgl = "WindowGroupLimit".r.findAllIn(plan).size
      val t0 = System.nanoTime()
      val c = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // out is pre-materialized inside knnJoinLarge; time the FULL job via
      // a fresh run
      val t1 = System.nanoTime()
      val c2 = S2Joins.knnJoinLarge(docs, targets, k = k, radii = Seq(0.1, 0.4)).count()
      val sec2 = (System.nanoTime() - t1) / 1e9
      println(f"docs=$n%9d rows=$c2 wall=$sec2%.2fs docs/sec=${n / sec2}%.0f " +
        f"(cached-count $sec%.2fs, windowGroupLimit nodes=$wgl, first=$c)")
      docs.unpersist()
    }
    sizes.foreach(at)
  }
}
