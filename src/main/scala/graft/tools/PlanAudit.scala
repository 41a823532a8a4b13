import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._
import graft.operators._
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = S2Joins.withCellId(
      spark.read.parquet("/tmp/graft_bench_docs_192000000"),
      col("lat"), col("lng"))
    val regions: Seq[(Int, S2Region)] = Seq(
      1 -> S2TextFormat.parsePolygon("0:0, 0:35, 30:35, 30:0"),
      3 -> S2Cap.fromCenterAngle(V3.fromLatLngDegrees(48, 2), 0.08))
    val joined = S2Joins.broadcastContainsJoin(docs, regions)
    val agg = joined.groupBy("qid").count()
    val plan = agg.queryExecution.executedPlan.toString
    println("=== ReadSchema lines ===")
    plan.split("\n").filter(l => l.contains("ReadSchema") || l.contains("WholeStageCodegen") || l.contains("Exchange")).foreach(println)
    spark.stop()
  }
}
