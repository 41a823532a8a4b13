package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.S2Joins
import graft.sources.DocSource

/** Standalone salted-vs-unsalted term-join A/B on the clustered synthetic
  * table (the continent-polygon skew case).
  * Run: sbt "runMain graft.tools.SkewBench [docs] [threshold] [reps]" */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val threshold = if (args.length > 1) args(1).toLong else 50000L
    val reps = if (args.length > 2) args(2).toInt else 2
    val aqe = sys.env.getOrElse("SKEW_AQE", "true")
    val bcThreshold = sys.env.getOrElse("SKEW_BC", "10485760")
    val parts = sys.env.getOrElse("SKEW_PARTS", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.autoBroadcastJoinThreshold", bcThreshold)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nPolys = if (args.length > 3) args(3).toInt else 20000
    val nClusters = sys.env.getOrElse("SKEW_NCLUSTERS", "20").toInt
    val cFrac = sys.env.getOrElse("SKEW_FRAC", "0.8").toDouble
    val docs = S2Joins.withCellId(
      DocSource.docs(spark, n, nClusters = nClusters, clusterFrac = cFrac)
        .select("doc_id", "lat", "lng"),
      col("lat"), col("lng")).cache()
    docs.count()
    // region side: a geofence-table shape — one continent polygon (coarse
    // covering terms = the hot keys) among many small quads (fine terms),
    // large enough that the candidate join is a SHUFFLE join, not a
    // broadcast (broadcast joins cannot skew — see termPolygonJoin doc)
    val rnd = new scala.util.Random(7)
    val small = (2 to nPolys).map { q =>
      val la = rnd.nextDouble() * 120 - 60
      val ln = rnd.nextDouble() * 340 - 170
      (q, f"$la%.3f:$ln%.3f, $la%.3f:${ln + 0.4}%.3f, " +
        f"${la + 0.4}%.3f:${ln + 0.4}%.3f, ${la + 0.4}%.3f:$ln%.3f")
    }
    val polys = (Seq((1,
      graft.SparkEntry.skewPolyText)) ++
      small).toDF("qid", "poly")
    // per-stage task shuffle-read sizes: the reducer-side data balance is
    // what salting changes — on a large cluster the max/median ratio IS
    // the straggler tail, independent of this box's CPU noise
    val stageReads = new java.util.concurrent.ConcurrentHashMap[Int, java.util.Vector[Long]]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val br = m.shuffleReadMetrics.totalBytesRead
          if (br > 0) stageReads
            .computeIfAbsent(te.stageId, _ => new java.util.Vector[Long]())
            .add(br)
        }
      }
    })
    def skewRatio(): Double = {
      import scala.jdk.CollectionConverters._
      if (sys.env.contains("SKEW_DIAG"))
        stageReads.asScala.toSeq.sortBy(_._1).foreach { case (sid, v) =>
          val xs = v.asScala.map(_.toDouble).toSeq.sorted
          println(f"  stage $sid: tasks=${xs.size} total=${xs.sum / 1e6}%.1fMB " +
            f"max=${xs.last / 1e6}%.1fMB median=${xs(xs.size / 2) / 1e6}%.1fMB")
        }
      // heaviest shuffle-read stage = the candidate join
      val heaviest = stageReads.asScala.values.maxBy(_.asScala.map(_.toDouble).sum)
      val xs = heaviest.asScala.map(_.toDouble).toSeq.sorted
      xs.last / xs(xs.size / 2)
    }
    def run(t: Long): (Long, Double, Double) = {
      stageReads.clear()
      val t0 = System.nanoTime()
      val c = S2Joins.termPolygonJoin(docs, polys,
        saltThreshold = t, saltSampleFraction = 0.01,
        minDetectBytes = 0L).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus before reading per-task tallies
      org.apache.spark.sql.graftbridge.ListenerBridge
        .waitUntilListenersProcessed(spark.sparkContext)
      (c, wall, skewRatio())
    }
    if (sys.env.contains("SKEW_DIAG")) {
      println("top doc terms:")
      S2Joins.docIndexTerms(docs.select("doc_id", "lat", "lng"), new graft.core.S2TermIndexer())
        .groupBy("term").count().orderBy(col("count").desc).limit(10)
        .collect().foreach(r => println(s"  ${r.getString(0)} -> ${r.getLong(1)}"))
    }
    // show which join strategy the candidate join actually gets
    val probe = S2Joins.termPolygonJoin(docs, polys, saltThreshold = 0L)
    probe.count()
    println("JOIN NODES: " + "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(probe.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)).toSeq.groupBy(identity).view
      .mapValues(_.size).toMap)
    (1 to reps).foreach { i =>
      val (c, s, r) = run(0L)
      println(f"unsalted rep $i: matched=$c wall=$s%.2fs maxOverMedianShuffleRead=$r%.2f")
    }
    (1 to reps).foreach { i =>
      val (c, s, r) = run(threshold)
      println(f"salted   rep $i: matched=$c wall=$s%.2fs maxOverMedianShuffleRead=$r%.2f")
    }
  }
}
