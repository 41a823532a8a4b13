package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Bench

/** North-rule scaling evidence: run the flagship covering+PIP+tile job on
  * the same materialized input at N and 4N cores (sandbox stand-in for N
  * vs 4N executors), several reps each, and emit the BENCH/BASELINE.md
  * table. Run: sbt "runMain graft.tools.ScalingBench [docs] [reps]" */
object ScalingBench {
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // NOTE: driver memory cannot be set here — local-mode driver IS this
      // JVM; size it at launch (sbt -J-Xmx / spark-submit --driver-memory)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 192000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val docsPath = s"/tmp/graft_bench_docs_$n"

    var spark = session(32)
    if (!new java.io.File(s"$docsPath/_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      Bench.materializeDocs(spark, n, docsPath)
      println(f"materialized $n docs in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    def measure(cores: Int): (Double, Seq[Double], Long) = {
      val s = session(cores)
      var matched = 0L
      matched = Bench.pipeline(s, docsPath) // warmup
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        matched = Bench.pipeline(s, docsPath)
        (System.nanoTime() - t0) / 1e9
      }
      s.stop()
      (times.min, times, matched)
    }

    spark.stop()

    // concurrent hardware ceiling: this box is cloud vCPUs with visible
    // steal/turbo variance — pure-CPU thread scaling measured adjacent to
    // each pipeline run is the fair denominator for scaling efficiency.
    def cpuRate(threads: Int): Double = {
      val per = 400000000L
      def work(nn: Long): Long = {
        var z = 0x9E3779B97F4A7C15L; var acc = 0L; var i = 0L
        while (i < nn) {
          z += 0x9E3779B97F4A7C15L
          var m = z
          m = (m ^ (m >>> 30)) * 0xBF58476D1CE4E5B9L
          m = (m ^ (m >>> 27)) * 0x94D049BB133111EBL
          acc += m ^ (m >>> 31); i += 1
        }
        acc
      }
      val ts = Array.fill(threads)(new Thread(() => { work(per); () }))
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      threads * per / ((System.nanoTime() - t0) / 1e9)
    }

    val ceil8a = cpuRate(8)
    val (t8, all8, m8) = measure(8)
    val ceil8b = cpuRate(8)
    val ceil32a = cpuRate(32)
    val (t32, all32, m32) = measure(32)
    val ceil32b = cpuRate(32)
    require(m8 == m32, s"result mismatch across parallelism: $m8 vs $m32")

    val ceil8 = (ceil8a + ceil8b) / 2
    val ceil32 = (ceil32a + ceil32b) / 2
    val hwSpeedup = ceil32 / ceil8
    val speedup = t8 / t32
    val eff = speedup / 4.0
    val normEff = speedup / hwSpeedup
    println(f"""
== north-rule scaling (same input, $n docs, matched=$m32) ==
 local[8]  best ${t8}%.2f s  (all: ${all8.map(t => f"$t%.2f").mkString(", ")})  ${n / t8}%.0f docs/sec
 local[32] best ${t32}%.2f s  (all: ${all32.map(t => f"$t%.2f").mkString(", ")})  ${n / t32}%.0f docs/sec
 pipeline speedup 8->32: ${speedup}%.2f x   raw efficiency vs 4x: ${eff}%.3f
 hardware ceiling (pure-CPU threads, same interval): ${hwSpeedup}%.2f x of 4.00x ideal
 normalized efficiency (pipeline / hardware ceiling): ${normEff}%.3f (target >= 0.8)
""")
  }
}
