package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Bench

/** North-rule scaling evidence: run the flagship covering+PIP+tile job on
  * the same materialized input at N and 4N cores (sandbox stand-in for N
  * vs 4N executors), interleaved lo/hi sessions, median per level.
  * Run: sbt "runMain graft.tools.ScalingBench [docs] [rounds] [repsPerRound]"
  *
  * Protocol (round-2 rework, round-4 roofline): page cache warmed untimed
  * before any timing; rounds alternate session order (lo,hi / hi,lo / …)
  * so vCPU-steal and writeback intervals hit both levels symmetrically;
  * TWO hardware-ceiling probes sampled adjacent to every session — the
  * pure-ALU mix loop AND the parquet scan of the columns the flagship
  * reads (the scan saturates page-cache memory bandwidth well before 32
  * ALU threads saturate cores). The normalizer is the SERIAL-COMPOSITION
  * attainable speedup t_lo / (scan_hi + (t_lo - scan_lo) / alu): the
  * scan part of the job cannot beat the measured scan, the rest cannot
  * beat the ALU ceiling. Medians reported (all reps printed).
  */
object ScalingBench {
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "false") // see Bench.session: AQE replan is pure fixed overhead for this job
      .config("spark.ui.enabled", "false")
      // NOTE: driver memory cannot be set here — local-mode driver IS this
      // JVM; size it at launch (sbt -J-Xmx / spark-submit --driver-memory)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def cpuRate(threads: Int): Double = {
    val per = 200000000L
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

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 192000000L
    val rounds = if (args.length > 1) args(1).toInt else 3
    val reps = if (args.length > 2) args(2).toInt else 2
    val docsPath = Bench.docsPath(n)

    var spark = session(32)
    if (!new java.io.File(s"$docsPath/_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      Bench.materializeDocs(spark, n, docsPath)
      println(f"materialized $n docs in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // untimed cache warm on the pruned columns (also drains writeback)
    spark.read.parquet(docsPath).agg(sum(col("lat") + col("lng"))).head()
    spark.stop()

    var matched = 0L
    var matchedSet = false
    def sessionReps(cores: Int): (Seq[Double], Double, Double) = {
      val s = session(cores)
      val warm = Bench.pipeline(s, docsPath) // warmup
      // cross-parallelism equality gate: lo and hi sessions must agree
      if (!matchedSet) { matched = warm; matchedSet = true }
      else require(warm == matched,
        s"cross-parallelism result drift at $cores cores: $warm vs $matched")
      val ceil = cpuRate(cores)
      def scanOnce(): Double = {
        val t0 = System.nanoTime()
        s.read.parquet(docsPath).agg(sum(col("lat") + col("lng"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      scanOnce() // untimed (agg codegen; decode path already warm)
      val scanSec = math.min(scanOnce(), scanOnce())
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val m = Bench.pipeline(s, docsPath)
        require(m == matched, s"result drift: $m vs $matched")
        (System.nanoTime() - t0) / 1e9
      }
      s.stop()
      (times, ceil, scanSec)
    }

    val repsLo = collection.mutable.ArrayBuffer[Double]()
    val repsHi = collection.mutable.ArrayBuffer[Double]()
    val ceilLo = collection.mutable.ArrayBuffer[Double]()
    val ceilHi = collection.mutable.ArrayBuffer[Double]()
    val scanLo = collection.mutable.ArrayBuffer[Double]()
    val scanHi = collection.mutable.ArrayBuffer[Double]()
    for (r <- 0 until rounds) {
      val order = if (r % 2 == 0) Seq(8, 32) else Seq(32, 8)
      for (cores <- order) {
        val (ts, c, sc) = sessionReps(cores)
        println(f"  round $r local[$cores%2d]: ${ts.map(t => f"$t%.2f").mkString(", ")} s  (cpu ceil ${c / 1e9}%.2f G/s, scan $sc%.2f s)")
        if (cores == 32) { repsHi ++= ts; ceilHi += c; scanHi += sc }
        else { repsLo ++= ts; ceilLo += c; scanLo += sc }
      }
    }

    // reject interval-contaminated reps (identical deterministic work:
    // > 2.5x the level's best is steal/writeback, not workload) — same
    // rule as graft.Bench's artifact of record
    def keep(xs: Seq[Double]): Seq[Double] = xs.filter(_ <= 2.5 * xs.min)
    val t8 = median(keep(repsLo.toSeq)); val t32 = median(keep(repsHi.toSeq))
    val aluSpeedup = median(ceilHi.toSeq) / median(ceilLo.toSeq)
    val scanSecLo = median(scanLo.toSeq); val scanSecHi = median(scanHi.toSeq)
    val scanSpeedup = scanSecLo / scanSecHi
    // attainable speedup (serial roofline): the scan component cannot
    // beat the measured scan, the rest cannot beat the ALU ceiling; the
    // fused pass overlaps the two, so > 1 normalized readings are the
    // bound's conservatism, not a measurement error
    val hwSpeedup = t8 / (scanSecHi + math.max(0.0, t8 - scanSecLo) / aluSpeedup)
    val speedup = t8 / t32
    val eff = speedup / 4.0
    val normEff = speedup / hwSpeedup
    println(f"""
== north-rule scaling (same input, $n docs, matched=$matched, interleaved ${rounds}x$reps median) ==
 local[8]  median ${t8}%.2f s (best ${repsLo.min}%.2f; all: ${repsLo.map(t => f"$t%.2f").mkString(", ")})  ${n / t8}%.0f docs/sec
 local[32] median ${t32}%.2f s (best ${repsHi.min}%.2f; all: ${repsHi.map(t => f"$t%.2f").mkString(", ")})  ${n / t32}%.0f docs/sec
 pipeline speedup 8->32: ${speedup}%.2f x   raw efficiency vs 4x: ${eff}%.3f
 component ceilings (adjacent intervals): ALU ${aluSpeedup}%.2f x, scan ${scanSpeedup}%.2f x (scan ${scanSecLo}%.2f s @8 -> ${scanSecHi}%.2f s @32)
 attainable roofline speedup (scan_hi + compute/ALU): ${hwSpeedup}%.2f x of 4.00x ideal
 normalized efficiency (pipeline / roofline): ${normEff}%.3f (target >= 0.8)
""")
  }
}
