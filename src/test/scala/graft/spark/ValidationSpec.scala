package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators.Validation

class ValidationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("geometry validation flags the right violations and passes valid loops") {
    import spark.implicits._
    val rows = Seq(
      ("ok",        "0:0, 0:10, 10:10, 10:0"),
      ("too_few",   "0:0, 0:10"),
      ("dup_adj",   "0:0, 0:10, 0:10, 10:10"),
      ("self_x",    "0:0, 10:10, 0:10, 10:0"), // bowtie
      ("garbage",   "not a polygon at all"))
    val out = Validation.withValidation(rows.toDF("name", "poly"), "poly")
      .select("name", "geom_error").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out("ok").isEmpty)
    assert(out("too_few").contains("TOO_FEW_VERTICES"))
    assert(out("dup_adj").contains("DUPLICATE_ADJACENT_VERTICES"))
    assert(out("self_x").contains("SELF_INTERSECTION"))
    assert(out("garbage").contains("PARSE_ERROR"))
    assert(Validation.validOnly(rows.toDF("name", "poly"), "poly").count() == 1)
  }

  test("polyline validation flags degenerate chains, passes clean ones") {
    import spark.implicits._
    val df = Seq(
      "0:0, 0:10, 5:15",          // valid
      "0:0",                       // too few
      "0:0, 0:0, 0:10",            // duplicate adjacent
      "not a polyline"             // parse error
    ).toDF("line")
    val got = Validation.withPolylineValidation(df, "line")
      .select("line_error").collect().map(r => Option(r.getString(0)))
    assert(got(0).isEmpty)
    assert(got(1).contains("TOO_FEW_VERTICES"))
    assert(got(2).contains("DUPLICATE_ADJACENT_VERTICES"))
    assert(got(3).contains("PARSE_ERROR"))
    // kernel-level: antipodal adjacent
    assert(Validation.validatePolyline(Array(V3(1, 0, 0), V3(-1, 0, 0)))
      .contains("ANTIPODAL_ADJACENT_VERTICES"))
  }

  test("pruned self-intersection scan = naive scan on random loops") {
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 30) {
      // random star-ish loop, sometimes scrambled to force crossings
      val n = 20 + rnd.nextInt(40)
      val pts = (0 until n).map { i =>
        val ang = 2 * math.Pi * i / n
        val r = 3 + rnd.nextDouble() * 6
        V3.fromLatLngDegrees(10 + r * math.sin(ang), 10 + r * math.cos(ang))
      }.toArray
      val loop = if (trial % 3 == 0) { // swap two vertices -> likely bowtie
        val a = 1 + rnd.nextInt(n - 2); val b = 1 + rnd.nextInt(n - 2)
        val l = pts.clone(); val t = l(a); l(a) = l(b); l(b) = t; l
      } else pts
      val naive = Validation.validateLoop(loop, pruneFrom = Int.MaxValue)
      val pruned = Validation.validateLoop(loop, pruneFrom = 1)
      assert(naive == pruned, s"trial $trial: naive=$naive pruned=$pruned")
    }
  }

  test("10^4-vertex loops validate within a time budget, same verdicts") {
    val n = 10000
    def circle(scramble: Boolean): Array[V3] = {
      val pts = Array.tabulate(n) { i =>
        val ang = 2 * math.Pi * i / n
        V3.fromLatLngDegrees(20 * math.sin(ang), 20 * math.cos(ang))
      }
      if (scramble) { val t = pts(100); pts(100) = pts(5000); pts(5000) = t }
      pts
    }
    val t0 = System.nanoTime()
    assert(Validation.validateLoop(circle(scramble = false)).isEmpty)
    assert(Validation.validateLoop(circle(scramble = true))
      .contains("SELF_INTERSECTION"))
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30, s"pruned validation took $sec s") // naive n^2 is minutes
  }

  test("E6/E7 fixed point round trips on the doc grid") {
    import spark.implicits._
    val df = Seq(48.8566, -33.865, 0.01, -179.99, 85.0).toDF("deg")
      .withColumn("e7", graft.functions.S2.e7($"deg"))
      .withColumn("back", graft.functions.S2.fromE7($"e7"))
      .withColumn("e6", graft.functions.S2.e6($"deg"))
      .withColumn("back6", graft.functions.S2.fromE6($"e6"))
    df.collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("deg") - r.getAs[Double]("back")) < 5e-8)
      assert(math.abs(r.getAs[Double]("deg") - r.getAs[Double]("back6")) < 5e-7)
    }
  }
}
