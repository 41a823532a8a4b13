package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators._
import graft.sources.DocSource

/** Randomized differential property: for many random region sets (fixed
  * seeds), the distributed broadcast join equals the per-row brute-force
  * kernel — the reference's own optimized-vs-brute methodology applied to
  * the distributed operator at property-test scale. */
class RandomizedJoinPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("broadcast join == brute force over 8 random region mixes (seeds 1..8)") {
    val docs = S2Joins.withCellId(DocSource.docs(spark, 1500L),
      col("lat"), col("lng")).cache()
    val all = docs.select("doc_id", "lat", "lng").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      def rlat() = rnd.nextDouble() * 160 - 80
      def rlng() = rnd.nextDouble() * 360 - 180
      val regions: Seq[(Int, S2Region)] = (0 until 6).map { i =>
        val reg: S2Region = rnd.nextInt(3) match {
          case 0 => S2Cap.fromCenterAngle(
            V3.fromLatLngDegrees(rlat(), rlng()), 0.02 + rnd.nextDouble() * 0.3)
          case 1 =>
            val la = rlat(); val ln = rlng()
            S2LatLngRect.fromDegrees(la, ln,
              math.min(89, la + 1 + rnd.nextDouble() * 40),
              ln + 1 + rnd.nextDouble() * 60)
          case _ =>
            val la = math.min(60, rlat()); val ln = math.min(110, rlng())
            S2TextFormat.parsePolygon(
              f"$la%.4f:$ln%.4f, $la%.4f:${ln + 25}%.4f, ${la + 18}%.4f:${ln + 25}%.4f, ${la + 18}%.4f:$ln%.4f")
        }
        i -> reg
      }
      val got = S2Joins.broadcastContainsJoin(docs, regions)
        .select("doc_id", "qid").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
      val want = (for {
        (id, lat, lng) <- all
        (q, reg) <- regions
        if reg.contains(V3.fromLatLngDegrees(lat, lng))
      } yield (id, q)).toSet
      assert(got == want, s"seed $seed mismatch: " +
        s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    }
  }
}
