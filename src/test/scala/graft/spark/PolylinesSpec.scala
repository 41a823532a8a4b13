package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators.Polylines

class PolylinesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("chain interpolation: atDistance clamps, reports edges, spans chains") {
    import spark.implicits._
    // single-chain column API: equator 0..30 deg
    val df = Seq((Seq(0.0, 0.0, 0.0, 0.0), Seq(0.0, 10.0, 20.0, 30.0)))
      .toDF("lat", "lng")
    val r = df.select(Polylines.atDistance($"lat", $"lng",
      lit(math.toRadians(15)))).head().getStruct(0)
    assert(math.abs(r.getDouble(1) - 15.0) < 1e-9) // lng 15 at distance 15 deg
    assert(r.getInt(2) == 1)                       // inside edge 1 (10..20)
    assert(math.abs(r.getDouble(3) - math.toRadians(15)) < 1e-12)
    // clamping: negative -> start, beyond-length -> end (reference clamps)
    val lo = df.select(Polylines.atDistance($"lat", $"lng", lit(-1.0))).head().getStruct(0)
    assert(lo.getDouble(1) == 0.0 && lo.getDouble(3) == 0.0)
    val hi = df.select(Polylines.atDistance($"lat", $"lng", lit(10.0))).head().getStruct(0)
    assert(math.abs(hi.getDouble(1) - 30.0) < 1e-9)
    assert(math.abs(hi.getDouble(3) - math.toRadians(30)) < 1e-12)

    // multi-chain core query: two chains concatenate; distance past the
    // first chain's end lands in the second chain's edge range
    val q = new S2ChainInterpolation(Seq(
      Array(V3.fromLatLngDegrees(0, 0), V3.fromLatLngDegrees(0, 10)),
      Array(V3.fromLatLngDegrees(20, 0), V3.fromLatLngDegrees(20, 10),
        V3.fromLatLngDegrees(20, 20))))
    assert(q.chainBounds == Seq((0, 1), (1, 3)))
    val res = q.atDistance(math.toRadians(12)).get
    assert(res.edge == 1) // second chain's first edge
    // on the lat-20 geodesic (which bulges slightly poleward mid-edge)
    assert(V3.latDegrees(res.point) >= 20.0 - 1e-9 &&
      V3.latDegrees(res.point) < 20.1)
    // length = chain1 + chain2; lengthAtEdgeEnd is cumulative
    assert(math.abs(q.length - q.lengthAtEdgeEnd(2)) < 1e-15)
    assert(q.lengthAtEdgeEnd(0) < q.lengthAtEdgeEnd(1))
    // fraction 1 -> last vertex
    val end = q.atFraction(1.0).get
    assert(math.abs(V3.lngDegrees(end.point) - 20.0) < 1e-9)
    // empty shape -> None
    assert(new S2ChainInterpolation(Seq(Array.empty[V3])).atDistance(0.1).isEmpty)
  }

  test("length, interpolation, subsample, dtw over polyline columns") {
    import spark.implicits._
    // equator chain 0..40 deg in 10-deg steps, with a small zigzag vertex
    val lat = Seq(0.0, 0.001, 0.0, 0.0, 0.0)
    val lng = Seq(0.0, 10.0, 20.0, 30.0, 40.0)
    val df = Seq((lat, lng)).toDF("lat", "lng")

    val len = df.select(Polylines.length($"lat", $"lng")).head().getDouble(0)
    assert(math.abs(len - math.toRadians(40)) < 1e-5)

    val mid = df.select(Polylines.atFraction($"lat", $"lng", lit(0.5)))
      .head().getStruct(0)
    assert(math.abs(mid.getDouble(1) - 20.0) < 0.01) // halfway ~ lng 20

    // subsample with generous tolerance drops the zigzag + collinear verts
    val kept = df.select(Polylines.subsampleIndices($"lat", $"lng",
      lit(math.toRadians(0.01)))).head().getSeq[Int](0)
    assert(kept.head == 0 && kept.last == 4)
    assert(kept.length < 5)
    // tight tolerance keeps the zigzag vertex but still drops the exactly
    // collinear vertex 3 (it lies on edge 2->4)
    val keptTight = df.select(Polylines.subsampleIndices($"lat", $"lng",
      lit(1e-9))).head().getSeq[Int](0)
    assert(keptTight == Seq(0, 1, 2, 4))

    // dtw: identical chains align at cost ~= sum of zero distances
    val d0 = df.select(Polylines.dtwCost($"lat", $"lng", $"lat", $"lng"))
      .head().getDouble(0)
    assert(d0 == 0.0)
    // shifting the second chain increases cost monotonically with offset
    val shifted1 = Seq((lat, lng, lat, lng.map(_ + 1.0))).toDF("al", "an", "bl", "bn")
    val shifted5 = Seq((lat, lng, lat, lng.map(_ + 5.0))).toDF("al", "an", "bl", "bn")
    val c1 = shifted1.select(Polylines.dtwCost($"al", $"an", $"bl", $"bn")).head().getDouble(0)
    val c5 = shifted5.select(Polylines.dtwCost($"al", $"an", $"bl", $"bn")).head().getDouble(0)
    assert(c1 > 0 && c5 > c1)
    // dtw vs scala reference on small random chains
    def ref(a: Array[V3], b: Array[V3]): Double = {
      val n = a.length; val m = b.length
      val t = Array.fill(n, m)(0.0)
      for (i <- 0 until n; j <- 0 until m) {
        val d = (a(i) - b(j)).norm
        val pd = if (i > 0 && j > 0) t(i-1)(j-1)
                 else if (i == 0 && j == 0) 0.0 else Double.MaxValue
        val pu = if (i > 0) t(i-1)(j) else Double.MaxValue
        val pl = if (j > 0) t(i)(j-1) else Double.MaxValue
        t(i)(j) = math.min(pd, math.min(pu, pl)) + d
      }
      t(n-1)(m-1)
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 10) {
      val al = Seq.fill(6)(rnd.nextDouble() * 20)
      val an = Seq.fill(6)(rnd.nextDouble() * 20)
      val bl = Seq.fill(9)(rnd.nextDouble() * 20)
      val bn = Seq.fill(9)(rnd.nextDouble() * 20)
      val got = Seq((al, an, bl, bn)).toDF("al", "an", "bl", "bn")
        .select(Polylines.dtwCost($"al", $"an", $"bl", $"bn")).head().getDouble(0)
      val want = ref(
        al.zip(an).map { case (x, y) => V3.fromLatLngDegrees(x, y) }.toArray,
        bl.zip(bn).map { case (x, y) => V3.fromLatLngDegrees(x, y) }.toArray)
      assert(got == want)
    }
  }

  test("consensusByKey: medoid id + consensus trajectory per key") {
    import spark.implicits._
    // key 1: three parallel trajectories shifted in lat; middle id = 11
    // key 2: five, middle id = 22
    def traj(key: Int, id: Long, shift: Double): Seq[(Int, Long, Double, Double)] =
      (0 until 8).map(i => (key, id, shift, 40.0 + i))
    val rows = traj(1, 10, -0.4) ++ traj(1, 11, 0.0) ++ traj(1, 12, 0.4) ++
      traj(2, 20, -0.6) ++ traj(2, 21, -0.3) ++ traj(2, 22, 0.0) ++
      traj(2, 23, 0.3) ++ traj(2, 24, 0.6)
    // one row per (key, trajectory): lat/lng vertex arrays
    val df = rows.toDF("key", "traj", "lat", "lng")
      .groupBy($"key", $"traj")
      .agg(collect_list($"lat").as("lats"), collect_list($"lng").as("lngs"))
    val flat = df.select($"key", $"traj", $"lats", $"lngs")
    val out = Polylines.consensusByKey(
      flat.select($"key", $"traj",
        $"lats".as("lat"), $"lngs".as("lng")), $"key", $"traj", $"lat", $"lng")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getLong(1) == 11L && out(2).getLong(1) == 22L)
    val c1 = out(1).getSeq[org.apache.spark.sql.Row](2)
    assert(c1.length == 8)
    c1.foreach(v => assert(math.abs(v.getDouble(0)) < 0.02)) // lat pulled to 0

    // column UDFs: approx DTW cost of two shifted trajectories matches the
    // exact kernel; medoidUdf picks the middle of the sorted family
    val pair = flat.where($"key" === 1 && $"traj" === 10)
      .crossJoin(flat.where($"key" === 1 && $"traj" === 12)
        .select($"lats".as("bl"), $"lngs".as("bn")))
    val got = pair.select(
      Polylines.approxDtwUdf($"lats", $"lngs", $"bl", $"bn", lit(2)).as("r"))
      .head().getStruct(0)
    val exact = pair.select(Polylines.dtwCost($"lats", $"lngs", $"bl", $"bn"))
      .head().getDouble(0)
    assert(got.getDouble(0) >= exact - 1e-12 && got.getDouble(0) <= exact * 1.5)
    val grouped = flat.where($"key" === 2)
      .agg(collect_list($"lats").as("ls"), collect_list($"lngs").as("ns"),
        collect_list($"traj").as("ids"))
    val mi = grouped.select(Polylines.medoidUdf($"ls", $"ns").as("mi"),
      $"ids").head()
    assert(mi.getSeq[Long](1)(mi.getInt(0)) == 22L)
  }
}
