package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.functions.S2

/** The pure-SQL spatial-join surface: S2SpatialJoinRule must plan
  * `JOIN ... ON s2_contains(...)` / `s2_within_distance(...)` as a term
  * equi-join + exact refine (no BroadcastNestedLoopJoin / cartesian), with
  * results identical — INCLUDING row multiplicity — to the naive plan. */
class SpatialSqlJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    S2.registerAll(s)
    S2.enableSpatialJoins(s)
    s
  }

  private def polys: Seq[(Int, String)] = Seq(
    1 -> "0.005:0.005, 0.005:35.005, 30.005:35.005, 30.005:0.005",
    2 -> "-40.005:-80.005, -40.005:-30.005, -10.005:-30.005, -10.005:-80.005",
    // continent-scale region: coarse covering cells -> coarse ancestor
    // terms, the skew-shaped case
    3 -> "-20.005:-150.005, -20.005:120.005, 60.005:120.005, 60.005:-150.005")

  private def docsDf(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, (i * 7919 % 17000) / 100.0 - 85.0, (i * 104729 % 36000) / 100.0 - 180.0)
    }.toDF("doc_id", "lat", "lng")
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("term scheme invariant: point x region pairs share at most one term") {
    val indexer = new S2TermIndexer()
    val rnd = new scala.util.Random(7)
    val regions = polys.map(p => S2TextFormat.parsePolygon(p._2)) ++ Seq(
      S2TextFormat.parsePolygon("10:10, 10:10.4, 10.4:10.4, 10.4:10"), // small
      S2TextFormat.parsePolygon("-2:-2, -2:2, 2:2, 2:-2"))
    val queryTermSets = regions.map(r => indexer.queryTerms(r).toSet)
    var insideChecked = 0
    for (_ <- 0 until 2000) {
      val lat = rnd.nextDouble() * 170 - 85
      val lng = rnd.nextDouble() * 360 - 180
      val p = V3.fromLatLngDegrees(lat, lng)
      val docTerms = indexer.indexTermsForPoint(p.x, p.y, p.z).toSet
      for ((r, qt) <- regions.zip(queryTermSets)) {
        val shared = docTerms.intersect(qt)
        assert(shared.size <= 1,
          s"($lat,$lng) shares ${shared.size} terms with a region: $shared")
        // containment implies candidacy (recall side of the invariant)
        if (r.contains(p)) { assert(shared.size == 1); insideChecked += 1 }
      }
    }
    assert(insideChecked > 100) // the fixture actually exercised inside points
  }

  test("SQL s2_contains join: no BNLJ, exact rows + multiplicity") {
    import spark.implicits._
    val docs = docsDf(400)
    // triple one row that lands inside poly 1 to pin multiplicity
    val dup = docs.where(col("doc_id") === 7L)
    val all = docs.unionByName(dup).unionByName(dup)
    all.createOrReplaceTempView("sqljoin_docs")
    polys.toDF("qid", "poly").createOrReplaceTempView("sqljoin_regions")

    val joined = spark.sql(
      """SELECT r.qid, d.doc_id FROM sqljoin_docs d JOIN sqljoin_regions r
         ON s2_contains(r.poly, d.lat, d.lng)""")
    val plan = finalPlan(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Generate"), plan) // the term explode is in place

    // expected: brute force in Scala, multiset semantics
    val rows = all.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val parsed = polys.map { case (q, t) => (q, S2TextFormat.parsePolygon(t)) }
    val expected = (for {
      (id, la, ln) <- rows
      (q, poly) <- parsed
      if poly.contains(V3.fromLatLngDegrees(la, ln))
    } yield (q, id)).groupBy(identity).view.mapValues(_.length).toMap
    val got = joined.collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(got == expected)
    assert(expected.valuesIterator.max == 3) // the planted triple survived
    assert(expected.nonEmpty)
  }

  test("SQL s2_within_distance join: no BNLJ, matches chord predicate") {
    import spark.implicits._
    docsDf(400).createOrReplaceTempView("sqljoin_docs2")
    val targets = Seq((1, 33.17, -117.27), (2, -12.05, 44.83), (3, 0.03, 0.07))
    targets.toDF("qid", "t_lat", "t_lng").createOrReplaceTempView("sqljoin_targets")
    val joined = spark.sql(
      """SELECT t.qid, d.doc_id FROM sqljoin_docs2 d JOIN sqljoin_targets t
         ON s2_within_distance(d.lat, d.lng, t.t_lat, t.t_lng, 0.3)""")
    val plan = finalPlan(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)

    val chord2 = S1ChordAngle.fromRadians(0.3)
    val rows = docsDf(400).collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expected = (for {
      (id, la, ln) <- rows
      (q, tla, tln) <- targets
      if (V3.fromLatLngDegrees(la, ln) - V3.fromLatLngDegrees(tla, tln)).norm2 <= chord2
    } yield (q, id)).toSet
    val got = joined.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(expected.nonEmpty)
  }

  test("joins that already have an equi-key are left alone") {
    import spark.implicits._
    val docs = docsDf(100).withColumn("k", col("doc_id") % 3)
    val regs = polys.toDF("qid", "poly").withColumn("k", col("qid") % 3)
    docs.createOrReplaceTempView("sqljoin_docs3")
    regs.createOrReplaceTempView("sqljoin_regions3")
    val joined = spark.sql(
      """SELECT r.qid, d.doc_id FROM sqljoin_docs3 d JOIN sqljoin_regions3 r
         ON d.k = r.k AND s2_contains(r.poly, d.lat, d.lng)""")
    val plan = finalPlan(joined)
    assert(!plan.contains("_s2_term"), plan) // not rewritten
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan) // hash join on k
    // correctness unchanged
    val rows = docsDf(100).collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val parsed = polys.map { case (q, t) => (q, S2TextFormat.parsePolygon(t)) }
    val expected = (for {
      (id, la, ln) <- rows
      (q, poly) <- parsed
      if q % 3 == id % 3 && poly.contains(V3.fromLatLngDegrees(la, ln))
    } yield (q, id)).toSet
    assert(joined.collect().map(r => (r.getInt(0), r.getLong(1))).toSet == expected)
  }

  test("user join hints survive the rewrite (BROADCAST plans a broadcast join)") {
    import spark.implicits._
    // force shuffle defaults so only the hint can produce a broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = docsDf(100)
      docs.createOrReplaceTempView("sqljoin_docs_h")
      polys.toDF("qid", "poly").createOrReplaceTempView("sqljoin_regions_h")
      val hinted = spark.sql(
        """SELECT /*+ BROADCAST(r) */ r.qid, d.doc_id
           FROM sqljoin_docs_h d JOIN sqljoin_regions_h r
           ON s2_contains(r.poly, d.lat, d.lng)""")
      val plan = finalPlan(hinted)
      assert(plan.contains("_s2_term"), plan) // rewrite engaged
      assert(plan.contains("BroadcastHashJoin"), plan) // hint preserved
      val unhinted = spark.sql(
        """SELECT r.qid, d.doc_id FROM sqljoin_docs_h d JOIN sqljoin_regions_h r
           ON s2_contains(r.poly, d.lat, d.lng)""")
      assert(hinted.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ==
        unhinted.collect().map(r => (r.getInt(0), r.getLong(1))).toSet)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("rule also injects via SparkSessionExtensions") {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("spatial-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.S2Extensions())
      .getOrCreate()
    try {
      import s2.implicits._
      (0 until 200).map { i =>
        (i.toLong, (i * 7919 % 17000) / 100.0 - 85.0, (i * 104729 % 36000) / 100.0 - 180.0)
      }.toDF("doc_id", "lat", "lng").createOrReplaceTempView("ext_docs")
      polys.toDF("qid", "poly").createOrReplaceTempView("ext_regions")
      val joined = s2.sql(
        """SELECT r.qid, count(*) AS cnt FROM ext_docs d JOIN ext_regions r
           ON s2_contains(r.poly, d.lat, d.lng) GROUP BY r.qid""")
      val plan = finalPlan(joined)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("Generate"), plan)
      val got = joined.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      val parsed = polys.map { case (q, t) => (q, S2TextFormat.parsePolygon(t)) }
      val expected = (for {
        i <- 0 until 200
        la = (i * 7919 % 17000) / 100.0 - 85.0
        ln = (i * 104729 % 36000) / 100.0 - 180.0
        (q, poly) <- parsed
        if poly.contains(V3.fromLatLngDegrees(la, ln))
      } yield q).groupBy(identity).map { case (q, g) => (q, g.size.toLong) }
      assert(got == expected)
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  test("randomized differential: SQL rewrite == brute force over random region mixes") {
    import spark.implicits._
    val docs = docsDf(800).cache()
    docs.createOrReplaceTempView("sqlfuzz_docs")
    val rows = docs.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed * 31 + 5)
      // quads from tiny (0.5 deg) to continent-scale (75 deg wide), some
      // crossing the antimeridian — diverse covering shapes stress the
      // term scheme (coarse ancestors, multi-face coverings)
      val regTexts = (0 until 5).map { q =>
        val la = rnd.nextDouble() * 120 - 60
        val ln = rnd.nextDouble() * 300 - 150
        val h = 0.5 + rnd.nextDouble() * math.min(25, 84 - la)
        val w = 0.5 + rnd.nextDouble() * 75
        (q, f"$la%.4f:$ln%.4f, $la%.4f:${ln + w}%.4f, ${la + h}%.4f:${ln + w}%.4f, ${la + h}%.4f:$ln%.4f")
      }
      regTexts.toDF("qid", "poly").createOrReplaceTempView("sqlfuzz_regions")
      val joined = spark.sql(
        """SELECT r.qid, d.doc_id FROM sqlfuzz_docs d JOIN sqlfuzz_regions r
           ON s2_contains(r.poly, d.lat, d.lng)""")
      val plan = finalPlan(joined)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"seed $seed: $plan")
      val parsed = regTexts.map { case (q, t) => (q, S2TextFormat.parsePolygon(t)) }
      val expected = (for {
        (id, la, ln) <- rows
        (q, poly) <- parsed
        if poly.contains(V3.fromLatLngDegrees(la, ln))
      } yield (q, id)).toSet
      val got = joined.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(got == expected, s"seed $seed: extra=${(got -- expected).take(3)} " +
        s"missing=${(expected -- got).take(3)}")
      assert(expected.nonEmpty, s"seed $seed produced a trivial fixture")

      // same seed's targets through the within-distance path, random radii
      val targets = (0 until 4).map { q =>
        (q, rnd.nextDouble() * 140 - 70, rnd.nextDouble() * 360 - 180,
          0.02 + rnd.nextDouble() * 0.5)
      }
      targets.toDF("qid", "t_lat", "t_lng", "radius")
        .createOrReplaceTempView("sqlfuzz_targets")
      val wd = spark.sql(
        """SELECT t.qid, d.doc_id FROM sqlfuzz_docs d JOIN sqlfuzz_targets t
           ON s2_within_distance(d.lat, d.lng, t.t_lat, t.t_lng, t.radius)""")
      val wdPlan = finalPlan(wd)
      assert(!wdPlan.contains("BroadcastNestedLoopJoin") &&
        !wdPlan.contains("CartesianProduct"), s"seed $seed: $wdPlan")
      val wdExpected = (for {
        (id, la, ln) <- rows
        (q, tla, tln, rad) <- targets
        if (V3.fromLatLngDegrees(la, ln) - V3.fromLatLngDegrees(tla, tln)).norm2 <=
          S1ChordAngle.fromRadians(rad)
      } yield (q, id)).toSet
      val wdGot = wd.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(wdGot == wdExpected, s"seed $seed within-distance mismatch")
      assert(wdExpected.nonEmpty, s"seed $seed within-distance fixture is trivial")
    }
  }

  test("existsJoin / notExistsJoin: EXISTS semantics, term plan, exact partition of left") {
    import spark.implicits._
    import graft.operators.S2Joins
    val docs = docsDf(600).cache()
    val regions = polys.toDF("qid", "poly")
    val cond = S2.contains(regions("poly"), docs("lat"), docs("lng"))

    val ex = S2Joins.existsJoin(docs, Seq("doc_id"), regions, cond)
    val nx = S2Joins.notExistsJoin(docs, Seq("doc_id"), regions, cond)
    val exPlan = finalPlan(ex)
    val nxPlan = finalPlan(nx)
    for ((p, nm) <- Seq((exPlan, "exists"), (nxPlan, "not_exists"))) {
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$nm: $p")
      assert(!p.contains("CartesianProduct"), s"$nm: $p")
      assert(p.contains("Generate"), s"$nm: term explode missing: $p")
    }

    // brute force: a doc EXISTS-matches iff ANY region contains it
    val rows = docs.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val parsed = polys.map { case (_, t) => S2TextFormat.parsePolygon(t) }
    val expectIn = rows.collect { case (id, la, ln)
      if parsed.exists(_.contains(V3.fromLatLngDegrees(la, ln))) => id }.toSet
    val gotIn = ex.collect().map(_.getLong(0)).toSet
    val gotOut = nx.collect().map(_.getLong(0)).toSet
    assert(gotIn == expectIn)
    assert(expectIn.nonEmpty && gotOut.nonEmpty, "trivial fixture")
    // each helper emits each matching left row EXACTLY once, and together
    // they partition the left side
    assert(ex.count() == gotIn.size.toLong)
    assert((gotIn & gotOut).isEmpty)
    assert(gotIn.size + gotOut.size == rows.length)
    // full left row survives the exists projection (not just the id)
    assert(ex.columns.toSeq == docs.columns.toSeq)
  }
}
