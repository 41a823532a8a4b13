package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic generator of the north-rule input table (BASELINE.json
  * `input_hint`): interleaved text+media documents
  *
  *   docs(doc_id: string,
  *        spans:  array<struct<kind:string, text:string,
  *                             media_ref:string, offset:int>>)
  *
  * plus derived geometry columns (lat/lng degrees, unit vector, leaf S2
  * cell). Everything is pure Column arithmetic over `spark.range` — fully
  * distributed, codegen'd, no data files and no driver-side loops, so the
  * same generator scales from 10^4 test rows to bench SF without skew in
  * generation itself.
  *
  * Spatial distribution mirrors the fixture spec (FIXTURES.md §1):
  * `clusterFrac` of the docs fall in `nClusters` seeded caps (~50 km) —
  * realistic heavy skew for the covering/PIP join — and the rest are
  * area-uniform on the sphere (z uniform in [-1,1], lng uniform; the same
  * scheme as the reference's s2random::SamplePoint,
  * /root/reference/src/s2/s2random.h:67-72).
  *
  * The span-sequence invariant column `spans_fp` is an order-sensitive
  * fingerprint of (kind,text,media_ref,offset) in array order; every
  * multi-stage job asserts it unchanged across joins/repartitions.
  */
object DocSource {
  /** Mix a long column into 64 pseudo-random bits — xxhash64 is native,
    * codegen'd, deterministic, and ANSI-safe (no wrapping arithmetic). */
  private def mix64(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    xxhash64(c)

  /** u in [0,1) from 53 high bits of a mixed long. */
  private def unit(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    shiftrightunsigned(c, 11).cast("double") / lit(9007199254740992.0) // 2^53

  /** The docs table: `n` rows, deterministic in (`n`, `seed`). */
  def docs(spark: SparkSession, n: Long, seed: Long = 42L,
           nClusters: Int = 20, clusterFrac: Double = 0.8,
           parallelism: Int = 64): DataFrame = {
    val base = spark.range(0L, n, 1L, parallelism)
      .withColumn("h", mix64(col("id") + lit(seed * 1000003L)))

    // --- cluster centers: small deterministic arrays, computed inline ---
    // center k: latDeg in [-60,60], lngDeg in [-180,180), from mix64(k).
    val ch  = (0 until nClusters).map(k => splitmix(seed * 7919L + k))
    val cLat = ch.map(h => (unitD(h) * 120.0) - 60.0).toArray
    val cLng = ch.map(h => (unitD(rot(h)) * 360.0) - 180.0).toArray
    val cLatCol = array(cLat.map(lit(_)).toIndexedSeq: _*)
    val cLngCol = array(cLng.map(lit(_)).toIndexedSeq: _*)

    val u1 = unit(mix64(col("h") + 1))            // cluster-or-uniform draw
    val u2 = unit(mix64(col("h") + 2))            // z / radial
    val u3 = unit(mix64(col("h") + 3))            // lng / angular
    val ci = pmod(mix64(col("h") + 4), lit(nClusters.toLong)).cast("int")

    // uniform branch: area-uniform sphere sample
    val zU   = u2 * 2.0 - 1.0
    val latU = degrees(asin(zU))
    val lngU = u3 * 360.0 - 180.0
    // cluster branch: cap of ~50km (0.45 deg) around center, uniform-ish disc
    val r    = sqrt(u2) * lit(0.45)
    val th   = u3 * lit(2.0 * math.Pi)
    val latC = element_at(cLatCol, ci + 1) + r * cos(th)
    val lngC = element_at(cLngCol, ci + 1) + r * sin(th) // fine away from poles

    val lat = when(u1 < clusterFrac, latC).otherwise(latU).as("lat")
    val lng = when(u1 < clusterFrac, lngC).otherwise(lngU).as("lng")

    // --- interleaved spans: 2..8 per doc, alternating kind, offsets strictly
    //     increasing; pure transform(sequence(...)) so it stays in codegen ---
    val nSpans = (pmod(mix64(col("h") + 5), lit(7L)) + 2).cast("int")
    val spans = expr(
      """transform(sequence(0, n_spans - 1), i ->
           named_struct(
             'kind',      CASE WHEN (i + pmod(h, 2)) % 2 = 0 THEN 'text' ELSE 'media' END,
             'text',      CASE WHEN (i + pmod(h, 2)) % 2 = 0
                          THEN concat('tok', conv(substring(hex(xxhash64(id, i)), 1, 8), 16, 10))
                          ELSE CAST(NULL AS STRING) END,
             'media_ref', CASE WHEN (i + pmod(h, 2)) % 2 = 1
                          THEN concat('mr://', lower(substring(hex(xxhash64(id, i, 77L)), 1, 12)))
                          ELSE CAST(NULL AS STRING) END,
             'offset',    CAST(i * 64 + pmod(xxhash64(id, i, 13L), 63) AS INT)))""")

    base
      .withColumn("n_spans", nSpans)
      .select(
        format_string("doc%09d", col("id")).as("doc_id"),
        spans.as("spans"),
        lat, lng)
      .withColumn("spans_fp", spansFingerprint(col("spans")))
  }

  /** Order-sensitive fingerprint of the span sequence — the per-row
    * invariant (kind, text, media_ref, offset order) the north rule
    * requires to survive every join/repartition. */
  def spansFingerprint(spans: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    xxhash64(to_json(spans))

  // driver-side splitmix for the small cluster-center arrays
  private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def rot(x: Long): Long = splitmix(x ^ 0x5851f42d4c957f2dL)
  private def unitD(h: Long): Double = (h >>> 11).toDouble / 9007199254740992.0
}
