package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`): brute-force cosine top-k as the exact baseline, and a
  * sign-random-projection (hyperplane LSH) bucketed variant as the scale
  * path. All arithmetic is double-precision SQL expressions with a fixed
  * left-to-right summation order — deterministic across runs and engines.
  */
object Similarity {

  /** Deterministic fold dot product of two float-array columns (cast to
    * double element-wise, summed in index order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Exact brute-force top-k: for each query (small side, broadcast), the
    * k most-cosine-similar rows. Plan: broadcast nested loop over the big
    * table (narrow), then partial top-k per partition via window. Ties
    * break by id ascending. */
  def bruteForceTopK(data: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = data.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))))
      .withColumn("score", cosine(col("v"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "id", "score", "rank")
  }

  /** Deterministic pseudo-random hyperplane component: plane `p`,
    * dimension `i` → uniform in [-1, 1). Engine-independent (xxhash64). */
  private def planeComponent(p: Int, i: Column): Column =
    (shiftrightunsigned(xxhash64(lit(p), i), 11).cast("double") /
      lit(4503599627370496.0)) - lit(1.0) // 2^52

  /** Sign-random-projection bucket id: `nPlanes` sign bits packed into a
    * long. Rows in the same bucket are likely-similar (cosine LSH). */
  def srpBucket(vec: Column, nPlanes: Int): Column =
    srpBucketSeeded(vec, nPlanes, 0)

  /** ANN top-k via SRP-LSH with multi-probe: queries match data in any of
    * `tables` independent hash tables; candidates then ranked by exact
    * cosine. Recall < 1 by construction (report as approximate): the
    * candidate join is equi on (table, bucket) — shuffle O(n·tables), not
    * O(n·queries). */
  def annTopK(data: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int, nPlanes: Int = 12, tables: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // per-table decorrelation via distinct plane seeds (table*nPlanes + p)
    def withBucketsSeeded(df: DataFrame, vc: String): DataFrame =
      df.withColumn("_tb", explode(array((0 until tables).map { t =>
        struct(lit(t).as("t"), srpBucketSeeded(col(vc), nPlanes, t).as("b"))
      }.toIndexedSeq: _*)))

    val d = withBucketsSeeded(data.select(col(idCol).as("id"), col(vecCol).as("v")), "v")
    val q = withBucketsSeeded(queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv")), "qv")
    val cands = d.join(broadcast(q), "_tb")
      .select("qid", "id", "v", "qv").distinct()
      .withColumn("score", cosine(col("v"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "id", "score", "rank")
  }

  private def srpBucketSeeded(vec: Column, nPlanes: Int, table: Int): Column =
    (0 until nPlanes).map { p =>
      val seed = table * nPlanes + p
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(seed, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine ≥
    * threshold, candidates from SRP buckets (equi-join), exact verify. */
  def cosineNearDupPairs(data: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, nPlanes: Int = 8,
                         tables: Int = 4): DataFrame = {
    val withB = data.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("_tb", explode(array((0 until tables).map { t =>
        struct(lit(t).as("t"), srpBucketSeeded(col("v"), nPlanes, t).as("b"))
      }.toIndexedSeq: _*)))
    val a = withB.select(col("_tb"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withB.select(col("_tb"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, "_tb")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "v_a", "v_b").distinct()
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
