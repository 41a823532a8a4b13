package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines, at 100 TB shapes:
  * exact (hash groupBy), MinHash+LSH banding, SimHash, and exact n-gram
  * Jaccard verification. Everything except the SimHash kernel is native
  * Spark SQL expressions (codegen'd, map-side combined); candidate
  * generation is always an equi-join on a band/bucket key — never a cross
  * join — so the shuffle volume is O(docs × bands), not O(docs²).
  */
object Dedup {

  /** Canonical text for dedup comparisons: lowercase, collapse whitespace. */
  def normText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  // =======================================================================
  // exact dedup
  // =======================================================================

  /** One row per distinct normalized text: representative = min(idCol),
    * plus duplicate count. Single shuffle on the 128-bit content hash
    * (never on the text itself — keys stay small at scale). */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(normText(col(textCol))).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Filter to one representative row per content hash. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactDuplicates(df, idCol, textCol)
      .select(col("keep_id").as(idCol))
    df.join(keep, idCol) // keep_id is unique → inner join keeps one row each
  }

  // =======================================================================
  // shingling + MinHash + LSH
  // =======================================================================

  /** Word n-gram shingles of normalized text (distinct). */
  def shingles(text: Column, n: Int): Column = {
    val words = split(normText(text), " ")
    array_distinct(filter(
      transform(words, (_, i) =>
        when(i + n <= size(words),
          array_join(slice(words, i + 1, lit(n)), " "))),
      x => x.isNotNull))
  }

  /** MinHash signature: `numHashes` independent min-hashes of the shingle
    * set, hash_i(s) = xxhash64(s, seed=i). Pure SQL expressions. */
  def minHashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleCol, s => xxhash64(s, lit(i))))
    }.toIndexedSeq: _*)

  /** LSH band keys: signature split into `bands` bands of `rows` hashes;
    * band key = (band index, xxhash of the band slice). Two docs share a
    * band key iff their band slices are identical. */
  def bandKeys(sigCol: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(array_join(slice(sigCol, b * rows + 1, rows), ",")).as("sig"))
    }.toIndexedSeq: _*)

  /** Candidate near-duplicate pairs via MinHash LSH: docs sharing ≥1 band.
    * Returns (id_a, id_b) with id_a < id_b, distinct. The join is an
    * equi-join on (band, sig) — broadcast/SMJ/AQE-skew all apply. */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 64,
                        bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    val sig = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("id"), bandKeys(minHashSignature(col("sh"), numHashes), bands, rows).as("bk"))
      .select(col("id"), explode(col("bk")).as("bk"))
    val a = sig.select(col("bk"), col("id").as("id_a"))
    val b = sig.select(col("bk"), col("id").as("id_b"))
    a.join(b, "bk")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram Jaccard similarity of two text columns (expression). */
  def jaccard(textA: Column, textB: Column, n: Int): Column = {
    val sa = shingles(textA, n); val sb = shingles(textB, n)
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(array_union(sa, sb)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Full near-dup pipeline: LSH candidates verified with exact Jaccard ≥
    * threshold. `df` is joined back twice to fetch texts (by id — keeps
    * the candidate shuffle narrow). */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double, shingleN: Int = 3,
                     numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val cands = minHashCandidates(df, idCol, textCol, shingleN, numHashes, bands)
    val txt = df.select(col(idCol), col(textCol))
    cands
      .join(txt.withColumnsRenamed(Map(idCol -> "id_a", textCol -> "text_a")), "id_a")
      .join(txt.withColumnsRenamed(Map(idCol -> "id_b", textCol -> "text_b")), "id_b")
      .withColumn("jaccard", jaccard(col("text_a"), col("text_b"), shingleN))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // =======================================================================
  // SimHash
  // =======================================================================

  /** 64-bit SimHash over word tokens (deterministic kernel; one UDF call
    * per row — the per-token loop has no SQL-expression equivalent that
    * stays O(tokens)). */
  private val simHashUdf = udf { (tokens: Seq[String]) =>
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      // xxhash-free deterministic 64-bit string hash (FNV-1a 64)
      var h = -3750763034362895579L
      var i = 0
      while (i < t.length) { h ^= t.charAt(i).toLong; h *= 1099511628211L; i += 1 }
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simHash(text: Column): Column = simHashUdf(split(normText(text), " "))

  /** SimHash near-dup candidates: docs whose 64-bit signatures agree on at
    * least one of four 16-bit chunks (guarantees recall for Hamming
    * distance ≤ 3), verified by exact Hamming ≤ `maxHamming`. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
    val chunks = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL)).as("val"))
      }.toIndexedSeq: _*)).as("ck"))
    val a = chunks.select(col("ck"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = chunks.select(col("ck"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, "ck")
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
