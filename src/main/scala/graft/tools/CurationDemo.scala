package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** End-to-end drive of the training-data curation operators over the real
  * documents/embeddings test tables.
  * Run: sbt "runMain graft.tools.CurationDemo [sfDir]" */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sf/documents.parquet").cache()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
    println(s"== curation over $sf: ${docs.count()} docs, ${emb.count()} embeddings ==")

    val exact = Dedup.exactDuplicates(docs, "doc_id", "text")
      .where(col("dup_count") > 1).count()
    println(s"  exact dup groups: $exact")

    val near = Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.3)
    println(s"  minhash near-dup pairs (j>=0.3): ${near.count()}")

    val sim = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 10)
    println(s"  simhash pairs (hamming<=10): ${sim.count()}")

    val enriched = TextAnalysis.enrich(docs, "text")
    enriched.groupBy("lang_pred").agg(count(lit(1)).as("n"),
      avg("quality").as("avg_q"), avg("ws_tokens").as("avg_tok"))
      .orderBy(desc("n")).collect()
      .foreach(r => println(f"  lang=${r.getString(0)}%-4s n=${r.getLong(1)}%4d " +
        f"avg_quality=${r.getDouble(2)}%.3f avg_tokens=${r.getDouble(3)}%.1f"))

    val queries = emb.limit(3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val topk = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", k = 3)
    topk.collect().foreach(r =>
      println(f"  ann qid=${r.getLong(0)} rank${r.getInt(3)}: vec ${r.getLong(1)} score=${r.getDouble(2)}%.4f"))

    val cosPairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.9, nPlanes = 6, tables = 4).count()
    println(s"  embedding near-dup pairs (cos>=0.9): $cosPairs")
    spark.stop()
  }
}
