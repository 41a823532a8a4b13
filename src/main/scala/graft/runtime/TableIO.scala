package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.functions.S2
import java.nio.file.{Files, Paths}

/** Iceberg-shaped spatial table layout in a zero-egress sandbox
  * (SURVEY.md §7.4 risk 6): same *shape* as an Iceberg table — immutable
  * snapshot directory of partitioned parquet + a JSON manifest carrying
  * schema, partition spec, row count and per-partition cell ranges — so
  * the engine's partition-pruning logic is real even though the Iceberg
  * runtime jar is absent. With Iceberg on the classpath the same calls
  * map 1:1 onto a partitioned table with a `cell_part` identity partition.
  *
  * Physical design: rows are Hilbert-range sorted and partitioned by the
  * level-`partLevel` ancestor token; parquet min/max stats on `cell_ord`
  * plus manifest cell ranges reproduce S2CellUnion::Contains binary search
  * as file/partition skipping (SURVEY.md §4.2).
  */
object TableIO {

  /** Write `df` (must carry cell_id/cell_ord) as a spatial table. */
  def writeSpatial(df: DataFrame, path: String, partLevel: Int = 4): Unit = {
    val out = df
      .withColumn("cell_part", S2.token(S2.parent(col("cell_id"), partLevel)))
      .repartition(col("cell_part"))
      .sortWithinPartitions("cell_ord")
    out.write.mode("overwrite").partitionBy("cell_part").parquet(path)
    // manifest: per-partition leaf ranges (derivable from the token, but
    // materialized so planners need not parse directory names)
    val parts = df.sparkSession.read.parquet(path)
      .select("cell_part").distinct().collect().map(_.getString(0)).sorted
    val ranges = parts.map { tok =>
      val cell = S2CellId.fromToken(tok)
      (tok, S2CellId.orderKey(S2CellId.rangeMin(cell)),
        S2CellId.orderKey(S2CellId.rangeMax(cell)))
    }
    val rows = df.count()
    val manifest =
      s"""{"format":"graft-spatial-v1","part_level":$partLevel,"rows":$rows,
         |"partitions":[${ranges.map { case (t, lo, hi) =>
        s"""{"token":"$t","ord_lo":$lo,"ord_hi":$hi}""" }.mkString(",")}]}"""
        .stripMargin.replace("\n", "")
    Files.writeString(Paths.get(path, "_graft_manifest.json"), manifest)
  }

  def readSpatial(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Partition tokens whose cell intersects the region's covering —
    * manifest-level pruning, the Iceberg partition-filter analogue. */
  def partitionsForRegion(path: String, region: S2Region,
                          maxCells: Int = 64): Array[String] = {
    val manifest = Files.readString(Paths.get(path, "_graft_manifest.json"))
    val tokRe = """"token":"([^"]+)"""".r
    val toks = tokRe.findAllMatchIn(manifest).map(_.group(1)).toArray
    val covering = new S2RegionCoverer(maxCells).getCovering(region)
    toks.filter { t =>
      S2CellUnion.intersectsCellId(covering, S2CellId.fromToken(t))
    }
  }

  /** Region scan with manifest partition pruning + exact refine: only
    * intersecting partitions are listed/read (partition-column filter →
    * Spark prunes directories before touching files). */
  def scanRegion(spark: SparkSession, path: String, region: S2Region,
                 latCol: String = "lat", lngCol: String = "lng"): DataFrame = {
    val keep = partitionsForRegion(path, region)
    val b = spark.sparkContext.broadcast(region)
    val refine = udf { (lat: Double, lng: Double) =>
      b.value.contains(V3.fromLatLngDegrees(lat, lng)) }
    readSpatial(spark, path)
      .where(col("cell_part").isin(keep.toIndexedSeq: _*))
      .where(refine(col(latCol), col(lngCol)))
  }

  /** Write `df` (must carry cell_id/cell_ord) BUCKETED by the
    * level-`partLevel` ancestor cell token, bucket-sorted by
    * (cell_part, cell_ord). Repeated equi-joins on `cell_part` —
    * co-location joins, incremental batch×batch matching, daily
    * dedup-against-corpus — then read both sides pre-shuffled AND
    * pre-sorted: Spark's bucketed scan aligns buckets one-to-one and
    * plans a SortMergeJoin with ZERO Exchange and no per-run sort. At
    * 100 TB the shuffle this amortizes away IS the dominant job cost;
    * paying it once at write time is the table-design analogue of the
    * reference building its S2PointIndex once and querying it many times
    * (s2point_index.h:30-58). Registers `table` in the session catalog
    * (parquet under spark.sql.warehouse.dir). */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int = 64,
                    partLevel: Int = 4): Unit = {
    df.withColumn("cell_part", S2.token(S2.parent(col("cell_id"), partLevel)))
      .write.mode("overwrite")
      .bucketBy(numBuckets, "cell_part")
      .sortBy("cell_part", "cell_ord")
      .format("parquet")
      .saveAsTable(table)
  }
}
