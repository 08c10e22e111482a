package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gen.GridImages
import graft.operators.{RasterOps, Tiler}
import graft.sources.TileTable

/** Bucketed tile table: aligned-raster joins over two identically
  * bucketed tables must plan WITHOUT any Exchange (the co-located-join
  * layout the 100 TB design names), and produce the same result as the
  * in-memory path. */
class TileTableSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("bucketed aligned join: zero Exchange, result equals in-memory path") {
    val cellRes = Tiler.resForCellSize(64.0)
    val tiles = Tiler.tiles(
      spark.createDataset(GridImages.images(6, bands = 2).toSeq), 64, cellRes)
    val b0 = tiles.filter(_.band == 0)
    val b1 = tiles.filter(_.band == 1).map(t => t.copy(band = 0))
    TileTable.writeBucketed(b0, "tt_b0", buckets = 8)
    TileTable.writeBucketed(b1, "tt_b1", buckets = 8)

    // model the at-scale case: neither side of a 100 TB scene merge is
    // broadcastable, so disable auto-broadcast — the bucketed layout
    // must then carry the join with NO exchange of any kind
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (p, agg) = try {
      val joined = RasterOps.combineGrid(
        TileTable.read(spark, "tt_b0"), TileTable.read(spark, "tt_b1"))
      val agg = joined
        .select(col("image_id"),
          aggregate(col("pixels"), lit(0.0), (a, x) => a + x).as("mass"))
        .groupBy("image_id").agg(round(sum("mass"), 2).as("mass"))
        .as[(String, Double)].collect().toMap
      (joined.queryExecution.executedPlan.toString, agg)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    assert(p.contains("SortMergeJoin"), s"expected the bucketed SMJ path:\n$p")
    assert(!p.contains("Exchange"),
      s"bucketed aligned join must be exchange-free:\n$p")

    // value parity with the direct in-memory path
    val direct = RasterOps.combineGrid(b0, b1)
      .select(col("image_id"),
        aggregate(col("pixels"), lit(0.0), (a, x) => a + x).as("mass"))
      .groupBy("image_id").agg(round(sum("mass"), 2).as("mass"))
      .as[(String, Double)].collect().toMap
    assert(agg == direct && agg.nonEmpty)
  }
}
