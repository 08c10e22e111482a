package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession, Encoders}
import graft.TileRow

/**
 * Bucketed tile table — the co-located-join layout for ALIGNED-RASTER
 * operators (SURVEY §2.3 combine_scene / combine_grid / NDVI band
 * algebra; the "repartition()/bucketing for co-located joins" leg of
 * the scale design).
 *
 * Buckets + in-bucket sort use the FULL scene-merge join key
 * (image_id, tx, ty, band, cell_id) — combine_scene / combine_grid
 * cluster on exactly these, so two tables bucketed alike join with
 * ZERO Exchange under DEFAULT confs (plan-gated in TileTableSpec): at
 * 100 TB the per-pixel payloads never move for a scene merge, only
 * bucket-local sorts run.
 *
 * BAND-CROSSING joins (normalizedDifference joins band A rows to
 * band B rows, so the two sides' bucket keys differ by construction)
 * cannot be served by any band-including bucket key — for those the
 * engine's shuffle-free path is `Tiler.multiTiles` (all bands decoded
 * into ONE row; no join at all), which is the recommended shape.
 * Bucketed tables are catalog-managed (`saveAsTable`), the standard
 * Spark requirement for bucket metadata.
 */
object TileTable {

  def writeBucketed(tiles: Dataset[TileRow], table: String, buckets: Int = 64): Unit =
    tiles.write.mode("overwrite")
      .bucketBy(buckets, "image_id", "tx", "ty", "band", "cell_id")
      .sortBy("image_id", "tx", "ty", "band", "cell_id")
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): Dataset[TileRow] =
    spark.table(table).as[TileRow](Encoders.product[TileRow])
}
