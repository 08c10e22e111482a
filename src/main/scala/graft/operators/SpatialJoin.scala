package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.PolyRow
import graft.functions.SpatialFunctions._

/**
 * Point-in-polygon spatial join: broadcast cell-prefilter + exact PIP
 * refine — the north-star join shape (SURVEY §2.3). The big (point) side
 * computes its grid cell with pure column math (codegen'd, no shuffle)
 * and hash-joins against the broadcast exploded polygon-cell relation;
 * the exact ray-cast/winding predicate then filters the survivors.
 *
 * Equi on cell key (hash, broadcast), theta on geometry (post-filter) —
 * the relational re-expression of the reference's per-feature
 * rasterize-and-mask loop (shape.py:932-1078).
 */
object SpatialJoin {

  /** `points` must have double columns `x`, `y`. Result keeps all point
    * columns plus the polygon's poly_id/cls/name/measure. */
  def pointsInPolygons(points: DataFrame, polys: Dataset[PolyRow], res: Int)
                      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pc = ZonalStats.polyCells(polys, res)
      .toDF("pc_cell", "poly_id", "part", "rings")
    val attrs = polys.select(col("poly_id").as("a_poly_id"),
      col("part").as("a_part"), col("cls"), col("name"), col("measure"))
    val withCell = points.withColumn("__cell", gridCellId(col("x"), col("y"), res))
    withCell
      .join(broadcast(pc), col("__cell") === col("pc_cell"))
      .where(pointInPolygon(col("x"), col("y"), col("rings")))
      .join(broadcast(attrs),
        col("poly_id") === col("a_poly_id") && col("part") === col("a_part"))
      .drop("__cell", "pc_cell", "rings", "a_poly_id", "a_part")
  }
}
