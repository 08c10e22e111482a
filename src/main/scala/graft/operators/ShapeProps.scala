package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.PolyRow
import graft.core.Geom

/**
 * shape_props (reference shape.py:315-549): per-polygon geometric
 * properties — Area, Perimeter, Centroid, Major/MinorAxisLength via the
 * minimum-area rectangle (rotating calipers, utilities.py:1285-1356),
 * Eccentricity, Solidity (area / convex hull area), Extent (area / bbox
 * area), AverageWidth (area / (perimeter/2) ribbon approximation).
 *
 * Pure per-row scalar geometry — a typed map, no grouping, no shuffle.
 */
object ShapeProps {

  final case class Props(
      poly_id: Long, part: Int, area: Double, perimeter: Double,
      centroid_x: Double, centroid_y: Double,
      major_axis: Double, minor_axis: Double, eccentricity: Double,
      solidity: Double, extent: Double, avg_width: Double)

  def props(polys: Dataset[PolyRow])(implicit spark: SparkSession): Dataset[Props] = {
    import spark.implicits._
    polys.map { p =>
      val rings: Geom.Rings = p.rings.map(_.map(q => (q.x, q.y)))
      val a = Geom.area(rings)
      val per = Geom.perimeter(rings)
      val (cx, cy) = Geom.centroid(rings)
      val allPts = rings(0)
      val (major, minor, _) = Geom.minAreaRect(allPts)
      val ecc =
        if (major <= 0) 0.0
        else math.sqrt(math.max(0.0, 1.0 - (minor * minor) / (major * major)))
      val hull = Geom.convexHull(allPts)
      val hullArea = if (hull.length >= 3) math.abs(Geom.signedArea(hull)) else 0.0
      val bb = Geom.bbox(rings)
      val bbArea = (bb.x1 - bb.x0) * (bb.y1 - bb.y0)
      Props(p.poly_id, p.part, a, per, cx, cy, major, minor, ecc,
        solidity = if (hullArea > 0) a / hullArea else 0.0,
        extent = if (bbArea > 0) a / bbArea else 0.0,
        avg_width = if (per > 0) a / (per / 2.0) else 0.0)
    }
  }
}
