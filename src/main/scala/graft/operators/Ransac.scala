package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ImageRow

/**
 * RANSAC dominant-line detection per raster strip — the reference's
 * `ransac_lines` / `_do_ransac`
 * (/root/reference/geospatial_learn/utilities.py:1504-1640): the image is
 * cut into `binwidth`-wide strips, each strip's edge pixels get a robust
 * 2-point line fit, and the fitted line is burned back at the edge
 * pixels' coordinates.
 *
 * Spark shape: strips are the parallel unit — edge pixels group-shuffle
 * by (image, strip) (sparse mask pixels only, never the raster) and the
 * fit runs as a bounded per-strip kernel (`groupByKey.mapGroups`), the
 * legitimate per-partition-imperative case: consensus scoring is a
 * data-dependent argmax no relational form expresses without an O(n^3)
 * join.
 *
 * Deterministic semantics (spec-pinned; the q_ransac oracle replays the
 * exhaustive path relationally in DuckDB):
 *  - candidate models are pixel pairs in row-major order; pairs that
 *    cannot predict (equal y in col mode / equal x in row mode) are
 *    skipped
 *  - inlier: perpendicular distance to the infinite line <= residual,
 *    tested as cross^2 <= residual^2 * len^2 (integer-exact)
 *  - best = max inlier count, ties broken by first enumeration order
 *  - n <= exhaustiveMax: ALL pairs are tried; larger strips fall back to
 *    `maxTrials` draws from a SplittableRandom seeded by
 *    (seed, image_id, strip) — still deterministic, not SQL-replayed
 *  - burn (the reference's `outArray[x, round(pred)] = 1` loop): for
 *    every edge pixel's driving coordinate, the predicted cross
 *    coordinate rounds half-up via exact integer floorDiv
 */
object Ransac {

  /** One fitted model per (image, strip):
    * (image_id, strip, xa, ya, xb, yb, inliers). */
  def fit(edgePx: DataFrame, binwidth: Int, orient: String = "col",
          residual: Double = 1.0, exhaustiveMax: Int = 64,
          maxTrials: Int = 2500, seed: Long = 42L)
         (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(orient == "col" || orient == "row", s"orient: $orient")
    val colMode = orient == "col"
    val stripCol = if (colMode) col("x") else col("y")
    val r2 = residual * residual
    edgePx
      .withColumn("strip", floor(stripCol / binwidth).cast("int"))
      .select("image_id", "strip", "w", "x", "y")
      .as[(String, Int, Int, Int, Int)]
      .groupByKey(t => (t._1, t._2))
      .mapGroups { (key: (String, Int), it: Iterator[(String, Int, Int, Int, Int)]) =>
        val (id, strip) = key
        val pts = it.toArray.sortBy(t => t._5.toLong * t._3 + t._4) // row-major ord
        val xs = pts.map(_._4); val ys = pts.map(_._5)
        val n = pts.length
        var bestCnt = -1L; var bestA = -1; var bestB = -1
        def score(a: Int, b: Int): Unit = {
          val ok = if (colMode) ys(a) != ys(b) else xs(a) != xs(b)
          if (ok && (a != b)) {
            val dx = xs(b) - xs(a); val dy = ys(b) - ys(a)
            val len2 = dx.toDouble * dx + dy.toDouble * dy
            var cnt = 0L
            var i = 0
            while (i < n) {
              val cross = dx.toDouble * (ys(i) - ys(a)) - dy.toDouble * (xs(i) - xs(a))
              if (cross * cross <= r2 * len2) cnt += 1
              i += 1
            }
            if (cnt > bestCnt) { bestCnt = cnt; bestA = a; bestB = b }
          }
        }
        if (n >= 2) {
          if (n <= exhaustiveMax) {
            var a = 0
            while (a < n - 1) {
              var b = a + 1
              while (b < n) { score(a, b); b += 1 }
              a += 1
            }
          } else {
            val rnd = new java.util.SplittableRandom(
              seed ^ id.hashCode.toLong << 20 ^ strip)
            var t = 0
            while (t < maxTrials) {
              val a = rnd.nextInt(n); val b = rnd.nextInt(n)
              if (a < b) score(a, b) else if (b < a) score(b, a)
              t += 1
            }
          }
        }
        if (bestA < 0) (id, strip, -1, -1, -1, -1, 0L)
        else (id, strip, xs(bestA), ys(bestA), xs(bestB), ys(bestB), bestCnt)
      }
      .toDF("image_id", "strip", "xa", "ya", "xb", "yb", "inliers")
      .where(col("inliers") > 0)
  }

  /** Fit + burn: one output row per burned pixel (image_id, strip, x, y).
    * In col mode each edge pixel's ROW drives a predicted COLUMN
    * (duplicates collapse — raster burn has set semantics). */
  def lines(images: Dataset[ImageRow], binwidth: Int, orient: String = "col",
            residual: Double = 1.0, thresh: Double = 0.0, band: Int = 0,
            exhaustiveMax: Int = 64, maxTrials: Int = 2500, seed: Long = 42L)
           (implicit spark: SparkSession): DataFrame = {
    val colMode = orient == "col"
    val edgePx = Hough.edgePixels(images, band, thresh)
    val models = fit(edgePx, binwidth, orient, residual, exhaustiveMax, maxTrials, seed)
    val stripCol = if (colMode) col("x") else col("y")
    val px = edgePx.withColumn("strip", floor(stripCol / binwidth).cast("int"))
    // round-half-up via exact integer arithmetic: pred = base +
    // floorDiv(2*d_cross*delta + d_drive, 2*d_drive), d_drive > 0 because
    // pairs are row-major ordered (col mode: yb > ya; row mode the model
    // may have xb < xa — normalize to positive denominator first)
    val joined = px.join(models, Seq("image_id", "strip"))
    val (dDrive, dCross, base, refA, drive) =
      if (colMode)
        (col("yb") - col("ya"), col("xb") - col("xa"), col("xa"), col("ya"), col("y"))
      else
        (col("xb") - col("xa"), col("yb") - col("ya"), col("ya"), col("xa"), col("x"))
    val den = abs(dDrive)
    val num = when(dDrive > 0, dCross * (drive - refA))
      .otherwise(-dCross * (drive - refA))
    val pred = (base +
      floor((num * 2 + den).cast("double") / (den * 2)).cast("int"))
    val burnX = if (colMode) pred else col("x")
    val burnY = if (colMode) col("y") else pred
    joined.select(col("image_id"), col("strip"),
        burnX.as("x"), burnY.as("y"))
      .distinct()
  }
}
