package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ImageRow
import graft.core.PixelCodec

/**
 * Hough line transform + rectangular segmentation — the reference's
 * `houghseg` chain (/root/reference/geospatial_learn/utilities.py:112-233:
 * edges -> hough_line -> hough_line_peaks -> draw lines -> invert ->
 * remove_small_objects -> polygonize), re-expressed relationally.
 *
 * Spark shape (the part a native engine does per-array, we do as a
 * QUERY):
 *  - the vote accumulator IS a `groupBy(image, theta, rho).count()` —
 *    partial aggregation folds votes map-side, so the shuffle carries
 *    accumulator cells (images x |thetas| x rho-bins at most), never
 *    edge pixels;
 *  - peak non-max suppression is an exploded-offset EQUI join on the
 *    accumulator (no range join, AQE-splittable), cells only;
 *  - only the final burn joins peaks back to image rows (peak rows are
 *    tiny; the join is keyed by image_id and carries each image once).
 * Nothing in the chain ever shuffles pixels, so the plan holds at
 * cluster scale: pixels stay inside per-image kernels, votes and peaks
 * are the only moving data.
 */
object Hough {

  /** Decoded bright pixels of a mask/edge image table:
    * (image_id, w, h, x, y). Pixels never leave the executor unfiltered —
    * the flatMap emits only mask hits. */
  def edgePixels(edges: Dataset[ImageRow], band: Int = 0, thresh: Double = 0.0)
                (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    edges.flatMap { im =>
      val v = PixelCodec.decode(im.bytes, im.fmt, im.w, im.h).bands(band)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int, Int, Int)]
      var p = 0
      while (p < v.length) {
        if (v(p) > thresh) out += ((im.image_id, im.w, im.h, p % im.w, p / im.w))
        p += 1
      }
      out
    }.toDF("image_id", "w", "h", "x", "y")
  }

  /** Vote accumulator over a tested-angle list (radians; the reference
    * probes a narrow angle window around the scene orientation,
    * utilities.py:63-66): rho = x cos(theta) + y sin(theta), binned at
    * `rhoBin` with round-half-up. Output:
    * (image_id, theta_idx, rho_idx, votes). */
  def accumulate(edgePx: DataFrame, thetas: Seq[Double], rhoBin: Double = 1.0): DataFrame = {
    val t = posexplode(lit(thetas.toArray)).as(Seq("theta_idx", "theta"))
    edgePx
      .select(col("image_id"), col("x"), col("y"), t)
      .withColumn("rho", col("x") * cos(col("theta")) + col("y") * sin(col("theta")))
      .withColumn("rho_idx", floor(col("rho") / rhoBin + 0.5).cast("int"))
      .groupBy("image_id", "theta_idx", "rho_idx")
      .agg(count(lit(1)).as("votes"))
  }

  /** hough_line_peaks: keep cells with votes >= minVotes that are >= every
    * neighbor within (theta +- nTheta, rho +- nRho). Plateaus (exact vote
    * ties) survive on BOTH sides — deterministic, spec-pinned. The
    * neighborhood test is an exploded-offset equi join: each cell claims
    * its neighbor coordinates, the claims aggregate to a per-cell max,
    * and one left join compares — no range join, no window over an
    * unbounded frame. */
  def peaks(acc: DataFrame, minVotes: Long, nTheta: Int = 1, nRho: Int = 1): DataFrame = {
    val offsets = for {
      dt <- -nTheta to nTheta
      dr <- -nRho to nRho
      if dt != 0 || dr != 0
    } yield (dt, dr)
    val claims = acc
      .select(col("image_id"), col("theta_idx"), col("rho_idx"), col("votes"),
        explode(lit(offsets.map(o => Array(o._1, o._2)).toArray)).as("off"))
      .select(col("image_id"),
        (col("theta_idx") + col("off").getItem(0)).as("theta_idx"),
        (col("rho_idx") + col("off").getItem(1)).as("rho_idx"),
        col("votes"))
      .groupBy("image_id", "theta_idx", "rho_idx")
      .agg(max(col("votes")).as("nbr_max"))
    acc.join(claims, Seq("image_id", "theta_idx", "rho_idx"), "left")
      .where(col("votes") >= minVotes &&
        col("votes") >= coalesce(col("nbr_max"), lit(0L)))
      .select("image_id", "theta_idx", "rho_idx", "votes")
  }

  // ---- pure kernels (spec-tested; used by the burn/segment tail) ----

  /** Bresenham segment, inclusive endpoints, into `mask`. */
  def drawLine(mask: Array[Boolean], w: Int, h: Int,
               x1: Int, y1: Int, x2: Int, y2: Int): Unit = {
    var x = x1; var y = y1
    val dx = math.abs(x2 - x1); val dy = -math.abs(y2 - y1)
    val sx = if (x1 < x2) 1 else -1
    val sy = if (y1 < y2) 1 else -1
    var err = dx + dy
    var go = true
    while (go) {
      if (x >= 0 && x < w && y >= 0 && y < h) mask(y * w + x) = true
      if (x == x2 && y == y2) go = false
      else {
        val e2 = 2 * err
        if (e2 >= dy) { err += dy; x += sx }
        if (e2 <= dx) { err += dx; y += sy }
      }
    }
  }

  /** Burn one (theta, rho) line into the mask: intersect the infinite
    * line with the image box, round endpoints, clamp, Bresenham — the
    * reference's draw loop (utilities.py:76-108). Near-vertical lines
    * (|sin| ~ 0) burn the column x = round(rho / cos). */
  def burnLine(mask: Array[Boolean], w: Int, h: Int, theta: Double, rho: Double): Unit = {
    val s = math.sin(theta); val c = math.cos(theta)
    if (math.abs(s) < 1e-9) {
      val x = math.floor(rho / c + 0.5).toInt
      if (x >= 0 && x < w) drawLine(mask, w, h, x, 0, x, h - 1)
    } else {
      // y at x = 0 and x = w-1 (the reference uses origins 0 and W)
      val y0 = (rho - 0.0 * c) / s
      val y1 = (rho - (w - 1).toDouble * c) / s
      val cy0 = math.max(0, math.min(h - 1, math.floor(y0 + 0.5).toInt))
      val cy1 = math.max(0, math.min(h - 1, math.floor(y1 + 0.5).toInt))
      drawLine(mask, w, h, 0, cy0, w - 1, cy1)
    }
  }

  final case class Component(area: Long, x0: Int, y0: Int, x1: Int, y1: Int)

  /** 4-connected components of `fg` with at least `minArea` pixels
    * (remove_small_objects + the polygonize core's labeling, fused). */
  def components(fg: Array[Boolean], w: Int, h: Int, minArea: Long): Seq[Component] = {
    val label = new Array[Int](w * h)
    val stack = new java.util.ArrayDeque[Int]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Component]
    var next = 0
    var i = 0
    while (i < w * h) {
      if (fg(i) && label(i) == 0) {
        next += 1
        var area = 0L
        var x0 = w; var y0 = h; var x1 = -1; var y1 = -1
        stack.push(i); label(i) = next
        while (!stack.isEmpty) {
          val cur = stack.pop()
          val cx = cur % w; val cy = cur / w
          area += 1
          if (cx < x0) x0 = cx
          if (cy < y0) y0 = cy
          if (cx > x1) x1 = cx
          if (cy > y1) y1 = cy
          def visit(nx: Int, ny: Int): Unit =
            if (nx >= 0 && nx < w && ny >= 0 && ny < h) {
              val n = ny * w + nx
              if (fg(n) && label(n) == 0) { label(n) = next; stack.push(n) }
            }
          visit(cx - 1, cy); visit(cx + 1, cy); visit(cx, cy - 1); visit(cx, cy + 1)
        }
        if (area >= minArea) out += Component(area, x0, y0, x1, y1)
      }
      i += 1
    }
    out.toSeq
  }

  /** The houghseg tail: peaks -> burn line mask -> INVERT (segments are
    * the regions BETWEEN detected lines) -> 4-connected components ->
    * drop areas < minArea. Output one row per segment:
    * (image_id, area, x0, y0, x1, y1).
    *
    * The join ships each peak row (a dozen bytes) to its image row; at
    * scale the peak side is proportional to detected lines, so this is
    * an ordinary co-partitioned equi join — pixels never shuffle. */
  def segments(images: Dataset[ImageRow], peaksDf: DataFrame,
               thetas: Seq[Double], rhoBin: Double, minArea: Long)
              (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val thetaArr = thetas.toArray
    val grouped = peaksDf
      .groupBy("image_id")
      .agg(collect_list(struct(col("theta_idx"), col("rho_idx"))).as("pk"))
      .as[(String, Seq[(Int, Int)])]
    images.joinWith(grouped, images("image_id") === grouped("image_id"), "inner")
      .flatMap { case (im, (_, pk)) =>
        val mask = new Array[Boolean](im.w * im.h)
        pk.foreach { case (ti, ri) =>
          burnLine(mask, im.w, im.h, thetaArr(ti), ri * rhoBin)
        }
        val fg = Array.tabulate(mask.length)(p => !mask(p))
        components(fg, im.w, im.h, minArea).map(c =>
          (im.image_id, c.area, c.x0, c.y0, c.x1, c.y1))
      }
      .toDF("image_id", "area", "x0", "y0", "x1", "y1")
  }
}
