package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.{ImageRow, Pt}
import graft.core.PixelCodec

/**
 * polygonize (reference raster.py:1526-1605, gdal.Polygonize): raster ->
 * polygon rows of connected same-value regions.
 *
 * Each image is one input row, so connected-component labeling runs
 * whole-image inside `flatMap` (the reference's own granularity — GDAL
 * labels a full band), with Moore boundary tracing for the exterior
 * ring. 4-connectivity, like GDAL's default. Interior holes of a region
 * become separate regions of their own value (as with GDAL); the emitted
 * ring is the exact pixel-edge boundary.
 *
 * Scale: one image (<=257^2 here, bounded by tiling upstream for bigger
 * rasters) per task; no shuffle at all.
 */
object Polygonize {

  final case class RegionRow(
      image_id: String, band: Int, region_id: Int, value: Float,
      pixel_count: Long, ring: Array[Pt])

  def polygonize(images: Dataset[ImageRow], band: Int = 0, quant: Float = 32f)
                (implicit spark: SparkSession): Dataset[RegionRow] = {
    import spark.implicits._
    images.flatMap { img =>
      val dec = PixelCodec.decode(img.bytes, img.fmt, img.w, img.h)
      val v = dec.bands(band).map(p => (math.floor(p / quant) * quant).toFloat)
      regions(img, band, v)
    }
  }

  private[operators] def regions(img: ImageRow, band: Int, v: Array[Float]): Seq[RegionRow] = {
    val w = img.w; val h = img.h
    val label = new Array[Int](w * h)
    // NaN nodata pixels form NO region (gdal.Polygonize's mask
    // excludes them): unmasked, every NaN pixel would become its own
    // singleton region (NaN == NaN is false, so flood fill never
    // merges them) — a half-nodata image would emit tens of thousands
    // of spurious rows
    var k = 0
    while (k < w * h) { if (v(k).isNaN) label(k) = -1; k += 1 }
    var next = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[RegionRow]
    val stack = new java.util.ArrayDeque[Int]()
    var i = 0
    while (i < w * h) {
      if (label(i) == 0) {
        next += 1
        val value = v(i)
        var cnt = 0L
        var minIdx = i
        stack.push(i)
        label(i) = next
        while (!stack.isEmpty) {
          val cur = stack.pop()
          cnt += 1
          if (cur < minIdx) minIdx = cur
          val cy = cur / w; val cx = cur % w
          def tryVisit(nx: Int, ny: Int): Unit = {
            if (nx >= 0 && nx < w && ny >= 0 && ny < h) {
              val n = ny * w + nx
              if (label(n) == 0 && v(n) == value) { label(n) = next; stack.push(n) }
            }
          }
          tryVisit(cx - 1, cy); tryVisit(cx + 1, cy)
          tryVisit(cx, cy - 1); tryVisit(cx, cy + 1)
        }
        out += RegionRow(img.image_id, band, next, value, cnt,
          traceBoundary(img, label, next, minIdx, w, h))
      }
      i += 1
    }
    out.toSeq
  }

  /** Moore boundary trace of the region's exterior in world coords
    * (pixel-corner polyline, simplified to direction changes). `start`
    * is the top-left-most pixel of the region. */
  private def traceBoundary(img: ImageRow, label: Array[Int], id: Int,
                            start: Int, w: Int, h: Int): Array[Pt] = {
    def in(x: Int, y: Int) = x >= 0 && x < w && y >= 0 && y < h && label(y * w + x) == id
    val sx = start % w; val sy = start / w
    // walk pixel edges: start at top-left corner of start pixel, keep the
    // region on the right; directions 0=E,1=S,2=W,3=N on the corner grid
    var cx = sx; var cy = sy; var dir = 0
    val pts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val startCorner = (sx, sy)
    var first = true
    var guard = 0
    val maxSteps = 4 * (w + 2) * (h + 2)
    while ((first || (cx, cy) != startCorner || dir != 0) && guard < maxSteps) {
      first = false
      if (pts.isEmpty || pts.last != ((cx, cy))) pts += ((cx, cy))
      // at corner (cx, cy) heading dir; pixels: NE=(cx,cy-1), SE=(cx,cy),
      // SW=(cx-1,cy), NW=(cx-1,cy-1) in pixel-index space
      val (rightPixel, leftPixel) = dir match {
        case 0 => ((cx, cy), (cx, cy - 1))       // E: right=SE, left=NE
        case 1 => ((cx - 1, cy), (cx, cy))       // S: right=SW, left=SE
        case 2 => ((cx - 1, cy - 1), (cx - 1, cy)) // W: right=NW, left=SW
        case _ => ((cx, cy - 1), (cx - 1, cy - 1)) // N: right=NE, left=NW
      }
      if (in(leftPixel._1, leftPixel._2)) dir = (dir + 3) % 4       // turn left
      else if (!in(rightPixel._1, rightPixel._2)) dir = (dir + 1) % 4 // turn right
      else dir match {
        case 0 => cx += 1
        case 1 => cy += 1
        case 2 => cx -= 1
        case _ => cy -= 1
      }
      guard += 1
    }
    // the walk re-appends the start corner on closing — drop the
    // duplicate or simplify() would discard both copies as degenerate
    if (pts.length > 1 && pts.last == pts.head) pts.remove(pts.length - 1)
    // corner-grid -> world coords, drop collinear points
    val world = pts.map { case (gx, gy) =>
      Pt(img.x_min + gx * img.px, img.y_max - gy * img.px)
    }
    simplify(world.toArray)
  }

  private def simplify(ring: Array[Pt]): Array[Pt] = {
    if (ring.length < 3) return ring
    val out = scala.collection.mutable.ArrayBuffer.empty[Pt]
    val n = ring.length
    for (i <- 0 until n) {
      val a = ring((i + n - 1) % n); val b = ring(i); val c = ring((i + 1) % n)
      val cross = (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)
      if (math.abs(cross) > 1e-12) out += b
    }
    out.toArray
  }
}
