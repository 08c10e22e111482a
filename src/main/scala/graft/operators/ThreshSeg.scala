package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.{ImageRow, PolyRow}
import graft.core.{Geom, PixelCodec}

/**
 * thresh_seg (/root/reference/geospatial_learn/shape.py:2246-2410):
 * per polygon, clip the raster to the buffered feature bbox, mask to
 * the rasterized feature, Otsu-threshold the masked window, fill small
 * holes (area < holeArea), remove small objects (area < minArea/px^2),
 * and emit the surviving foreground pixels labeled by feature.
 *
 * Spark shape: identical to [[Snakes.msSnake]] — polygons ride a
 * bounded broadcast, each (image x hitting polygon) window is a bounded
 * per-row kernel inside one flatMap, zero shuffle until the final
 * grouped composition. The per-window Otsu uses the engine's EXACT
 * distinct-value argmax (the documented deviation from skimage's
 * 256-bin histogram, same as RasterOps.otsuThreshold) — deterministic
 * and SQL-replayable. Reference overlap semantics are a sequential
 * WriteArray artifact (later features clobber earlier ones including
 * their zero pixels); the engine composes overlaps relationally with
 * max(poly_id) per pixel — deterministic, documented deviation.
 *
 * skimage parity notes: remove_small_holes / remove_small_objects use
 * 4-connected components with strict `< area` removal (skimage
 * connectivity=1 defaults); holes are filled BEFORE objects are
 * removed, exactly the reference call order (shape.py:2381-2388).
 */
object ThreshSeg {

  /** 4-connected component labeling; returns (labels, areas). */
  private[graft] def label4(fg: Array[Boolean], w: Int, h: Int): (Array[Int], Array[Int]) = {
    val lab = Array.fill(fg.length)(-1)
    val areas = scala.collection.mutable.ArrayBuffer.empty[Int]
    val stack = new java.util.ArrayDeque[Int]()
    var p = 0
    while (p < fg.length) {
      if (fg(p) && lab(p) < 0) {
        val id = areas.length
        var area = 0
        stack.push(p)
        lab(p) = id
        while (!stack.isEmpty) {
          val q = stack.pop()
          area += 1
          val x = q % w; val y = q / w
          if (x > 0 && fg(q - 1) && lab(q - 1) < 0) { lab(q - 1) = id; stack.push(q - 1) }
          if (x < w - 1 && fg(q + 1) && lab(q + 1) < 0) { lab(q + 1) = id; stack.push(q + 1) }
          if (y > 0 && fg(q - w) && lab(q - w) < 0) { lab(q - w) = id; stack.push(q - w) }
          if (y < h - 1 && fg(q + w) && lab(q + w) < 0) { lab(q + w) = id; stack.push(q + w) }
        }
        areas += area
      }
      p += 1
    }
    (lab, areas.toArray)
  }

  /** skimage remove_small_holes: fill background components < area. */
  private[graft] def fillSmallHoles(bw: Array[Boolean], w: Int, h: Int,
                                        area: Int): Unit = {
    val bg = bw.map(!_)
    val (lab, areas) = label4(bg, w, h)
    var p = 0
    while (p < bw.length) {
      if (!bw(p) && areas(lab(p)) < area) bw(p) = true
      p += 1
    }
  }

  /** skimage remove_small_objects: drop foreground components < minSize. */
  private[graft] def removeSmallObjects(bw: Array[Boolean], w: Int, h: Int,
                                            minSize: Int): Unit = {
    val (lab, areas) = label4(bw, w, h)
    var p = 0
    while (p < bw.length) {
      if (bw(p) && areas(lab(p)) < minSize) bw(p) = false
      p += 1
    }
  }

  /** Exact distinct-value Otsu over a bounded window (values array):
    * the same between-class-variance argmax as RasterOps.otsuThreshold,
    * executor-local because the window is bounded by construction. */
  private[operators] def otsuLocal(vals: Array[Float]): Double = {
    val hist = new java.util.TreeMap[Double, Long]()
    var i = 0
    while (i < vals.length) {
      val v = vals(i)
      if (!v.isNaN) {
        val d = if (v == 0f) 0.0 else v.toDouble
        hist.merge(d, 1L, (a, b) => a + b)
      }
      i += 1
    }
    import scala.jdk.CollectionConverters._
    // entrySet().asScala is a SET — mapping it would scramble the
    // TreeMap's ascending order; the iterator preserves it
    val h = hist.entrySet().iterator().asScala
      .map(e => (e.getKey, e.getValue.toDouble)).toArray
    RasterOps.otsuArgmax(h)
  }

  /** Segment pixels: (image_id, poly_id, thr, x, y) — one row per
    * surviving foreground pixel; overlaps compose by max(poly_id)
    * downstream (the caller groups). minArea is in map units (the
    * reference divides by px^2, shape.py:2384-2390). */
  def threshSeg(images: Dataset[ImageRow], polys: Dataset[PolyRow],
                band: Int = 0, buf: Double = 0.0, minArea: Double = 4.0,
                holeArea: Int = 4)
               (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val polyList = RasterOps.boundedCollect(polys, "thresh_seg polygon")
      .map { p =>
        val rings: Geom.Rings = p.rings.map(_.map(q => (q.x, q.y)))
        (p.poly_id, rings, Geom.bbox(rings))
      }.sortBy(_._1)
    val polyB = spark.sparkContext.broadcast(polyList)
    images.flatMap { im =>
      val imgBB = Geom.BBox(im.x_min, im.y_max - im.h * im.px,
        im.x_min + im.w * im.px, im.y_max)
      val hits = polyB.value.filter { case (_, _, bb) =>
        Geom.BBox(bb.x0 - buf, bb.y0 - buf, bb.x1 + buf, bb.y1 + buf)
          .intersects(imgBB)
      }
      if (hits.isEmpty) Iterator.empty
      else {
        val pix = PixelCodec.decode(im.bytes, im.fmt, im.w, im.h).bands(band)
        hits.iterator.flatMap { case (polyId, rings, bb) =>
          val cx0 = math.max(0, math.floor((bb.x0 - buf - im.x_min) / im.px).toInt)
          val cx1 = math.min(im.w - 1, math.ceil((bb.x1 + buf - im.x_min) / im.px).toInt - 1)
          val cy0 = math.max(0, math.floor((im.y_max - (bb.y1 + buf)) / im.px).toInt)
          val cy1 = math.min(im.h - 1, math.ceil((im.y_max - (bb.y0 - buf)) / im.px).toInt - 1)
          val ww = cx1 - cx0 + 1; val wh = cy1 - cy0 + 1
          if (ww <= 0 || wh <= 0) Iterator.empty
          else {
            // src * rasterized-mask (reference shape.py:2360-2361)
            val win = new Array[Float](ww * wh)
            var r = 0
            while (r < wh) {
              var c = 0
              while (c < ww) {
                val gx = cx0 + c; val gy = cy0 + r
                val wx = im.x_min + (gx + 0.5) * im.px
                val wy = im.y_max - (gy + 0.5) * im.px
                win(r * ww + c) =
                  if (Geom.pointInPolygon(wx, wy, rings)) pix(gy * im.w + gx)
                  else 0f
                c += 1
              }
              r += 1
            }
            // reference skips max==0; NaN-only windows (a polygon whose
            // window is all nodata) must skip too — otsuLocal drops NaNs
            // and would face an empty histogram
            if (win.forall(v => v == 0f || v.isNaN)) Iterator.empty
            else {
              val thr = otsuLocal(win)
              val bw = win.map(_ > thr)
              fillSmallHoles(bw, ww, wh, holeArea)
              // reference: round(min_area/px^2), fall back to 4 iff <= 0
              val minPx0 = math.round(minArea / (im.px * im.px)).toInt
              removeSmallObjects(bw, ww, wh, if (minPx0 <= 0) 4 else minPx0)
              val out = scala.collection.mutable.ArrayBuffer
                .empty[(String, Long, Double, Int, Int)]
              var p = 0
              while (p < bw.length) {
                if (bw(p))
                  out += ((im.image_id, polyId, thr, cx0 + p % ww, cy0 + p / ww))
                p += 1
              }
              out.iterator
            }
          }
        }
      }
    }.toDF("image_id", "poly_id", "thr", "x", "y")
  }
}
