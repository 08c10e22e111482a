package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ImageRow
import graft.core.PixelCodec

/**
 * ragmerge (/root/reference/geospatial_learn/utilities.py:842-887):
 * region-adjacency-graph merging of a segmentation against an
 * underlying raster — skimage `rag_boundary` + `merge_hierarchical`
 * with the reference's `_weight_boundary` callback (count-weighted mean
 * of boundary-edge strengths, utilities.py:795-832).
 *
 * Spark shape: the RAG is BUILT distributed — per-image boundary
 * partials (lo, hi, sum, count) fold map-side and the shuffle carries
 * region-pair rows, never pixels; the hierarchical merge runs
 * driver-side on the collected per-image graph (regions are bounded by
 * contract — the merge is inherently sequential: each step's weights
 * depend on the previous merge); the relabeling broadcasts the
 * old->new map back over the pixels (zero further shuffle).
 *
 * Engine conventions (documented):
 *  - edge map = unnormalized 3x3 Sobel magnitude (Edge's kernel,
 *    replicate-padded) of the chosen band — skimage's sobel differs by
 *    a constant factor, which rescales `thresh` but not the structure;
 *  - boundary accumulation: every 4-adjacent cross-region pixel pair
 *    contributes BOTH endpoint edge values (count 2) to its (lo, hi)
 *    region edge;
 *  - merged regions take the MINIMUM original label (deterministic;
 *    the reference's labels are accidental and discarded at polygonize).
 */
object Rag {

  private def sobelMag(b: Array[Float], w: Int, h: Int): Array[Double] = {
    val mag = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        def at(xx: Int, yy: Int): Double =
          b(math.min(h - 1, math.max(0, yy)) * w +
            math.min(w - 1, math.max(0, xx))).toDouble
        val gx = (at(x + 1, y - 1) + 2 * at(x + 1, y) + at(x + 1, y + 1)) -
          (at(x - 1, y - 1) + 2 * at(x - 1, y) + at(x - 1, y + 1))
        val gy = (at(x - 1, y + 1) + 2 * at(x, y + 1) + at(x + 1, y + 1)) -
          (at(x - 1, y - 1) + 2 * at(x, y - 1) + at(x + 1, y - 1))
        mag(y * w + x) = math.sqrt(gx * gx + gy * gy)
        x += 1
      }
      y += 1
    }
    mag
  }

  /** Distributed RAG rows: (image_id, lo, hi, s, c) aggregated. */
  def buildBoundary(segs: Dataset[ImageRow], images: Dataset[ImageRow],
                    band: Int = 0)
                   (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    segs.joinWith(images, segs("image_id") === images("image_id"))
      .flatMap { case (sg, im) =>
        require(sg.w == im.w && sg.h == im.h, s"seg/raster shape mismatch ${sg.image_id}")
        val lab = PixelCodec.decode(sg.bytes, sg.fmt, sg.w, sg.h).bands(0)
        val pix = PixelCodec.decode(im.bytes, im.fmt, im.w, im.h).bands(band)
        val edge = sobelMag(pix, im.w, im.h)
        val acc = scala.collection.mutable.HashMap.empty[(Long, Long), (Double, Long)]
        def add(p: Int, q: Int): Unit = {
          val a = lab(p).toLong; val b = lab(q).toLong
          if (a != b) {
            val k = (math.min(a, b), math.max(a, b))
            val (s0, c0) = acc.getOrElse(k, (0.0, 0L))
            acc(k) = (s0 + edge(p) + edge(q), c0 + 2)
          }
        }
        var y = 0
        while (y < sg.h) {
          var x = 0
          while (x < sg.w) {
            val p = y * sg.w + x
            if (x + 1 < sg.w) add(p, p + 1)
            if (y + 1 < sg.h) add(p, p + sg.w)
            x += 1
          }
          y += 1
        }
        acc.iterator.map { case ((a, b), (s, c)) => (sg.image_id, a, b, s, c) }
      }.toDF("image_id", "lo", "hi", "s", "c")
      .groupBy("image_id", "lo", "hi")
      .agg(sum("s").as("s"), sum("c").as("c"))
  }

  /** skimage merge_hierarchical with _weight_boundary, exact: repeatedly
    * merge the globally minimum-weight edge while its weight < thresh;
    * a merged node's edge to a common neighbor combines by
    * count-weighted mean. Returns old label -> canonical (min) label. */
  private[graft] def mergeHierarchical(
      edges: Seq[(Long, Long, Double, Long)], thresh: Double): Map[Long, Long] = {
    // union-find over labels
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    // adjacency: canonical pair -> (sum, count); weight = sum/count
    val adj = scala.collection.mutable.HashMap.empty[(Long, Long), (Double, Long)]
    edges.foreach { case (a, b, s, c) =>
      val k = (math.min(a, b), math.max(a, b))
      val (s0, c0) = adj.getOrElse(k, (0.0, 0L))
      adj(k) = (s0 + s, c0 + c)
    }
    var continue = true
    while (continue && adj.nonEmpty) {
      val ((la, lb), (s, c)) = adj.minBy { case ((a, b), (s, c)) =>
        (s / c, a, b) // deterministic tie-break by label pair
      }
      if (s / c >= thresh) continue = false
      else {
        val keep = math.min(find(la), find(lb))
        val drop = math.max(find(la), find(lb))
        parent(drop) = keep
        // rebuild edges touching la/lb against the merged node
        val touched = adj.toSeq.filter { case ((a, b), _) =>
          a == la || b == la || a == lb || b == lb
        }
        touched.foreach { case (k, _) => adj.remove(k) }
        touched.foreach { case ((a, b), (es, ec)) =>
          val other = if (a == la || a == lb) b else a
          if (other != la && other != lb) {
            val k = (math.min(keep, find(other)), math.max(keep, find(other)))
            if (k._1 != k._2) {
              val (s0, c0) = adj.getOrElse(k, (0.0, 0L))
              adj(k) = (s0 + es, c0 + ec) // count-weighted mean composition
            }
          }
        }
      }
    }
    // canonical min-label map over every label seen
    val labels = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // find() roots are min-labeled by construction (keep = min)
    labels.map(l => l -> find(l)).toMap
  }

  /** Full ragmerge: returns the relabeled per-pixel rows
    * (image_id, x, y, label). The per-image edge list is bounded by
    * contract (segmentations have regions << pixels). */
  def ragMerge(segs: Dataset[ImageRow], images: Dataset[ImageRow],
               band: Int = 0, thresh: Double = 0.02,
               maxEdges: Int = 1 << 20)
              (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rag = buildBoundary(segs, images, band)
      .limit(maxEdges + 1).collect()
    require(rag.length <= maxEdges,
      s"RAG exceeds the driver-merge contract ($maxEdges edges)")
    val maps: Map[String, Map[Long, Long]] = rag
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))))
      .groupBy(_._1)
      .map { case (id, rows) => id -> mergeHierarchical(rows.map(_._2).toSeq, thresh) }
    val mapsB = spark.sparkContext.broadcast(maps)
    segs.flatMap { sg =>
      val m = mapsB.value.getOrElse(sg.image_id, Map.empty[Long, Long])
      val lab = PixelCodec.decode(sg.bytes, sg.fmt, sg.w, sg.h).bands(0)
      lab.iterator.zipWithIndex.map { case (v, p) =>
        val l = v.toLong
        (sg.image_id, p % sg.w, p / sg.w, m.getOrElse(l, l))
      }
    }.toDF("image_id", "x", "y", "label")
  }
}
