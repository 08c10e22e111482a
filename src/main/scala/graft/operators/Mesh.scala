package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{ImageRow, MultiTileRow, TileRow}

/**
 * Fishnet / extent / annotation-bbox generators — the reference's mesh
 * and label-prep utilities re-expressed relationally:
 *
 *  - `extentPoly` = extent2poly / rasterext2poly
 *    (/root/reference/geospatial_learn/shape.py:191-313, 818-835): one
 *    extent rectangle per raster, pure column math.
 *  - `meshFromRaster` = mesh_from_raster (shape.py:2812-2828): one
 *    grid-cell polygon per PIXEL (the reference burns 1..n and
 *    polygonizes; each pixel is its own region).
 *  - `geomToPixelBBox` = geom2pixelbbox (shape.py:725-816): per-feature
 *    pixel bounding boxes relative to a raster's geotransform — the
 *    object-detection annotation table (image_path, xmin, ymin, xmax,
 *    ymax, label). Python int() truncation == Spark int cast (both
 *    truncate toward zero).
 *  - `meshGrid` = meshgrid (shape.py:2412-2523): fishnet over the
 *    bright-mask's moment-oriented bounds. Reference quirks reproduced
 *    FAITHFULLY: (a) the gridWidth/gridHeight swap bug
 *    (shape.py:2456-2457 assigns both from the original gridHeight, so
 *    cells are always gridHeight-sided squares); (b) each cell is
 *    rotated by pi+orientation about ITS OWN center (shapely rotate's
 *    default origin), i.e. cells spin in place rather than the grid
 *    rotating as a whole; (c) the grid lives in the rotated-bounds
 *    frame. Documented deviation: the engine rotates the mask's
 *    bright-pixel bounding RECTANGLE where the reference rotates the
 *    polygonized outline — identical for convex/rectangular masks.
 *
 * Scale shape: moments come from per-tile partial sums (map-side fold,
 * the shuffle carries 6 doubles per tile); cell generation is a
 * per-image flatMap off those aggregates — no pixel ever shuffles.
 */
object Mesh {

  /** extent2poly: (image_id, x0, y0, x1, y1) world-extent rectangle. */
  def extentPoly(images: Dataset[ImageRow]): DataFrame =
    images.toDF().select(col("image_id"),
      col("x_min").as("x0"),
      (col("y_max") - col("h") * col("px")).as("y0"),
      (col("x_min") + col("w") * col("px")).as("x1"),
      col("y_max").as("y1"))

  /** Per-partition dedupe of the tiler's multi-cell duplicate rows:
    * tiles of one (image, tx, ty, band) are emitted consecutively by
    * the tiler flatMap, so a local filter replaces what a
    * dropDuplicates would do with a full PIXEL-PAYLOAD shuffle. Input
    * must come straight off the tiler (narrow chain), like
    * ConvNet.segPredictTiles — a tripwire enforces it: duplicate keys
    * that are NOT adjacent (the signature of repartitioned/sorted
    * input) fail loudly instead of double-counting. The seen-set holds
    * one small tuple per DISTINCT tile key in the partition (tiles,
    * never pixels), so the check is noise next to the decode cost. */
  private def dedupeConsecutive(tiles: Dataset[TileRow])
                               (implicit spark: SparkSession): Dataset[TileRow] = {
    import spark.implicits._
    tiles.mapPartitions { it =>
      Tiler.firstByKey(it, (t: TileRow) => (t.image_id, t.tx, t.ty, t.band),
        "dedupeConsecutive")
    }
  }

  /** mesh_from_raster: one cell polygon per pixel — (image_id, wx0,
    * wy0, wx1, wy1), the pixel's world square. Generated from tiles so
    * a 10^5 x 10^5 raster streams through as bounded rows; zero
    * shuffle. */
  def meshFromRaster(tiles: Dataset[TileRow])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    dedupeConsecutive(tiles.filter(col("band") === 0).as[TileRow])
      .flatMap { t =>
        for (r <- 0 until t.th; c <- 0 until t.tw) yield {
          val wx0 = t.x_min + c * t.px
          val wy1 = t.y_max - r * t.px
          (t.image_id, wx0, wy1 - t.px, wx0 + t.px, wy1)
        }
      }.toDF("image_id", "wx0", "wy0", "wx1", "wy1")
  }

  /** geom2pixelbbox: annotation rows (image_id, poly_id, xmin, ymin,
    * xmax, ymax, label) — poly bboxes truncated into each intersecting
    * image's pixel frame. Poly bounds ride a broadcast. */
  def geomToPixelBBox(polys: Dataset[graft.PolyRow], images: Dataset[ImageRow],
                      label: String)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pb = polys.map { p =>
      val xs = p.rings(0).map(_.x); val ys = p.rings(0).map(_.y)
      (p.poly_id, xs.min, ys.min, xs.max, ys.max)
    }.toDF("poly_id", "bx0", "by0", "bx1", "by1")
    images.toDF().join(broadcast(pb),
      col("bx0") < col("x_min") + col("w") * col("px") &&
        col("bx1") > col("x_min") &&
        col("by0") < col("y_max") &&
        col("by1") > col("y_max") - col("h") * col("px"))
      .select(col("image_id"), col("poly_id"),
        ((col("bx0") - col("x_min")) / col("px")).cast("int").as("xmin"),
        ((col("y_max") - col("by1")) / col("px")).cast("int").as("ymin"),
        ((col("bx1") - col("x_min")) / col("px")).cast("int").as("xmax"),
        ((col("y_max") - col("by0")) / col("px")).cast("int").as("ymax"),
        lit(label).as("label"))
  }

  /** Per-image bright-mask moments from tiles: n, centroid, central
    * second moments in IMAGE PIXEL coordinates (row/col, the
    * regionprops frame). Map-side partials; 6 doubles per tile shuffle. */
  def maskMoments(tiles: Dataset[TileRow])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    dedupeConsecutive(tiles.filter(col("band") === 0).as[TileRow])
      .map { t =>
        // tile-local partial sums over bright (v > 0) pixels, in image
        // pixel coords derived from the tile's world origin
        var n = 0L; var sx = 0.0; var sy = 0.0
        var sxx = 0.0; var syy = 0.0; var sxy = 0.0
        var r = 0
        while (r < t.th) {
          var c = 0
          while (c < t.tw) {
            if (t.pixels(r * t.tw + c) > 0) {
              val gx = (t.x_min / t.px) + c // image col (x_min/px is the
              val gy = -(t.y_max / t.px) + r // global col offset; origin
              n += 1 // cancels in central moments)
              sx += gx; sy += gy
              sxx += gx * gx; syy += gy * gy; sxy += gx * gy
            }
            c += 1
          }
          r += 1
        }
        (t.image_id, n, sx, sy, sxx, syy, sxy)
      }.toDF("image_id", "n", "sx", "sy", "sxx", "syy", "sxy")
      .groupBy("image_id")
      .agg(sum("n").as("n"), sum("sx").as("sx"), sum("sy").as("sy"),
        sum("sxx").as("sxx"), sum("syy").as("syy"), sum("sxy").as("sxy"))
  }

  /** Per-image orientation from the distributed moment partials:
    * theta = 0.5*atan2(2*mu11, mu20-mu02) (image-moment major axis;
    * regionprops' angle convention differs by a constant rotation —
    * documented; equal on the axis-aligned fixtures). */
  def maskOrientation(tiles: Dataset[TileRow])(implicit spark: SparkSession): DataFrame =
    // an all-dark image aggregates to n = 0: 0.0/0 would flow a silent
    // NaN orientation downstream — drop it, the same empty-mask
    // semantics as imAngle's n == 0 filter
    maskMoments(tiles).where(col("n") > 0).select(col("image_id"),
      (lit(0.5) * atan2(lit(2) * (col("sxy") - col("sx") * col("sy") / col("n")),
        (col("sxx") - col("sx") * col("sx") / col("n")) -
          (col("syy") - col("sy") * col("sy") / col("n"))))
        .as("orient"))

  /** imangle (utilities.py:1241-1281): orientation of the non-zero mask
    * plus the reference's two derived side axes, and the size of the
    * perimeter-stripped mask (the reference zeroes `bwperim(bw)` pixels
    * and returns the stripped array; the count is its row footprint).
    *
    * Angle convention: the moment major axis theta = 0.5 * atan2(2*mu11,
    * mu20 - mu02) (maskOrientation's convention — regionprops'
    * differs by a constant rotation, documented there), then the
    * reference arithmetic verbatim: wrap negative theta by +pi, axis1 =
    * pi - theta, axis2 = axis1 - pi/2 (the `orient < pi` branch — after
    * the wrap it always holds, as in the reference).
    *
    * Perimeter rule = mahotas bwperim n=4: a bright pixel is perimeter
    * iff any 4-neighbor is dark or out of image. Input is HALOED tiles
    * (`Tiler.multiTiles(halo >= 1)`): each tile sees one pixel beyond
    * its core on every in-image side, and at true image edges the
    * window edge IS the image edge, so the neighbor test is exact
    * without any pixel shuffle. Shuffle carries 8 scalars per tile. */
  def imAngle(tiles: Dataset[MultiTileRow], tileSize: Int, halo: Int = 1,
              band: Int = 0)(implicit spark: SparkSession): DataFrame = {
    require(halo >= 1, "imAngle needs a >=1-px halo for the bwperim test")
    import spark.implicits._
    val partials = tiles.mapPartitions { it =>
      // overlapped-cell dedupe + the non-adjacent-duplicate tripwire
      // (summed partials would silently double-count otherwise)
      Tiler.firstCellOnly(it).flatMap { t =>
        {
          val v = t.bands(band)
          val (offX, offY, coreW, coreH) =
            Tiler.coreWindow(t.tx, t.ty, t.tw, t.th, tileSize, halo)
          var n = 0L; var sx = 0.0; var sy = 0.0
          var sxx = 0.0; var syy = 0.0; var sxy = 0.0
          var nInt = 0L
          // global pixel coords off the halo window's world origin (the
          // constant image offset cancels in the central moments)
          val gx0 = t.x_min / t.px; val gy0 = -t.y_max / t.px
          def bright(y2: Int, x2: Int): Boolean =
            y2 >= 0 && y2 < t.th && x2 >= 0 && x2 < t.tw && v(y2 * t.tw + x2) > 0
          var r = 0
          while (r < coreH) {
            var c = 0
            while (c < coreW) {
              val rr = offY + r; val cc = offX + c
              if (v(rr * t.tw + cc) > 0) {
                val gx = gx0 + cc; val gy = gy0 + rr
                n += 1; sx += gx; sy += gy
                sxx += gx * gx; syy += gy * gy; sxy += gx * gy
                if (bright(rr - 1, cc) && bright(rr + 1, cc) &&
                    bright(rr, cc - 1) && bright(rr, cc + 1)) nInt += 1
              }
              c += 1
            }
            r += 1
          }
          if (n == 0) None
          else Some((t.image_id, n, sx, sy, sxx, syy, sxy, nInt))
        }
      }
    }.toDF("image_id", "n", "sx", "sy", "sxx", "syy", "sxy", "n_int")
      .groupBy("image_id")
      .agg(sum("n").as("n"), sum("sx").as("sx"), sum("sy").as("sy"),
        sum("sxx").as("sxx"), sum("syy").as("syy"), sum("sxy").as("sxy"),
        sum("n_int").as("n_int"))
    val theta = lit(0.5) *
      atan2(lit(2) * (col("sxy") - col("sx") * col("sy") / col("n")),
        (col("sxx") - col("sx") * col("sx") / col("n")) -
          (col("syy") - col("sy") * col("sy") / col("n")))
    val wrapped = when(theta < 0, theta + lit(math.Pi)).otherwise(theta)
    partials.select(col("image_id"),
      (lit(math.Pi) - wrapped).as("axis1"),
      (lit(math.Pi) - wrapped - lit(math.Pi / 2)).as("axis2"),
      col("n"), col("n_int"))
  }

  /** Full meshgrid over images (bounded per-image work): decodes each
    * image once, computes moments + bright bbox locally, emits the spun
    * fishnet cells — the per-image analog of the tile path for rasters
    * that fit a row (the reference's regime; huge rasters use
    * maskMoments + a bbox agg instead). */
  def meshGridImages(images: Dataset[ImageRow], gridHeight: Double,
                     gridWidth: Double, band: Int = 0)
                    (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val side = gridHeight // reference swap bug (shape.py:2456-2457)
    images.flatMap { im =>
      val pix = graft.core.PixelCodec.decode(im.bytes, im.fmt, im.w, im.h).bands(band)
      var n = 0L; var sx = 0.0; var sy = 0.0
      var sxx = 0.0; var syy = 0.0; var sxy = 0.0
      var bx0 = Int.MaxValue; var bx1 = Int.MinValue
      var by0 = Int.MaxValue; var by1 = Int.MinValue
      var p = 0
      while (p < pix.length) {
        if (pix(p) > 0) {
          val x = p % im.w; val y = p / im.w
          n += 1; sx += x; sy += y
          sxx += x.toDouble * x; syy += y.toDouble * y; sxy += x.toDouble * y
          if (x < bx0) bx0 = x
          if (x > bx1) bx1 = x
          if (y < by0) by0 = y
          if (y > by1) by1 = y
        }
        p += 1
      }
      if (n == 0) Iterator.empty
      else {
        val mu20 = sxx - sx * sx / n
        val mu02 = syy - sy * sy / n
        val mu11 = sxy - sx * sy / n
        val orient = 0.5 * math.atan2(2 * mu11, mu20 - mu02)
        // world-coord bright bbox (pixel EDGES, as a polygonized outline)
        val wx0 = im.x_min + bx0 * im.px
        val wx1 = im.x_min + (bx1 + 1) * im.px
        val wy1 = im.y_max - by0 * im.px
        val wy0 = im.y_max - (by1 + 1) * im.px
        // rotate the outline rect by (pi - orient) about ITS bbox center
        // (shapely rotate default origin='center'), take bounds
        val ang = math.Pi - orient
        val (ccx, ccy) = ((wx0 + wx1) / 2, (wy0 + wy1) / 2)
        val cosA = math.cos(ang); val sinA = math.sin(ang)
        val corners = Array((wx0, wy0), (wx1, wy0), (wx1, wy1), (wx0, wy1))
          .map { case (x, y) =>
            val dx = x - ccx; val dy = y - ccy
            (ccx + dx * cosA - dy * sinA, ccy + dx * sinA + dy * cosA)
          }
        val rx0 = corners.map(_._1).min; val rx1 = corners.map(_._1).max
        val ry0 = corners.map(_._2).min; val ry1 = corners.map(_._2).max
        val rows = math.ceil((ry1 - ry0) / side).toInt
        val cols = math.ceil((rx1 - rx0) / side).toInt
        // cells spin in place by (pi + orient) about their own centers
        val spinC = math.cos(math.Pi + orient)
        val spinS = math.sin(math.Pi + orient)
        for {
          ci <- (0 until cols).iterator
          rj <- (0 until rows).iterator
        } yield {
          val x0 = rx0 + ci * side; val x1 = x0 + side
          val yt = ry1 - rj * side; val yb = yt - side
          val (mx, my) = ((x0 + x1) / 2, (yb + yt) / 2)
          def spin(x: Double, y: Double): (Double, Double) = {
            val dx = x - mx; val dy = y - my
            (mx + dx * spinC - dy * spinS, my + dx * spinS + dy * spinC)
          }
          val a = spin(x0, yt); val b = spin(x1, yt)
          val c = spin(x1, yb); val d = spin(x0, yb)
          (im.image_id, ci, rj, a._1, a._2, b._1, b._2, c._1, c._2, d._1, d._2)
        }
      }
    }.toDF("image_id", "ci", "rj", "xa", "ya", "xb", "yb", "xc", "yc", "xd", "yd")
  }
}
