package graft.gen

import graft.ImageRow
import graft.core.PixelCodec

/**
 * Deterministic image table whose band-b pixel at (x, y) of image i is the
 * CLOSED-FORM integer function `value(i, b, x, y)` — plus/times/mod math
 * that a DuckDB oracle regenerates with generate_series. Every raster operator
 * (tiler, raster2points, mosaic, features, GLCM, classify, the full zonal
 * pipeline) run over these images is then end-to-end SQL-checkable: the
 * Spark side decodes REAL encoded bytes through the REAL tiler while the
 * oracle recomputes the same pixels relationally (the driver's
 * lineitem-derived-pixel pattern, extended to the image payload).
 *
 * Layout contract (keeps the SQL mirror simple):
 *  - px = 1, W = 80, H = 48; x_min = (i % 8) * 256, y_max = (i / 8) * 256,
 *    both multiples of the 64-unit grid cell, so at tileSize 64 every tile
 *    lands in EXACTLY one grid cell (no ownership splits) and images never
 *    overlap (mosaic uses the explicit overlapping placement below).
 *  - fmt alternates raw-le / rle — lossless, so decoded pixels equal the
 *    formula exactly.
 *
 * SQL mirror of one image set: `GridImages.pxSql(n, bands)`.
 */
object GridImages {
  val W = 80  // 2 tiles at tileSize 64: one full, one 16-px edge tile
  val H = 48

  def value(i: Long, band: Int, x: Int, y: Int): Float =
    ((x * 7 + y * 13 + band * 31 + i * 17) % 97).toFloat

  def xMin(i: Long): Double = (i % 8) * 256.0
  def yMax(i: Long): Double = (i / 8) * 256.0

  def imageAt(i: Long, bands: Int,
              xMin0: Double = Double.NaN, yMax0: Double = Double.NaN): ImageRow = {
    val bs = Array.tabulate(bands)(b =>
      Array.tabulate(W * H)(p => value(i, b, p % W, p / W)))
    val fmt = if (i % 2 == 0) PixelCodec.FmtRawLe else PixelCodec.FmtRle
    val enc = PixelCodec.encode(fmt, W, H, bs)
    ImageRow(f"g$i%03d", enc, W, H, fmt, s"grid image $i",
      PixelCodec.phash64(W, H, bs(0)),
      x_min = if (xMin0.isNaN) xMin(i) else xMin0,
      y_max = if (yMax0.isNaN) yMax(i) else yMax0,
      px = 1.0)
  }

  def images(n: Int, bands: Int = 2): IndexedSeq[ImageRow] =
    (0 until n).map(i => imageAt(i.toLong, bands))

  /** Horizontal-stripe images (single band): every 6-row stripe is a
    * connected region with value ((i*5 + y/6) % 7) * 13 — adjacent
    * stripes always differ, so polygonize's components are exactly the
    * stripes and the oracle counts them in closed form. */
  def stripeValue(i: Long, y: Int): Float = (((i * 5 + y / 6) % 7) * 13).toFloat

  def striped(n: Int): IndexedSeq[ImageRow] = (0 until n).map { i =>
    val b0 = Array.tabulate(W * H)(p => stripeValue(i.toLong, p / W))
    val fmt = if (i % 2 == 0) PixelCodec.FmtRawLe else PixelCodec.FmtRle
    val enc = PixelCodec.encode(fmt, W, H, Array(b0))
    ImageRow(f"g$i%03d", enc, W, H, fmt, s"striped $i",
      PixelCodec.phash64(W, H, b0), x_min = xMin(i.toLong),
      y_max = yMax(i.toLong), px = 1.0)
  }

  // ---- step-edge fixture (Canny / Hough / RANSAC family) ----
  // Piecewise-constant vertical strips + one horizontal value change
  // inside the right strip. Every Canny stage is exercised non-trivially:
  //  - the c1 step (diff 50, |sobel| 200) is a strong double-column edge
  //  - the c2 step (diff 3, |sobel| 12 < lowT 20) never enters the weak
  //    set — suppressed regardless of connectivity
  //  - the c3 strip's step diff is 15 above row k and 8 below, so its
  //    edge line mixes strong (60) and weak (32) pixels — the weak tail
  //    is kept ONLY via hysteresis; two pixels of column c3-1 at rows
  //    k-1/k are NMS-suppressed by the stronger column-c3 neighbor
  //  - the internal horizontal change at row k (diff 7, |sobel| 28)
  //    is a weak line kept only through its 8-connection to column c3.
  // The surviving edge set is closed-form (EdgeSpec pins it; the q_canny
  // oracle enumerates it in SQL).
  def edgeC1(i: Long): Int = 8 + (i % 3).toInt
  def edgeC2(i: Long): Int = 20 + (i % 5).toInt
  def edgeC3(i: Long): Int = 40 + (i % 7).toInt
  def edgeK(i: Long): Int = 12 + (i % 9).toInt

  def edgeValue(i: Long, x: Int, y: Int): Float = {
    var v = 10
    if (x >= edgeC1(i)) v += 50
    if (x >= edgeC2(i)) v += 3
    if (x >= edgeC3(i)) v += (if (y < edgeK(i)) 15 else 8)
    v.toFloat
  }

  def edgeImages(n: Int): IndexedSeq[ImageRow] = (0 until n).map { i =>
    val b0 = Array.tabulate(W * H)(p => edgeValue(i.toLong, p % W, p / W))
    val fmt = if (i % 2 == 0) PixelCodec.FmtRawLe else PixelCodec.FmtRle
    val enc = PixelCodec.encode(fmt, W, H, Array(b0))
    ImageRow(f"g$i%03d", enc, W, H, fmt, s"edge fixture $i",
      PixelCodec.phash64(W, H, b0), x_min = xMin(i.toLong),
      y_max = yMax(i.toLong), px = 1.0)
  }

  /** DuckDB CTE of the closed-form Canny edge set for `edgeImages(n)`
    * at sigma=0, lowT=20, highT=40: (i, image_id, x, y). */
  def edgeSetSql(n: Int): String =
    s"""ep AS (
       |  SELECT i, 8 + (i % 3) AS c1, 40 + (i % 7) AS c3, 12 + (i % 9) AS k
       |  FROM generate_series(0, ${n - 1}) t(i)),
       |edges AS (
       |  SELECT i, c1 - 1 + e AS x, y FROM ep,
       |    generate_series(0, 1) te(e), generate_series(0, ${H - 1}) ty(y)
       |  UNION ALL
       |  SELECT i, c3, y FROM ep, generate_series(0, ${H - 1}) ty(y)
       |  UNION ALL
       |  SELECT i, c3 - 1, y FROM ep, generate_series(0, ${H - 1}) ty(y)
       |  WHERE y <> k - 1 AND y <> k
       |  UNION ALL
       |  SELECT i, x, k - 1 + e FROM ep, generate_series(0, 1) te(e),
       |    generate_series(0, ${W - 1}) tx(x) WHERE x > c3)""".stripMargin

  // ---- grid-line fixture (Hough segmentation / RANSAC) ----
  // Bright 1-px lines on a dark field: vertical lines at x ≡ a(i) mod 16
  // (5 of them), horizontal at y ≡ b(i) mod 12 (4 of them). Thresholding
  // recovers exactly the planted lines, the Hough peaks recover exactly
  // the line coordinates, and the inverted mask's 4-connected components
  // are the 30 grid cells with closed-form widths — the q_hough_seg
  // oracle enumerates them relationally.
  def lineA(i: Long): Int = 3 + (i % 5).toInt
  def lineB(i: Long): Int = 2 + (i % 7).toInt

  def lineValue(i: Long, x: Int, y: Int): Float =
    if (x % 16 == lineA(i) || y % 12 == lineB(i)) 90f else 10f

  def lineImages(n: Int): IndexedSeq[ImageRow] = (0 until n).map { i =>
    val b0 = Array.tabulate(W * H)(p => lineValue(i.toLong, p % W, p / W))
    val fmt = if (i % 2 == 0) PixelCodec.FmtRawLe else PixelCodec.FmtRle
    val enc = PixelCodec.encode(fmt, W, H, Array(b0))
    ImageRow(f"g$i%03d", enc, W, H, fmt, s"line fixture $i",
      PixelCodec.phash64(W, H, b0), x_min = xMin(i.toLong),
      y_max = yMax(i.toLong), px = 1.0)
  }

  // ---- RANSAC fixture ----
  // Two 40-px strips per image; each strip plants a dominant VERTICAL
  // line (15 pixels, every 3rd row, column 40s + 8 + ((i+2s) % 5)) plus
  // 5 noise pixels >= 13 columns away. Any non-planted pair's consensus
  // is provably < 15 (the tilt needed to reach the far noise column
  // sweeps the planted pixels out of the 1-px residual band), so the
  // exhaustive argmax lands on a planted (vertical) pair and the burned
  // line is exactly column a at the edge pixels' rows — closed-form,
  // and the q_ransac oracle replays the whole pair enumeration in SQL.
  def ransacA(i: Long, s: Int): Int = 40 * s + 8 + ((i + 2 * s) % 5).toInt

  def ransacBright(i: Long, x: Int, y: Int): Boolean = {
    val s = x / 40
    val planted = x == ransacA(i, s) && y % 3 == 1 && y <= 43
    val noise = (0 until 5).exists { j =>
      x == 40 * s + 25 + ((i + j) % 7).toInt && y == ((5 * j + 7 * s + i) % 48).toInt
    }
    planted || noise
  }

  def ransacImages(n: Int): IndexedSeq[ImageRow] = (0 until n).map { i =>
    val b0 = Array.tabulate(W * H)(p =>
      if (ransacBright(i.toLong, p % W, p / W)) 90f else 10f)
    val fmt = if (i % 2 == 0) PixelCodec.FmtRawLe else PixelCodec.FmtRle
    val enc = PixelCodec.encode(fmt, W, H, Array(b0))
    ImageRow(f"g$i%03d", enc, W, H, fmt, s"ransac fixture $i",
      PixelCodec.phash64(W, H, b0), x_min = xMin(i.toLong),
      y_max = yMax(i.toLong), px = 1.0)
  }

  /** DuckDB CTE of the fixture's bright pixels: (i, s, x, y, ord). */
  def ransacPxSql(n: Int): String =
    s"""rpx AS (
       |  SELECT DISTINCT * FROM (
       |    SELECT i, s, 40*s + 8 + ((i + 2*s) % 5) AS x, 3*j + 1 AS y
       |    FROM generate_series(0, ${n - 1}) t(i), generate_series(0, 1) ts(s),
       |         generate_series(0, 14) tj(j)
       |    UNION ALL
       |    SELECT i, s, 40*s + 25 + ((i + j) % 7), (5*j + 7*s + i) % 48
       |    FROM generate_series(0, ${n - 1}) t(i), generate_series(0, 1) ts(s),
       |         generate_series(0, 4) tj(j)))""".stripMargin

  /** `nLoc` locations, two images each (i and i+nLoc share a footprint) —
    * the mosaic fixture. */
  def overlapping(nLoc: Int, bands: Int = 1): IndexedSeq[ImageRow] =
    (0 until 2 * nLoc).map { i =>
      val loc = i % nLoc
      imageAt(i.toLong, bands, xMin0 = loc * 256.0, yMax0 = 0.0)
    }

  /** DuckDB CTE producing the identical pixel relation:
    * (i, image_id, b, x, y, v, wx, wy) for n images with the standard
    * placement — wx/wy are pixel-CENTER world coordinates. */
  def pxSql(n: Int, bands: Int): String =
    s"""px AS (
       |  SELECT i, printf('g%03d', i) AS image_id, b, x, y,
       |         CAST((x*7 + y*13 + b*31 + i*17) % 97 AS DOUBLE) AS v,
       |         (i % 8) * 256 + x + CAST(0.5 AS DOUBLE) AS wx,
       |         (i // 8) * 256 - y - CAST(0.5 AS DOUBLE) AS wy
       |  FROM generate_series(0, ${n - 1}) t(i),
       |       generate_series(0, ${bands - 1}) tb(b),
       |       generate_series(0, ${W - 1}) tx(x),
       |       generate_series(0, ${H - 1}) ty(y))""".stripMargin
}
