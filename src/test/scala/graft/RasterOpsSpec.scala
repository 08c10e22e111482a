package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Geom, GridIndex, PixelCodec}
import graft.gen.Synth
import graft.operators._

object TileFixtures {
  /** Hand-built 4x4 single-cell tile at origin, band b. */
  def tile(pixels: Array[Float], band: Int = 0, t: Int = 0): TileRow = {
    val cell = GridIndex.cellId(2.0, 2.0, GridIndex.MaxRes - 2) // 4-unit cell at origin
    TileRow("imgX", cell, 0, 0, x_min = 0.0, y_max = 4.0, px = 1.0,
      band = band, pixels = pixels, tw = 4, th = 4, nodata = Float.NaN)
  }
  val p0: Array[Float] = Array(
    1, 2, 3, 4,
    5, 6, 7, 8,
    9, 10, 11, 12,
    13, 14, 15, 16)
  val p1: Array[Float] = p0.map(_ * 2)
}

class RasterOpsSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._
  import TileFixtures._

  test("maskRule applies ==/</> with replacement") {
    val df = Seq(tile(p0)).toDS.toDF()
    val lt = RasterOps.maskRule(df, "<", 5f, 0f).select("pixels")
      .as[Array[Float]].head()
    assert(lt.take(4).forall(_ == 0f) && lt(4) == 5f)
    val gt = RasterOps.maskRule(df, ">", 12f, -1f).select("pixels")
      .as[Array[Float]].head()
    assert(gt.drop(12).forall(_ == -1f) && gt(11) == 12f)
    val eq = RasterOps.maskEquals(df, 6f).select("pixels").as[Array[Float]].head()
    assert(eq(5) == 6f && eq.count(_ != 0f) == 1)
  }

  test("normalizedDifference matches per-pixel (a-b)/(a+b)") {
    val ds = Seq(tile(p0, band = 0), tile(p1, band = 1)).toDS
    val ndvi = RasterOps.normalizedDifference(ds, 1, 0)
      .select("pixels").as[Array[Float]].head()
    p0.indices.foreach { i =>
      val want = (p1(i) - p0(i)) / (p1(i) + p0(i))
      assert(math.abs(ndvi(i) - want) < 1e-6, s"i=$i")
    }
  }

  test("combineScene: zeros in s1 take s2, else keep s1") {
    val s1 = tile(Array[Float](0, 1, 0, 2, 0, 3, 0, 4, 5, 0, 6, 0, 7, 0, 8, 0))
    val s2 = tile(Array.fill(16)(9f))
    val r = RasterOps.combineScene(Seq(s1).toDS, Seq(s2).toDS)
      .select("pixels").as[Array[Float]].head()
    assert(r.sameElements(Array[Float](9, 1, 9, 2, 9, 3, 9, 4, 5, 9, 6, 9, 7, 9, 8, 9)))
  }

  test("temporalComposite mean/min/max/sum with NaN frames") {
    val frames = Seq(
      (0, tile(p0)), (1, tile(p1)),
      (2, tile(Array.fill(16)(Float.NaN)))) // all-NaN frame must not poison
      .map { case (t, tr) => (tr.image_id, tr.cell_id, tr.tx, tr.ty, tr.x_min,
        tr.y_max, tr.px, tr.band, tr.pixels, tr.tw, tr.th, tr.nodata, t) }
      .toDF("image_id", "cell_id", "tx", "ty", "x_min", "y_max", "px",
        "band", "pixels", "tw", "th", "nodata", "t")
    def run(stat: String) = RasterOps.temporalComposite(frames, stat)
      .select("pixels").as[Array[Float]].head()
    val mean = run("mean"); val mn = run("min"); val mx = run("max"); val sm = run("sum")
    p0.indices.foreach { i =>
      assert(mean(i) == (p0(i) + p1(i)) / 2, s"mean $i")
      assert(mn(i) == p0(i), s"min $i")
      assert(mx(i) == p1(i), s"max $i")
      assert(sm(i) == p0(i) + p1(i), s"sum $i")
    }
  }

  test("temporalComposite: mixed sentinels composite as missing; std") {
    // layer 2 declares -9999 (not NaN): its sentinel pixels must be
    // skipped like NaN, not averaged in as real values; the output
    // sentinel is deterministically NaN regardless of input order
    val sentinelLayer = tile(Array.fill(16)(-9999f)).copy(nodata = -9999f)
    val frames = Seq((0, tile(p0)), (1, tile(p1)), (2, sentinelLayer))
      .map { case (t, tr) => (tr.image_id, tr.cell_id, tr.tx, tr.ty, tr.x_min,
        tr.y_max, tr.px, tr.band, tr.pixels, tr.tw, tr.th, tr.nodata, t) }
      .toDF("image_id", "cell_id", "tx", "ty", "x_min", "y_max", "px",
        "band", "pixels", "tw", "th", "nodata", "t")
    val out = RasterOps.temporalComposite(frames, "mean")
      .select("pixels", "nodata").as[(Array[Float], Float)].head()
    p0.indices.foreach { i =>
      assert(out._1(i) == (p0(i) + p1(i)) / 2, s"mean $i skipped the sentinel")
    }
    assert(out._2.isNaN, "output sentinel must be the deterministic NaN")
    // std = np.nanstd (population): for two values a, b it is |a-b|/2
    val sd = RasterOps.temporalComposite(frames, "std")
      .select("pixels").as[Array[Float]].head()
    p0.indices.foreach { i =>
      val want = math.abs(p0(i) - p1(i)) / 2.0
      assert(math.abs(sd(i) - want) < 1e-6, s"std $i: ${sd(i)} vs $want")
    }
  }

  test("rasterToPoints emits pixel centers, drops nodata, honors cell ownership") {
    val t = tile(p0.updated(5, Float.NaN))
    val pts = RasterOps.rasterToPoints(Seq(t).toDS.toDF())
      .select("x", "y", "value").as[(Double, Double, Float)].collect()
    assert(pts.length == 15) // one NaN dropped
    assert(pts.contains((0.5, 3.5, 1f)))  // top-left pixel center
    assert(pts.contains((3.5, 0.5, 16f))) // bottom-right
    // duplicated tile under a second cell must not double-emit
    val other = t.copy(cell_id = GridIndex.cellId(100, 100, GridIndex.MaxRes - 2))
    val pts2 = RasterOps.rasterToPoints(Seq(t, other).toDS.toDF()).count()
    assert(pts2 == 15)
  }

  test("rasterize burns PIP mask; clipRaster nodata-fills outside") {
    val poly = PolyRow(1, 0, Array(Array(Pt(0.0, 0.0), Pt(2.0, 0.0), Pt(2.0, 4.0), Pt(0.0, 4.0))), 7, "left", 0.0)
    val res = GridIndex.MaxRes - 2
    val mask = RasterOps.rasterize(Seq(tile(p0)).toDS, Seq(poly).toDS, res)
      .collect().head.pixels
    // left two columns inside
    for (r <- 0 until 4; c <- 0 until 4)
      assert(mask(r * 4 + c) == (if (c < 2) 1f else 0f), s"($r,$c)")
    val burned = RasterOps.rasterize(Seq(tile(p0)).toDS, Seq(poly).toDS, res, burnClass = true)
      .collect().head.pixels
    assert(burned(0) == 7f)
    val clipped = RasterOps.clipRaster(Seq(tile(p0)).toDS, poly, res)
      .collect().head.pixels
    for (r <- 0 until 4; c <- 0 until 4) {
      if (c < 2) assert(clipped(r * 4 + c) == p0(r * 4 + c))
      else assert(clipped(r * 4 + c).isNaN)
    }
  }

  test("applyLut remaps listed values, passes others; otsu splits bimodal") {
    val lutted = RasterOps.applyLut(Seq(tile(p0)).toDS.toDF(), Map(1f -> 100f, 16f -> 0f))
      .select("pixels").as[Array[Float]].head()
    assert(lutted(0) == 100f && lutted(15) == 0f && lutted(5) == 6f)
    val bimodal = tile(Array[Float](10, 10, 10, 11, 10, 11, 10, 10,
      200, 201, 200, 200, 201, 200, 200, 200))
    val thr = RasterOps.otsuThreshold(Seq(bimodal).toDS.toDF())
    assert(thr >= 11 && thr < 200, s"thr=$thr")
  }
}

class PolygonizeSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def image(w: Int, h: Int, px: Array[Float]): ImageRow = {
    val enc = PixelCodec.encode(PixelCodec.FmtRawLe, w, h, Array(px))
    ImageRow("poly-img", enc, w, h, PixelCodec.FmtRawLe, "c", 0L, 0.0, h.toDouble, 1.0)
  }

  test("polygonize: two half rectangles -> two regions with exact rings") {
    val w = 6; val h = 4
    val px = Array.tabulate(w * h)(i => if (i % w < 3) 0f else 96f)
    val regions = Polygonize.polygonize(Seq(image(w, h, px)).toDS, quant = 32f)
      .collect().sortBy(_.value)
    assert(regions.length == 2)
    assert(regions.map(_.pixel_count).sum == w * h)
    val left = regions(0)
    assert(left.pixel_count == 12)
    val ring: Geom.Rings = Array(left.ring.map(p => (p.x, p.y)))
    // region pixel centers inside traced ring; others outside
    for (r <- 0 until h; c <- 0 until w) {
      val inside = Geom.pointInPolygon(c + 0.5, h - r - 0.5, ring)
      assert(inside == (c < 3), s"($r,$c)")
    }
  }

  test("polygonize: concave region ring is exact") {
    val w = 5; val h = 5
    // plus-sign of value 64 on 0 background
    val px = Array.tabulate(w * h) { i =>
      val r = i / w; val c = i % w
      if (r == 2 || c == 2) 64f else 0f
    }
    val regions = Polygonize.polygonize(Seq(image(w, h, px)).toDS, quant = 32f).collect()
    val plus = regions.find(_.value == 64f).get
    assert(plus.pixel_count == 9)
    val ring: Geom.Rings = Array(plus.ring.map(p => (p.x, p.y)))
    for (r <- 0 until h; c <- 0 until w) {
      val inside = Geom.pointInPolygon(c + 0.5, h - r - 0.5, ring)
      assert(inside == (r == 2 || c == 2), s"($r,$c)")
    }
    // 4 background corner regions
    assert(regions.count(_.value == 0f) == 4)
  }
}

class ShapePropsGlcmSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._
  import TileFixtures._

  test("shape props of a 4x2 rectangle") {
    val poly = PolyRow(1, 0, Array(Array(Pt(0, 0), Pt(4, 0), Pt(4, 2), Pt(0, 2))), 1, "r", 0.0)
    val p = ShapeProps.props(Seq(poly).toDS).collect().head
    assert(math.abs(p.area - 8.0) < 1e-9)
    assert(math.abs(p.perimeter - 12.0) < 1e-9)
    assert(math.abs(p.major_axis - 4.0) < 1e-9)
    assert(math.abs(p.minor_axis - 2.0) < 1e-9)
    assert(math.abs(p.centroid_x - 2.0) < 1e-9)
    assert(math.abs(p.solidity - 1.0) < 1e-9)
    assert(math.abs(p.extent - 1.0) < 1e-9)
    assert(p.eccentricity > 0.85 && p.eccentricity < 0.87)
  }

  test("GLCM pair histogram equals naive co-occurrence; texture props sane") {
    val poly = PolyRow(1, 0, Array(Array(Pt(0.0, 0.0), Pt(4.0, 0.0), Pt(4.0, 4.0), Pt(0.0, 4.0))), 1, "all", 0.0)
    val res = GridIndex.MaxRes - 2
    val hist = Glcm.pairHistogram(Seq(tile(p0)).toDS, Seq(poly).toDS, res,
      dx = 1, dy = 0, levels = 8, maxVal = 16f)
      .as[(Long, Int, Int, Int, Long)].collect()
      .map { case (_, _, a, b, n) => (a, b) -> n }.toMap
    // naive: horizontal pairs within the 4x4, quant = v/16*8 clamped
    val naive = scala.collection.mutable.HashMap.empty[(Int, Int), Long]
    def q(v: Float) = math.min(7, (v / 16f * 8).toInt)
    for (r <- 0 until 4; c <- 0 until 3) {
      val a = q(p0(r * 4 + c)); val b = q(p0(r * 4 + c + 1))
      naive((a, b)) = naive.getOrElse((a, b), 0L) + 1
      naive((b, a)) = naive.getOrElse((b, a), 0L) + 1
    }
    assert(hist == naive.toMap)
    val props = Glcm.textureStats(
      Glcm.pairHistogram(Seq(tile(p0)).toDS, Seq(poly).toDS, res, 1, 0, 8, 16f))
      .collect().head
    val asm = props.getAs[Double]("asm")
    val energy = props.getAs[Double]("energy")
    assert(math.abs(energy - math.sqrt(asm)) < 1e-4)
    assert(props.getAs[Double]("homogeneity") <= 1.0)
  }
}

class TrainingSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("extract -> fit -> classify recovers a linearly separated labeling") {
    // image: left half dark (two bands ~10/20), right half bright (~200/100)
    val w = 32; val h = 16
    val b0 = Array.tabulate(w * h)(i => if (i % w < 16) 10f else 200f)
    val b1 = Array.tabulate(w * h)(i => if (i % w < 16) 20f else 100f)
    val enc = PixelCodec.encode(PixelCodec.FmtRawLe, w, h, Array(b0, b1))
    val img = ImageRow("t", enc, w, h, PixelCodec.FmtRawLe, "c", 0L, 0.0, h.toDouble, 1.0)
    val polys = Seq(
      PolyRow(1, 0, Array(Array(Pt(1.0, 1.0), Pt(8.0, 1.0), Pt(8.0, 8.0), Pt(1.0, 8.0))), 1, "dark", 0.0),
      PolyRow(2, 0, Array(Array(Pt(20.0, 1.0), Pt(28.0, 1.0), Pt(28.0, 8.0), Pt(20.0, 8.0))), 2, "bright", 0.0))
    val cellRes = operators.Tiler.resForCellSize(16.0)
    val tiles = Tiler.multiTiles(Seq(img).toDS, tileSize = 16, cellRes = cellRes)
    val samples = Training.extractSamples(tiles, polys.toDS, cellRes)
    val collected = samples.collect()
    // box1 (1..8): 7 pixel-center columns; box2 (20..28): 8 columns; 7 rows each
    assert(collected.count(_.label == 1) == 49)
    assert(collected.count(_.label == 2) == 56)
    assert(collected.filter(_.label == 1).forall(_.features.sameElements(Array(10f, 20f))))
    val model = Training.fitCentroids(samples)
    assert(model.predict(Array(11f, 19f)) == 1)
    assert(model.predict(Array(190f, 105f)) == 2)
    val classified = Training.classify(tiles, model).collect()
    classified.foreach { t =>
      t.pixels.zipWithIndex.foreach { case (v, i) =>
        // reconstruct expected from x position
        val c = i % t.tw
        val worldX = t.x_min + c + 0.5
        assert(v == (if (worldX < 16) 1f else 2f), s"x=$worldX")
      }
    }
  }
}
