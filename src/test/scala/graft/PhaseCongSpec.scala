package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.core.PixelCodec
import graft.operators.{ImageOps, PhaseCong}

class PhaseCongSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark

  test("fft2 equals the naive O(n^4) DFT, forward and inverse") {
    val w = 8; val h = 4
    val rng = new scala.util.Random(42)
    val re = Array.fill(w * h)(rng.nextDouble() * 10 - 5)
    val im = Array.fill(w * h)(rng.nextDouble() * 10 - 5)
    // naive DFT
    val nr = new Array[Double](w * h); val ni = new Array[Double](w * h)
    for (v <- 0 until h; u <- 0 until w) {
      var sr = 0.0; var si = 0.0
      for (y <- 0 until h; x <- 0 until w) {
        val ang = -2 * math.Pi * (u.toDouble * x / w + v.toDouble * y / h)
        val c = math.cos(ang); val s = math.sin(ang)
        sr += re(y * w + x) * c - im(y * w + x) * s
        si += re(y * w + x) * s + im(y * w + x) * c
      }
      nr(v * w + u) = sr; ni(v * w + u) = si
    }
    val fr = re.clone(); val fi = im.clone()
    PhaseCong.fft2(fr, fi, w, h, inverse = false)
    for (p <- 0 until w * h) {
      assert(math.abs(fr(p) - nr(p)) < 1e-9, s"re $p")
      assert(math.abs(fi(p) - ni(p)) < 1e-9, s"im $p")
    }
    // inverse round-trip
    PhaseCong.fft2(fr, fi, w, h, inverse = true)
    for (p <- 0 until w * h) {
      assert(math.abs(fr(p) - re(p)) < 1e-9)
      assert(math.abs(fi(p) - im(p)) < 1e-9)
    }
  }

  test("phase congruency: high on the step edge, low on flat / gradual ramps") {
    val w = 32; val h = 32
    // vertical step at x=16
    val step = Array.tabulate(w * h)(p => if (p % w >= 16) 100f else 20f)
    val (mStep, _) = PhaseCong.phasecong(step, w, h, nscale = 3, norient = 4)
    // flat field: zero response
    val flat = Array.fill(w * h)(60f)
    val (mFlat, _) = PhaseCong.phasecong(flat, w, h, nscale = 3, norient = 4)
    assert(mFlat.forall(_ < 1e-3), "flat image has no congruency (epsilon floor only)")
    // the step columns dominate everything away from the edge
    val interiorRows = 8 until 24
    val atEdge = interiorRows.map(y => mStep(y * w + 16)).min
    val offEdge = (for (y <- interiorRows; x <- Seq(4, 9, 26)) yield mStep(y * w + x)).max
    assert(atEdge > 2 * offEdge, s"edge $atEdge vs off $offEdge")
    // PC is (approximately) contrast-invariant: scaling the image leaves
    // the noise threshold and the normalized measure in proportion
    val step2 = step.map(v => v * 3f)
    val (mStep2, _) = PhaseCong.phasecong(step2, w, h, nscale = 3, norient = 4)
    val r = interiorRows.map(y => mStep2(y * w + 16) / mStep(y * w + 16))
    r.foreach(v => assert(math.abs(v - 1.0) < 0.05, s"contrast invariance $v"))
  }

  test("orientation map: vertical edge normal is horizontal, and vice versa") {
    val w = 32; val h = 32
    val vert = Array.tabulate(w * h)(p => if (p % w >= 16) 100f else 20f)
    val (mv, ov) = PhaseCong.phasecong(vert, w, h, nscale = 3, norient = 4)
    // at the vertical edge the principal axis (PC energy) is horizontal
    // (cos-dominated) -> ori ~ 0
    for (y <- 10 to 20) {
      val a = ov(y * w + 16)
      assert(math.abs(math.sin(a)) < 0.2, s"vertical edge axis $a")
    }
    val horiz = Array.tabulate(w * h)(p => if (p / w >= 16) 100f else 20f)
    val (_, oh) = PhaseCong.phasecong(horiz, w, h, nscale = 3, norient = 4)
    for (x <- 10 to 20) {
      val a = oh(16 * w + x)
      assert(math.abs(math.cos(a)) < 0.2, s"horizontal edge axis $a")
    }
    assert(mv.max > 0)
  }

  test("phaseCongEdges: the planted step survives NMS + hysteresis, zeros masked") {
    val w = 32; val h = 32
    val step = Array.tabulate(w * h) { p =>
      val x = p % w
      if (x >= 16) 100f else if (x <= 1) 0f else 20f // left margin is nodata-0
    }
    val img = ImageOps.fromArray("p0", Array(step), w, h, 0, 0, 1.0, PixelCodec.FmtRawLe)
    val ds = spark.createDataset(Seq(img))(
      org.apache.spark.sql.Encoders.product[ImageRow])
    val edges = PhaseCong.phaseCongEdges(ds, nscale = 3, norient = 4,
      lowT = 60, hiT = 120).collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(edges.nonEmpty)
    // every edge pixel hugs the step — or the image borders, where the
    // FFT's periodic extension creates a genuine wrap-around step (the
    // 100 -> 0 jump from x=31 back to x=0; phasepack behaves the same).
    // Nothing may appear in the flat interiors; the zero margin is
    // masked out.
    edges.foreach { case (x, _) =>
      assert((x >= 14 && x <= 18) || x >= 29 || x <= 3, s"stray edge at x=$x")
    }
    // the edge line is vertically continuous through the interior
    val xs = edges.groupBy(_._2)
    for (y <- 8 to 24) assert(xs.contains(y), s"gap at row $y")
  }

  test("phaseCongEdges: a DIAGONAL step survives NMS continuously") {
    // ori lives in the y-up frequency frame: a +45-deg (y-up) edge
    // normal is the (+1,-1)/(-1,+1) pixel pair. A y-down sector table
    // compares ALONG the diagonal edge — ridge pixels get suppressed by
    // their own edge-mates and the chain tears (the bug this pins).
    val w = 32; val h = 32
    val diag = Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      if (y > x) 100f else 20f // step along the main diagonal
    }
    val img = ImageOps.fromArray("d0", Array(diag), w, h, 0, 0, 1.0,
      PixelCodec.FmtRawLe)
    val ds = spark.createDataset(Seq(img))(
      org.apache.spark.sql.Encoders.product[ImageRow])
    val edges = PhaseCong.phaseCongEdges(ds, nscale = 3, norient = 6,
      lowT = 60, hiT = 120).collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(edges.nonEmpty)
    // the diagonal chain is continuous through the interior: every
    // interior anti-diagonal band has an edge pixel hugging y = x
    for (d <- 16 to 46) { // d = x + y over the interior
      assert(edges.exists { case (x, y) =>
        x + y == d && math.abs(x - y) <= 3 }, s"diagonal gap at x+y=$d")
    }
  }

  test("houghseg composes with phase edges (the reference's edge='phase' option)") {
    import org.apache.spark.sql.functions.{col, desc}
    val w = 32; val h = 32
    val step = Array.tabulate(w * h)(p => if (p % w >= 16) 100f else 20f)
    val img = ImageOps.fromArray("p1", Array(step), w, h, 0, 0, 1.0, PixelCodec.FmtRawLe)
    val ds = spark.createDataset(Seq(img))(
      org.apache.spark.sql.Encoders.product[ImageRow])
    val edges = PhaseCong.phaseCongEdges(ds, nscale = 3, norient = 4,
      lowT = 60, hiT = 120).where(col("x") > 5 && col("x") < 27)
    val acc = graft.operators.Hough.accumulate(edges, Seq(0.0))
    val top = acc.orderBy(desc("votes")).collect().head
    // theta = 0 -> rho = x: the strongest line is the step column
    assert(top.getInt(2) >= 15 && top.getInt(2) <= 17,
      s"peak rho ${top.getInt(2)}")
  }

  test("phaseCongTiles: a single-tile image reproduces phasecong bit-for-bit") {
    import graft.operators.Tiler
    import org.apache.spark.sql.functions.col
    val im = graft.gen.GridImages.pcImages(1).head
    val pix = PixelCodec.decode(im.bytes, im.fmt, im.w, im.h).bands(0)
    val (m, ori) = PhaseCong.phasecong(pix, im.w, im.h, nscale = 2, norient = 2)
    val ds = spark.createDataset(Seq(im))(
      org.apache.spark.sql.Encoders.product[ImageRow])
    // tileSize covers the image, halo clips to the image bounds -> the
    // haloed window IS the whole image and the core crop is identity
    val tiles = Tiler.multiTiles(ds, 16, Tiler.resForCellSize(64.0), halo = 4)
    val out = PhaseCong.phaseCongTiles(tiles, tileSize = 16, halo = 4,
      nscale = 2, norient = 2).collect().sortBy(_.band)
    assert(out.length == 2)
    val tm = out(0); val to = out(1)
    assert(tm.tw == 16 && tm.th == 16 && tm.x_min == im.x_min && tm.y_max == im.y_max)
    assert(tm.pixels.sameElements(m.map(_.toFloat)), "M map bit parity")
    assert(to.pixels.sameElements(ori.map(_.toFloat)), "ori map bit parity")
  }

  test("phaseCongTiles: overlap-save boundary error is small and decays with halo") {
    import graft.operators.Tiler
    val w = 64; val h = 64
    // smooth field + one step edge: congruency is localized at x=20, so
    // tiled-vs-whole disagreement measures the overlap-save truncation,
    // not noise-threshold jitter on an everywhere-active texture
    val b0 = Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      (40.0 + 25.0 * math.sin(2 * math.Pi * x / 64) *
        math.sin(2 * math.Pi * y / 64) +
        (if (x >= 20) 60.0 else 0.0)).toFloat
    }
    val im = ImageOps.fromArray("t0", Array(b0), w, h, 0, 64, 1.0, PixelCodec.FmtRawLe)
    val (whole, _) = PhaseCong.phasecong(b0, w, h, nscale = 3, norient = 4)
    val ds = spark.createDataset(Seq(im))(
      org.apache.spark.sql.Encoders.product[ImageRow])
    def err(halo: Int): Double = {
      val tiles = Tiler.multiTiles(ds, 32, Tiler.resForCellSize(64.0), halo = halo)
      val got = new Array[Double](w * h)
      PhaseCong.phaseCongTiles(tiles, tileSize = 32, halo = halo,
        nscale = 3, norient = 4).filter(_.band == 0).collect().foreach { t =>
        var r = 0
        while (r < t.th) {
          var c = 0
          while (c < t.tw) {
            got((t.ty * 32 + r) * w + t.tx * 32 + c) = t.pixels(r * t.tw + c)
            c += 1
          }
          r += 1
        }
      }
      // interior-only: at the image border the two legitimately differ
      // by boundary model (the whole-image pow2 FFT is periodic and
      // responds to the x=63->0 wrap cliff; tiles reflect-pad), so the
      // overlap-save truncation is what the interior isolates
      var sum = 0.0; var mSum = 0.0; var cnt = 0
      for (y <- 8 until h - 8; x <- 8 until w - 8) {
        val p = y * w + x
        sum += math.abs(got(p) - whole(p)); mSum += whole(p); cnt += 1
      }
      sum / cnt / (mSum / cnt)
    }
    val e8 = err(8); val e16 = err(16)
    info(f"tiled-vs-whole mean abs error / mean M: halo=8 $e8%.4f, halo=16 $e16%.4f")
    // per-window tau + window truncation both shrink as the halo grows;
    // the bounds are measured on this fixture and double the observed
    // values to absorb libm drift, not to hide regressions
    assert(e16 < e8, s"error must decay with halo: $e16 !< $e8")
    assert(e16 < 0.15, s"halo=16 mean relative error $e16")
  }

  test("phaseCongEdgesTiles: single-tile image equals phaseCongEdges exactly") {
    import graft.operators.Tiler
    val w = 32; val h = 32
    val step = Array.tabulate(w * h)(p => if (p % w >= 16) 100f else 20f)
    val img = ImageOps.fromArray("p1", Array(step), w, h, 0, 0, 1.0, PixelCodec.FmtRawLe)
    val ds = spark.createDataset(Seq(img))(
      org.apache.spark.sql.Encoders.product[ImageRow])
    val whole = PhaseCong.phaseCongEdges(ds, nscale = 3, norient = 4,
      lowT = 60, hiT = 120).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val tiles = Tiler.multiTiles(ds, 32, Tiler.resForCellSize(64.0), halo = 4)
    val tiled = PhaseCong.phaseCongEdgesTiles(tiles, tileSize = 32, halo = 4,
      nscale = 3, norient = 4, lowT = 60, hiT = 120).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(whole.nonEmpty, "fixture produced no edges — vacuous parity")
    assert(tiled == whole,
      s"missing ${(whole -- tiled).take(5)}, extra ${(tiled -- whole).take(5)}")
  }

  test("phaseCongEdgesTiles: multi-tile step edge survives and stays continuous") {
    import graft.operators.Tiler
    val w = 64; val h = 64
    val step = Array.tabulate(w * h)(p => if (p % w >= 24) 100f else 20f)
    val img = ImageOps.fromArray("p2", Array(step), w, h, 0, 64, 1.0, PixelCodec.FmtRawLe)
    val ds = spark.createDataset(Seq(img))(
      org.apache.spark.sql.Encoders.product[ImageRow])
    val edges = PhaseCong.phaseCongEdgesTiles(
      Tiler.multiTiles(ds, 32, Tiler.resForCellSize(64.0), halo = 16),
      tileSize = 32, halo = 16, nscale = 3, norient = 4,
      lowT = 60, hiT = 120).collect()
      .map(r => (r.getInt(1), r.getInt(2)))
    assert(edges.nonEmpty)
    // every edge pixel hugs the planted step (or the wrapless borders)
    edges.foreach { case (x, _) =>
      assert((x >= 22 && x <= 26) || x >= 60 || x <= 3, s"stray edge at x=$x")
    }
    // and the step line crosses the tile seam rows without a gap —
    // the distributed hysteresis stitched the two tile halves
    val ys = edges.filter { case (x, _) => x >= 22 && x <= 26 }.map(_._2).toSet
    for (y <- 8 to 56) assert(ys.contains(y), s"gap at row $y")
  }
}
