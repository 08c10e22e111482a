package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Geom, GridIndex, PixelCodec}
import graft.operators._

/** Round-2 fix gates: even-n median, hole-winding PIP fallback, negative
  * GLCM offsets, temporal median/percentile, general polygon clip,
  * buffer, local thresholds, DEM kernels, scalable FID assignment. */
class Round2FixSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("zonal median: np convention for EVEN pixel counts") {
    // n = 4 distinct values -> mean of the two middles, not the upper one
    val hist = Seq(
      (1L, 0, 1f, 1L), (1L, 0, 2f, 1L), (1L, 0, 3f, 1L), (1L, 0, 9f, 1L),
      (2L, 0, 1f, 2L), (2L, 0, 5f, 2L), // even via counts: 1,1,5,5 -> 3
      (3L, 0, 1f, 1L), (3L, 0, 2f, 1L), (3L, 0, 7f, 1L) // odd -> 2
    ).toDF("poly_id", "band", "value", "cnt")
    val m = ZonalStats.stats(hist).select("poly_id", "median")
      .as[(Long, Double)].collect().toMap
    assert(m(1L) == 2.5, s"even-n median: ${m(1L)}")
    assert(m(2L) == 3.0, s"even-n (counts) median: ${m(2L)}")
    assert(m(3L) == 2.0, s"odd-n median: ${m(3L)}")
  }

  test("PIP fallback: same-winding hole + grazing scanline classifies correctly") {
    // exterior has a collinear vertex at y=50, so the y=50 scanline is
    // "ambiguous" and takes the fallback; the hole winds the SAME way as
    // the exterior (like the Synth 'holed' fixture) — the old summed
    // winding number returned 2 (inside); per-ring parity must say outside
    val rings: Geom.Rings = Array(
      Array((0.0, 0.0), (100.0, 0.0), (100.0, 50.0), (100.0, 100.0), (0.0, 100.0)),
      Array((20.0, 20.0), (80.0, 20.0), (80.0, 80.0), (20.0, 80.0)))
    assert(!Geom.pointInPolygon(50.0, 50.0, rings), "inside the hole -> outside")
    assert(Geom.pointInPolygon(10.0, 50.0, rings), "between hole and shell -> inside")
    assert(Geom.pointInPolygon(90.0, 50.0, rings))
    assert(!Geom.pointInPolygon(-5.0, 50.0, rings))
    // same scenario through the Catalyst expression path (PipRuntime)
    val poly = PolyRow(1L, 0, rings.map(_.map { case (x, y) => Pt(x, y) }), 1, "h", 0.0)
    val pts = Seq((1L, 50.0, 50.0), (2L, 10.0, 50.0), (3L, 90.0, 50.0))
      .toDF("pt_id", "x", "y")
    val hit = SpatialJoin.pointsInPolygons(pts, Seq(poly).toDS, res = 12)
      .select("pt_id").as[Long].collect().toSet
    assert(hit == Set(2L, 3L), s"expression path: $hit")
  }

  test("GLCM: negative offsets are in-bounds and mirror positive ones") {
    val res = Tiler.resForCellSize(16.0)
    val px = Array.tabulate(16)(i => (i % 7).toFloat) // 4x4 tile
    val tile = TileRow("i", GridIndex.cellId(2.0, 2.0, res), 0, 0,
      0.0, 4.0, 1.0, 0, px, 4, 4, Float.NaN)
    val poly = PolyRow(1L, 0,
      Array(Array(Pt(-1, -1), Pt(5, -1), Pt(5, 5), Pt(-1, 5))), 1, "p", 0.0)
    def hist(dx: Int, dy: Int) =
      Glcm.pairHistogram(Seq(tile).toDS, Seq(poly).toDS, res, dx, dy, 8, 8f)
        .as[(Long, Int, Int, Int, Long)].collect().toSet
    // symmetric GLCM: offset (dx,dy) and (-dx,-dy) produce identical matrices
    assert(hist(-1, 0) == hist(1, 0))
    assert(hist(0, -1) == hist(0, 1))
    assert(hist(-1, -1) == hist(1, 1)) // would have thrown AIOOBE before
  }

  test("temporalComposite median/percentile == naive np.nanpercentile") {
    val res = Tiler.resForCellSize(16.0)
    val cell = GridIndex.cellId(2.0, 2.0, res)
    def tile(t: Int, vals: Array[Float]) =
      (TileRow("i", cell, 0, 0, 0.0, 2.0, 1.0, 0, vals, 2, 2, Float.NaN), t)
    val series = Seq(
      tile(0, Array(1f, 10f, Float.NaN, 4f)),
      tile(1, Array(5f, 20f, Float.NaN, 2f)),
      tile(2, Array(3f, 30f, 7f, 8f)),
      tile(3, Array(9f, 40f, 5f, 6f)))
    val df2 = series.toDF("tile", "t").select(col("tile.*"), col("t"))
    def got(stat: String, q: Double = 50.0) =
      RasterOps.temporalComposite(df2, stat, q)
        .select("pixels").as[Array[Float]].head()
    def naive(q: Double): Array[Float] = Array.tabulate(4) { i =>
      val vs = series.map(_._1.pixels(i)).filterNot(_.isNaN).sorted
      val pos = (vs.length - 1) * q / 100.0
      val lo = pos.toInt; val frac = pos - lo
      (vs(lo) + (vs(math.min(lo + 1, vs.length - 1)) - vs(lo)) * frac).toFloat
    }
    assert(got("median").sameElements(naive(50.0)))
    assert(got("percentile", 25.0).sameElements(naive(25.0)))
    assert(got("percentile", 90.0).sameElements(naive(90.0)))
  }

  test("clipToPolygons: concave clip conserves area; outside drops") {
    val subject = PolyRow(1L, 0,
      Array(Array(Pt(0, 0), Pt(100, 0), Pt(100, 100), Pt(0, 100))), 1, "s", 0.0)
    // concave L fully inside the subject
    val ell = PolyRow(7L, 0, Array(Array(
      Pt(10, 10), Pt(60, 10), Pt(60, 30), Pt(30, 30), Pt(30, 70), Pt(10, 70))),
      1, "ell", 0.0)
    val far = PolyRow(8L, 0,
      Array(Array(Pt(500, 500), Pt(600, 500), Pt(600, 600), Pt(500, 600))), 1, "f", 0.0)
    val out = VectorOps.clipToPolygons(Seq(subject).toDS, Seq(ell, far)).collect()
    assert(out.forall(_.poly_id == 1L * 100000 + 7L))
    val ellArea = Geom.area(ell.rings.map(_.map(q => (q.x, q.y))))
    val clippedArea = out.map(p => Geom.area(p.rings.map(_.map(q => (q.x, q.y))))).sum
    assert(math.abs(clippedArea - ellArea) < 1e-9, s"$clippedArea vs $ellArea")
    // partial overlap: clip half in, half out
    val half = PolyRow(9L, 0,
      Array(Array(Pt(80, 10), Pt(120, 10), Pt(120, 50), Pt(80, 50))), 1, "h", 0.0)
    val out2 = VectorOps.clipToPolygons(Seq(subject).toDS, Seq(half)).collect()
    val a2 = out2.map(p => Geom.area(p.rings.map(_.map(q => (q.x, q.y))))).sum
    assert(math.abs(a2 - 20.0 * 40.0) < 1e-9, s"partial clip area $a2")
  }

  test("buffer: dilated square area between polygonized and exact bounds") {
    val sq = PolyRow(1L, 0,
      Array(Array(Pt(0, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10))), 1, "sq", 0.0)
    val d = 2.0
    val buf = VectorOps.buffer(Seq(sq).toDS, d).collect()
    val a = buf.map(p => Geom.area(p.rings.map(_.map(q => (q.x, q.y))))).sum
    val exact = 100.0 + 4 * 10 * d + math.Pi * d * d
    assert(a > exact - 0.5 && a <= exact + 1e-6, s"buffered area $a vs $exact")
    // erosion
    val shrunk = VectorOps.buffer(Seq(sq).toDS, -2.0).collect()
    val a2 = shrunk.map(p => Geom.area(p.rings.map(_.map(q => (q.x, q.y))))).sum
    assert(math.abs(a2 - 36.0) < 1e-9, s"eroded area $a2")
  }

  test("localThreshold niblack/sauvola: step edge behaves per formula") {
    val w = 32; val h = 16
    val b = Array.tabulate(w * h)(i => if (i % w < 16) 0f else 100f)
    val img = ImageRow("t", PixelCodec.encode(PixelCodec.FmtRawLe, w, h, Array(b)),
      w, h, PixelCodec.FmtRawLe, "c", 0L, 0.0, h.toDouble, 1.0)
    def mask(algo: String) = {
      val out = ImageOps.localThreshold(Seq(img).toDS, algo, window = 7, k = 0.2)
        .collect().head
      PixelCodec.decode(out.bytes, out.fmt, w, h).bands(0)
    }
    val nb = mask("niblack")
    // deep in flat regions t == m == v -> 0; just right of the edge the
    // local mean dips below 100 -> 1
    assert(nb(8 * w + 2) == 0f && nb(8 * w + 29) == 0f)
    assert(nb(8 * w + 17) == 1f)
    val sv = mask("sauvola")
    // flat bright: t = 100*(1 + 0.2*(0/128 - 1)) = 80 < 100 -> 1; flat dark 0
    assert(sv(8 * w + 29) == 1f && sv(8 * w + 2) == 0f)
  }

  test("localThreshold: a NaN pixel corrupts ONLY its window, not all down-right") {
    val w = 32; val h = 16
    val base = Array.tabulate(w * h)(i => if (i % w < 16) 0f else 100f)
    val img0 = ImageRow("t", PixelCodec.encode(PixelCodec.FmtRawLe, w, h,
      Array(base)), w, h, PixelCodec.FmtRawLe, "c", 0L, 0.0, h.toDouble, 1.0)
    val bNaN = base.updated(2 * w + 2, Float.NaN) // NaN at (2, 2)
    val imgN = img0.copy(bytes =
      PixelCodec.encode(PixelCodec.FmtRawLe, w, h, Array(bNaN)))
    def mask(img: ImageRow) = {
      val out = ImageOps.localThreshold(Seq(img).toDS, "sauvola",
        window = 7, k = 0.2).collect().head
      PixelCodec.decode(out.bytes, out.fmt, w, h).bands(0)
    }
    val clean = mask(img0); val dirty = mask(imgN)
    // inside the NaN's 7x7 window: threshold NaN -> v > NaN false -> 0
    assert(dirty(2 * w + 2) == 0f && dirty(4 * w + 4) == 0f)
    // OUTSIDE the window the outputs must be identical — the prefix-sum
    // poisoning bug zeroed everything down-right of the NaN
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      if (math.abs(x - 2) > 3 || math.abs(y - 2) > 3)
        assert(dirty(i) == clean(i), s"($x, $y) diverged outside the window")
      i += 1
    }
  }

  test("demProcess: plane gradient gives known slope/aspect; hillshade bounded") {
    val w = 16; val h = 16
    val b = Array.tabulate(w * h)(i => (2 * (i % w)).toFloat) // dz/dx = 2
    val img = ImageRow("d", PixelCodec.encode(PixelCodec.FmtRawLe, w, h, Array(b)),
      w, h, PixelCodec.FmtRawLe, "c", 0L, 0.0, h.toDouble, 1.0)
    def band(prop: String) = {
      val out = ImageOps.demProcess(Seq(img).toDS, prop).collect().head
      PixelCodec.decode(out.bytes, out.fmt, w, h).bands(0)
    }
    val sl = band("slope"); val as = band("aspect"); val hs = band("hillshade")
    val i = 8 * w + 8 // interior
    assert(math.abs(sl(i) - math.toDegrees(math.atan(2.0))) < 1e-4)
    assert(math.abs(as(i) - 270.0) < 1e-4, s"aspect ${as(i)}") // faces -x = west
    assert(hs.forall(v => v >= 0f && v <= 255f))
    // flat image: slope 0, aspect flagged, hillshade constant
    val flat = ImageRow("f", PixelCodec.encode(PixelCodec.FmtRawLe, 8, 8,
      Array(Array.fill(64)(5f))), 8, 8, PixelCodec.FmtRawLe, "c", 0L, 0.0, 8.0, 1.0)
    val fsl = ImageOps.demProcess(Seq(flat).toDS, "slope").collect().head
    assert(PixelCodec.decode(fsl.bytes, fsl.fmt, 8, 8).bands(0).forall(_ == 0f))
    val fas = ImageOps.demProcess(Seq(flat).toDS, "aspect").collect().head
    assert(PixelCodec.decode(fas.bytes, fas.fmt, 8, 8).bands(0).forall(_ == -9999f))
  }

  test("writeIdField: dense 1..n ids in order, no global single-partition sort") {
    val df = spark.range(1000).select((col("id") * 37 % 1000).as("k"))
    val out = VectorOps.writeIdField(df.repartition(8), "k").collect()
    assert(out.length == 1000)
    val byK = out.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(byK.sameElements(1L to 1000L), "fid must follow k order densely")
  }

  test("sqlFilter runs user SQL over the layer view; filterLabel leaves non-matches NULL") {
    val layer = Seq((1L, "a", 10), (2L, "b", 300), (3L, "a", 500))
      .toDF("id", "grp", "m")
    val filtered = VectorOps.sqlFilter(layer,
      "SELECT id, m FROM layer WHERE grp = 'a' AND m > 100").collect()
    assert(filtered.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((3L, 500)))
    val labeled = VectorOps.filterLabel(layer, col("m") >= 300, "lab", "keep")
      .select("id", "lab").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(labeled == Set((1L, null), (2L, "keep"), (3L, "keep")),
      "matching rows labeled, non-matching rows NULL (OGR leaves the field unset)")
  }

  test("hex-ring kNN == square-grid kNN (both exact by guard+fallback)") {
    import graft.queries.Queries
    val grid = Queries.qKnn(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Int)].collect().toSet
    val hex = Queries.qKnnHex(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(hex == grid)
    assert(hex.nonEmpty)
  }

  test("clipToPolygons on rect layers == clipToRects (independent paths)") {
    val polys = graft.gen.Synth.polygons(nExtra = 4)
    val rects = Seq(
      (0L, Geom.BBox(-100.0, -100.0, 50.0, 50.0)),
      (1L, Geom.BBox(800.0, 800.0, 1000.0, 1000.0)))
    val viaRects = VectorOps.clipToRects(spark.createDataset(polys.toSeq), rects)
      .collect().groupBy(_.poly_id).map { case (id, ps) =>
        id -> ps.map(p => Geom.area(p.rings.map(_.map(q => (q.x, q.y))))).sum
      }
    val rectPolys = rects.map { case (id, b) =>
      PolyRow(id, 0, Array(Array(Pt(b.x0, b.y0), Pt(b.x1, b.y0),
        Pt(b.x1, b.y1), Pt(b.x0, b.y1))), 1, s"r$id", 0.0)
    }
    val viaJts = VectorOps.clipToPolygons(spark.createDataset(polys.toSeq), rectPolys)
      .collect().groupBy(_.poly_id).map { case (id, ps) =>
        id -> ps.map(p => Geom.area(p.rings.map(_.map(q => (q.x, q.y))))).sum
      }
    assert(viaJts.keySet == viaRects.keySet)
    viaJts.foreach { case (id, a) =>
      assert(math.abs(a - viaRects(id)) < 1e-9, s"poly $id: $a vs ${viaRects(id)}")
    }
  }

  test("SnapshotTable resolves the Hadoop FS from an explicit file:/ scheme") {
    import graft.plans.SnapshotTable
    val root = "file://" + java.nio.file.Files
      .createTempDirectory("graft_fs_").toString + "/t"
    val table = new SnapshotTable(spark, root, "shard")
    val df = spark.range(10).selectExpr("id", "cast(id % 2 as string) as shard")
    assert(table.commit(df, "w1") == Set("0", "1"))
    assert(table.read().count() == 10)
    assert(table.committed()("0").rows == 5)
    assert(table.commit(df, "w2").isEmpty) // idempotent re-commit
  }

  test("PIP == JTS covers on random star polygons + holed rings (off-boundary)") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val gf = new GeometryFactory()
    val rng = new graft.gen.Synth.Rng(99L)
    var checked = 0
    for (trial <- 0 until 15) {
      val cx = rng.nextDouble() * 200 - 100
      val cy = rng.nextDouble() * 200 - 100
      val k = 3 + rng.nextInt(4)
      val nv = 12 + rng.nextInt(20)
      val ring = Array.tabulate(nv) { v =>
        val ang = 2 * math.Pi * v / nv
        val r = 30.0 * (1.0 + 0.45 * math.sin(k * ang))
        (cx + r * math.cos(ang), cy + r * math.sin(ang))
      }
      // every other trial adds a SAME-WINDING square hole at the center
      val rings: Geom.Rings =
        if (trial % 2 == 0) Array(ring)
        else Array(ring, Array((cx - 5.0, cy - 5.0), (cx + 5.0, cy - 5.0),
          (cx + 5.0, cy + 5.0), (cx - 5.0, cy + 5.0)))
      val jts = VectorOps.toJts(rings)
      val boundary = jts.getBoundary
      for (_ <- 0 until 200) {
        val px = cx + rng.nextDouble() * 120 - 60
        val py = cy + rng.nextDouble() * 120 - 60
        val pt = gf.createPoint(new Coordinate(px, py))
        if (boundary.distance(pt) > 1e-6) { // off-boundary: conventions agree
          assert(Geom.pointInPolygon(px, py, rings) == jts.covers(pt),
            s"trial $trial point ($px, $py)")
          checked += 1
        }
      }
    }
    assert(checked > 2500)
  }

  test("classifyObjects: single-class model, null features, tie break") {
    import graft.operators.Training
    val m1 = Training.CentroidModel(Array(7), Array(Array(1.0, 2.0)))
    val df = Seq((1L, 0.0, 0.0), (2L, 9.0, 9.0)).toDF("id", "f0", "f1")
    // one-class model: everything gets the only label (least() edge case)
    assert(Training.classifyObjects(df, m1, Seq("f0", "f1"))
      .select("pred").as[Int].collect().forall(_ == 7))
    // equidistant centroids: smallest label wins (predict() convention)
    val m2 = Training.CentroidModel(Array(3, 1),
      Array(Array(2.0, 0.0), Array(0.0, 2.0)))
    val tie = Seq((1L, 1.0, 1.0)).toDF("id", "f0", "f1")
    assert(Training.classifyObjects(tie, m2, Seq("f0", "f1"))
      .select("pred").as[Int].head() == 1)
    // null feature -> null prediction, never silently the last label
    val withNull = Seq((1L, Some(1.0), None: Option[Double]))
      .toDF("id", "f0", "f1")
    assert(Training.classifyObjects(withNull, m2, Seq("f0", "f1"))
      .select("pred").collect().head.isNullAt(0))
  }

  test("hammingPairs fuzz: full recall on 64 random signatures, radii 1..15") {
    val rng = new graft.gen.Synth.Rng(123L)
    val sigs = (0 until 64).map(i => (i.toLong, rng.nextLong()))
    val df = sigs.toDF("id", "sig")
    val naive = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
    } yield (a, b, java.lang.Long.bitCount(sa ^ sb))).toSet
    for (radius <- Seq(1, 5, 11, 15)) {
      val got = graft.text.TextOps.hammingPairs(df, "id", "sig", radius)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == naive.filter(_._3 <= radius), s"radius $radius")
    }
  }

  test("otsu: quantized path stays near the exact threshold") {
    val res = Tiler.resForCellSize(16.0)
    val cell = GridIndex.cellId(2.0, 2.0, res)
    // bimodal float values (distinct per pixel -> forces the binned path)
    val vals = Array.tabulate(256)(i =>
      if (i < 128) 10f + i * 0.001f else 200f + i * 0.001f)
    val t = TileRow("i", cell, 0, 0, 0.0, 16.0, 1.0, 0, vals, 16, 16, Float.NaN)
    val thr = RasterOps.otsuThreshold(Seq(t).toDF(), levels = 64)
    assert(thr > 10.3 && thr < 200.0, s"threshold $thr must split the modes")
  }
}
