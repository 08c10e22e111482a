package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.core.PixelCodec
import graft.operators.ImageOps

/** Round-5 additions: the remaining gdaldem props (TRI/TPI/Roughness,
  * color-relief) against closed forms. */
class Round5FixSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def img1(id: String, b: Array[Float], w: Int, h: Int): ImageRow =
    ImageRow(id, PixelCodec.encode(PixelCodec.FmtRawLe, w, h, Array(b)),
      w, h, PixelCodec.FmtRawLe, "c", 0L, 0.0, h.toDouble, 1.0)

  test("demProcess TRI/TPI/Roughness: plane gradient closed forms") {
    val w = 16; val h = 16
    val img = img1("d", Array.tabulate(w * h)(i => (2 * (i % w)).toFloat), w, h)
    def band(prop: String) = {
      val out = ImageOps.demProcess(Seq(img).toDS, prop).collect().head
      PixelCodec.decode(out.bytes, out.fmt, w, h).bands(0)
    }
    val i = 8 * w + 8 // interior: left col -2 x3, right col +2 x3, own col 0 x2
    assert(math.abs(band("TRI")(i) - math.sqrt(24.0)) < 1e-6)
    assert(band("TPI")(i) == 0f) // symmetric neighbors: mean == center
    assert(band("Roughness")(i) == 4f) // 3x3 spans x-1..x+1 -> 2*(2px)
    // flat image: all three are zero everywhere (borders clamp)
    val flat = img1("f", Array.fill(64)(5f), 8, 8)
    for (p <- Seq("TRI", "TPI", "Roughness")) {
      val o = ImageOps.demProcess(Seq(flat).toDS, p).collect().head
      assert(PixelCodec.decode(o.bytes, o.fmt, 8, 8).bands(0).forall(_ == 0f), p)
    }
    // corner pixel of the ramp: clamping halves the spread
    assert(band("Roughness")(0) == 2f)
  }

  test("qHistMatch equals a literal np.interp quantile-map replay") {
    // Third implementation: the DuckDB oracle shares the relational
    // interval-join shape with the query, so a shared-logic slip would
    // pass both — this replay computes np.interp(s_quantiles,
    // t_quantiles, t_values) directly (left clamp + bracketing linear
    // blend), with the same left-to-right cumulative sums, the same
    // mult-before-div blend association and the same HALF_UP round, so
    // the comparison is exact double equality.
    import graft.queries.Queries
    val dir = "/root/testdata/sf0.001"
    val src = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("cast(l_quantity as int) as v").collect().map(_.getInt(0))
    val tmpl = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("cast(floor(o_totalprice / 10000.0) as int) as tb")
      .collect().map(_.getInt(0))
    def cdf(xs: Array[Int]): (Array[Int], Array[Double]) = {
      val g = xs.groupBy(identity).toArray.sortBy(_._1)
      val cum = g.map(_._2.length.toLong).scanLeft(0L)(_ + _).tail
      (g.map(_._1), cum.map(c => c * 1.0 / xs.length))
    }
    val (sv, sq) = cdf(src)
    val (tv, tq) = cdf(tmpl)
    def interp(x: Double): Double =
      if (x <= tq(0)) tv(0).toDouble
      else {
        val j = tq.indexWhere(x <= _) // >= 1; both CDFs end at exactly 1.0
        tv(j - 1) + (tv(j) - tv(j - 1)) * (x - tq(j - 1)) / (tq(j) - tq(j - 1))
      }
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val expected = sv.zip(sq).map { case (v, q) => (v, r6(interp(q))) }.toMap
    val got = Queries.qHistMatch(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(got.keySet == expected.keySet)
    for ((v, m) <- expected) assert(got(v) == m, s"v=$v")
  }

  test("colorRelief: end-stop clamps and exact mid-segment interpolation") {
    val ramp = Seq((0.0, 0.0, 0.0, 240.0), (48.0, 48.0, 192.0, 96.0),
      (96.0, 240.0, 48.0, 0.0))
    val img = img1("c", Array(0f, 24f, 48f, 72f, 96f, 120f), 6, 1)
    val out = ImageOps.colorRelief(Seq(img).toDS, ramp).collect().head
    val dec = PixelCodec.decode(out.bytes, out.fmt, 6, 1)
    def rgb(i: Int) = (dec.bands(0)(i), dec.bands(1)(i), dec.bands(2)(i))
    assert(rgb(0) == ((0f, 0f, 240f)))       // first stop
    assert(rgb(1) == ((24f, 96f, 168f)))     // mid of segment 1
    assert(rgb(2) == ((48f, 192f, 96f)))     // exact stop 2
    assert(rgb(3) == ((144f, 120f, 48f)))    // mid of segment 2
    assert(rgb(4) == ((240f, 48f, 0f)))      // last stop
    assert(rgb(5) == ((240f, 48f, 0f)))      // above ramp clamps
  }

  test("cv2normTiles: NaN nodata survives the rng==0 branch and the stats") {
    import graft.operators.{Augment, Tiler}
    // constant valid value + NaN fill: stats must ignore the NaNs and
    // the rescale must NOT rewrite them to 0f (NaN == NaN is false, so
    // a plain equality nodata guard is dead for the tiler's default
    // sentinel)
    val px = Array.tabulate(16)(i => if (i % 3 == 0) Float.NaN else 7f)
    val img = img1("n", px, 4, 4)
    val tiles = Tiler.tiles(Seq(img).toDS, tileSize = 2, cellRes = 4)
    val out = Augment.cv2normTiles(tiles).collect()
    assert(out.nonEmpty)
    for (t <- out; i <- t.pixels.indices) {
      val v = t.pixels(i)
      assert(v.isNaN || v == 0f, s"got $v") // valid 7f -> 0f (rng==0)
    }
    assert(out.exists(_.pixels.exists(_.isNaN)), "NaN nodata was rewritten")
    // finite-sentinel behavior unchanged: sentinel preserved, ramp to [0,1]
    val img2 = img1("m", Array(-9999f, 0f, 5f, 10f), 2, 2)
    val t2 = Tiler.tiles(Seq(img2).toDS, tileSize = 2, cellRes = 4,
      nodata = -9999f)
    val o2 = Augment.cv2normTiles(t2).collect().head
    assert(o2.pixels.sorted.sameElements(Array(-9999f, 0f, 0.5f, 1f)))
  }

  test("coreWindow tripwire: under-claimed halo fails fast") {
    import graft.operators.Tiler
    // tiler ran with halo 8 (interior window 32+16=48 wide); a consumer
    // claiming halo 4 must trip, not silently shift every coordinate
    val e = intercept[IllegalArgumentException] {
      Tiler.coreWindow(1, 1, 48, 48, 32, 4)
    }
    assert(e.getMessage.contains("larger halo"))
    // truthful halo passes, including image-edge-clipped windows
    assert(Tiler.coreWindow(1, 1, 48, 48, 32, 8) == ((8, 8, 32, 32)))
    assert(Tiler.coreWindow(0, 0, 40, 40, 32, 8) == ((0, 0, 32, 32)))
  }

  test("sqlFilter: view dropped after the call; returned plan stays live") {
    import graft.operators.VectorOps
    val a = Seq((1, "x"), (2, "y")).toDF("id", "v")
    val b = Seq((9, "z")).toDF("id", "v")
    val fa = VectorOps.sqlFilter(a, "SELECT id FROM layer WHERE id > 1")
    // the view must not leak into the session catalog...
    assert(!spark.catalog.tableExists("layer"))
    // ...and a second call over a DIFFERENT layer must not disturb the
    // first call's already-analyzed (view-inlined) plan
    val fb = VectorOps.sqlFilter(b, "SELECT id FROM layer")
    assert(fa.collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(fb.collect().map(_.getInt(0)).toSeq == Seq(9))
  }

  test("polygonize: NaN nodata pixels form no region") {
    import graft.operators.Polygonize
    val w = 8; val h = 8
    // left half value 64, right half NaN
    val b = Array.tabulate(w * h)(i => if (i % w < 4) 64f else Float.NaN)
    val img = img1("pz", b, w, h)
    val rs = Polygonize.polygonize(Seq(img).toDS, quant = 32f).collect()
    assert(rs.length == 1, s"NaN pixels must form no region: ${rs.length}")
    assert(rs.head.pixel_count == 32L)
  }

  test("toGeoJson escapes names and emits null for non-finite measures") {
    import graft.operators.VectorOps
    import graft.{PolyRow, Pt}
    val p = PolyRow(1, 0,
      Array(Array(Pt(0, 0), Pt(1, 0), Pt(1, 1), Pt(0, 1))),
      2, "O\"Brien\\tract", Double.NaN)
    val js = VectorOps.toGeoJson(Seq(p).toDS).select("geojson")
      .collect().head.getString(0)
    // must parse as strict JSON: quotes/backslashes escaped, NaN -> null
    assert(js.contains("O\\\"Brien\\\\tract"), js)
    assert(js.contains("\"measure\":null"), js)
    assert(!js.contains("NaN"), js)
  }

  test("clipToRects: a rect entirely inside a hole clips to nothing") {
    import graft.operators.VectorOps
    import graft.{PolyRow, Pt}
    import graft.core.Geom
    val holed = PolyRow(1, 0, Array(
      Array(Pt(0, 0), Pt(100, 0), Pt(100, 100), Pt(0, 100)),
      Array(Pt(40, 40), Pt(60, 40), Pt(60, 60), Pt(40, 60))), 1, "n", 0.0)
    val out = VectorOps.clipToRects(Seq(holed).toDS,
      Seq((7L, Geom.BBox(45, 45, 55, 55)))).collect()
    assert(out.isEmpty, s"phantom zero-area feature emitted: ${out.length}")
    // a rect straddling the hole boundary still clips normally
    val out2 = VectorOps.clipToRects(Seq(holed).toDS,
      Seq((8L, Geom.BBox(30, 30, 50, 50)))).collect()
    assert(out2.length == 1)
  }

  test("maskOrientation drops all-dark images instead of emitting NaN") {
    import graft.operators.{Mesh, Tiler}
    val dark = img1("dk", Array.fill(64)(0f), 8, 8)
    val lit0 = img1("lt", Array.tabulate(64)(i => if (i % 8 == i / 8) 5f else 0f), 8, 8)
    val tiles = Tiler.tiles(Seq(dark, lit0).toDS, 8, Tiler.resForCellSize(8.0))
    val rows = Mesh.maskOrientation(tiles).collect()
    assert(rows.map(_.getString(0)).toSet == Set("lt"),
      "all-dark image must be dropped, not NaN")
    assert(!rows.exists(r => r.getDouble(1).isNaN))
  }
}
