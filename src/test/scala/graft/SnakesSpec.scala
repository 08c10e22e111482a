package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gen.GridImages
import graft.operators.Snakes

/** Morphological snakes: engine kernels vs independent naive
  * reimplementations (set-based morphology, double-precision numpy
  * gradient emulation), the closed-form fixture convergence, EDT vs
  * brute force, and the buf2 init paths. */
class SnakesSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // ---- independent naive kernels ----
  private def sq(d: Double) = d * d

  private type Cell = (Int, Int)
  private val lineSes: Seq[Seq[Cell]] = Seq(
    Seq((-1, 0), (0, 0), (1, 0)), Seq((0, -1), (0, 0), (0, 1)),
    Seq((-1, -1), (0, 0), (1, 1)), Seq((1, -1), (0, 0), (-1, 1)))

  private def toSet(u: Array[Int], w: Int): Set[Cell] =
    u.indices.collect { case p if u(p) == 1 => (p % w, p / w) }.toSet
  private def toArr(s: Set[Cell], w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(p => if (s((p % w, p / w))) 1 else 0)

  private def eroSet(s: Set[Cell], se: Seq[Cell], w: Int, h: Int): Set[Cell] =
    (for {
      x <- 0 until w; y <- 0 until h
      if se.forall { case (dx, dy) =>
        val xx = x + dx; val yy = y + dy
        xx >= 0 && xx < w && yy >= 0 && yy < h && s((xx, yy))
      }
    } yield (x, y)).toSet
  private def dilSet(s: Set[Cell], se: Seq[Cell], w: Int, h: Int): Set[Cell] =
    (for {
      x <- 0 until w; y <- 0 until h
      if se.exists { case (dx, dy) => s((x + dx, y + dy)) }
    } yield (x, y)).toSet

  private def siSet(s: Set[Cell], w: Int, h: Int): Set[Cell] =
    lineSes.map(eroSet(s, _, w, h)).reduce(_ union _)
  private def isSet(s: Set[Cell], w: Int, h: Int): Set[Cell] =
    lineSes.map(dilSet(s, _, w, h)).reduce(_ intersect _)

  private def npGrad(a: Array[Double], w: Int, h: Int): (Array[Double], Array[Double]) = {
    val gx = Array.tabulate(w * h) { p =>
      val x = p % w
      if (w == 1) 0.0
      else if (x == 0) a(p + 1) - a(p)
      else if (x == w - 1) a(p) - a(p - 1)
      else (a(p + 1) - a(p - 1)) / 2.0
    }
    val gy = Array.tabulate(w * h) { p =>
      val y = p / w
      if (h == 1) 0.0
      else if (y == 0) a(p + w) - a(p)
      else if (y == h - 1) a(p) - a(p - w)
      else (a(p + w) - a(p - w)) / 2.0
    }
    (gx, gy)
  }

  private def naiveAcwe(img: Array[Double], w: Int, h: Int, u0: Array[Int],
                        iters: Int, sm: Int, l1: Double, l2: Double): Array[Int] = {
    var u = u0.clone(); var curv = 0
    for (_ <- 0 until iters) {
      val ins = u.indices.filter(u(_) == 1); val outs = u.indices.filter(u(_) == 0)
      val c1 = ins.map(img).sum / (ins.size + 1e-8)
      val c0 = outs.map(img).sum / (outs.size + 1e-8)
      val (gx, gy) = npGrad(u.map(_.toDouble), w, h)
      val nu = u.clone()
      for (p <- u.indices) {
        if (math.abs(gx(p)) + math.abs(gy(p)) > 0) {
          val a = l1 * sq(img(p) - c1) - l2 * sq(img(p) - c0)
          if (a < 0) nu(p) = 1 else if (a > 0) nu(p) = 0
        }
      }
      u = nu
      for (_ <- 0 until sm) {
        val s = toSet(u, w)
        val s2 = if (curv % 2 == 0) siSet(isSet(s, w, h), w, h)
                 else isSet(siSet(s, w, h), w, h)
        u = toArr(s2, w, h); curv += 1
      }
    }
    u
  }

  private def naiveGac(gimg: Array[Double], w: Int, h: Int, u0: Array[Int],
                       iters: Int, sm: Int, thr: Double, balloon: Int): Array[Int] = {
    var u = u0.clone(); var curv = 0
    val (dgx, dgy) = npGrad(gimg, w, h)
    val full = for { dy <- -1 to 1; dx <- -1 to 1 } yield (dx, dy)
    for (_ <- 0 until iters) {
      if (balloon != 0) {
        val s = toSet(u, w)
        val aux = if (balloon > 0) dilSet(s, full, w, h) else eroSet(s, full, w, h)
        for (p <- u.indices if gimg(p) > thr / math.abs(balloon))
          u(p) = if (aux((p % w, p / w))) 1 else 0
      }
      val (gx, gy) = npGrad(u.map(_.toDouble), w, h)
      val nu = u.clone()
      for (p <- u.indices) {
        val a = dgx(p) * gx(p) + dgy(p) * gy(p)
        if (a > 0) nu(p) = 1 else if (a < 0) nu(p) = 0
      }
      u = nu
      for (_ <- 0 until sm) {
        val s = toSet(u, w)
        val s2 = if (curv % 2 == 0) siSet(isSet(s, w, h), w, h)
                 else isSet(siSet(s, w, h), w, h)
        u = toArr(s2, w, h); curv += 1
      }
    }
    u
  }

  // pseudorandom window from the grid-image formula
  private def window(seed: Int, w: Int, h: Int): Array[Float] =
    Array.tabulate(w * h)(p => GridImages.value(seed.toLong, 0, p % w, p / w))

  test("ACWE kernel equals the naive reimplementation") {
    val w = 26; val h = 18
    for (seed <- 0 until 3; sm <- Seq(0, 1, 2); (l1, l2) <- Seq((1.0, 1.0), (2.0, 1.0))) {
      val img = window(seed, w, h)
      val init = img.map(v => if (v > 48f) 1.toByte else 0.toByte)
      val got = Snakes.acwe(img, w, h, init, iterations = 6, smoothing = sm,
        lambda1 = l1, lambda2 = l2)
      val exp = naiveAcwe(img.map(_.toDouble), w, h, init.map(_.toInt),
        iters = 6, sm = sm, l1 = l1, l2 = l2)
      assert(got.map(_.toInt).toSeq == exp.toSeq, s"seed=$seed sm=$sm l=($l1,$l2)")
    }
  }

  test("GAC kernel equals the naive reimplementation (auto + manual threshold)") {
    val w = 24; val h = 16
    for (seed <- 0 until 3; balloon <- Seq(-1, 0, 1); sm <- Seq(0, 1)) {
      val img = window(seed + 5, w, h)
      val gimg = Snakes.inverseGaussianGradient(img, w, h, alpha = 100, sigma = 2)
      val thr = if (seed == 0) 0.5 else Snakes.percentile(gimg, 40.0)
      val init = img.map(v => if (v > 40f) 1.toByte else 0.toByte)
      val got = Snakes.gac(gimg, w, h, init, iterations = 5, smoothing = sm,
        threshold = thr, balloon = balloon)
      val exp = naiveGac(gimg.map(_.toDouble), w, h, init.map(_.toInt),
        iters = 5, sm = sm, thr = thr, balloon = balloon)
      assert(got.map(_.toInt).toSeq == exp.toSeq, s"seed=$seed b=$balloon sm=$sm")
    }
  }

  test("EDT equals brute force, including empty and full masks") {
    val w = 17; val h = 11
    val masks = Seq(
      Array.tabulate(w * h)(p => if (GridImages.value(9, 0, p % w, p / w) > 55) 1.toByte else 0.toByte),
      Array.fill(w * h)(1.toByte),
      Array.fill(w * h)(0.toByte))
    masks.foreach { m =>
      val got = Snakes.edtSq(m, w, h)
      val zeros = (0 until w * h).filter(m(_) == 0).map(p => (p % w, p / w))
      for (p <- 0 until w * h) {
        val exp =
          if (zeros.isEmpty) Long.MaxValue / 4
          else zeros.map { case (zx, zy) =>
            val dx = (p % w - zx).toLong; val dy = (p / w - zy).toLong
            dx * dx + dy * dy
          }.min
        assert(got(p) == exp, s"p=$p")
      }
    }
  }

  test("fixture: ACWE shrinks A to blob1 and grows B to blob2") {
    // C is excluded: on an exactly-flat region the reference's 1e-8
    // denominator asymmetry drives a slow epsilon-sign evolution (the
    // kernel-parity test covers that regime); only A and B have a
    // robust closed-form fixpoint.
    val n = 4
    val imgs = spark.createDataset(GridImages.snakeImages(n).toSeq)
    val polys = spark.createDataset(GridImages.snakePolys(n).toSeq)
      .filter(col("poly_id") % 3 < 2).as[PolyRow]
    val got = Snakes.msSnake(imgs, polys, algo = "ACWE", buf1 = 4.0,
        iterations = 12, smoothing = 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val expect = (for (i <- 0 until n) yield {
      def rect(pid: Long, r: (Int, Int, Int, Int)) =
        for { x <- r._1 to r._3; y <- r._2 to r._4 }
          yield (f"g$i%03d", pid, x, y)
      rect(i * 3L, GridImages.snakeB1(i.toLong)) ++
        rect(i * 3L + 1, GridImages.snakeB2(i.toLong))
    }).flatten.toSet
    assert(got == expect)
  }

  test("fixture: GAC balloon erosion shrinks C by one ring per iteration") {
    val n = 4
    val imgs = spark.createDataset(GridImages.snakeImages(n).toSeq)
    val polysC = spark.createDataset(GridImages.snakePolys(n).toSeq)
      .filter(col("poly_id") % 3 === 2).as[PolyRow]
    val got = Snakes.msSnake(imgs, polysC, algo = "GAC", buf1 = 2.0,
        iterations = 3, smoothing = 0, threshold = 0.5, balloon = -1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val expect = (for (i <- 0 until n) yield {
      val (x0, y0, x1, y1) = GridImages.snakePolyC(i.toLong)
      for { x <- x0 + 3 to x1 - 3; y <- y0 + 3 to y1 - 3 }
        yield (f"g$i%03d", i * 3L + 2, x, y)
    }).flatten.toSet
    assert(got == expect)
  }

  test("buf2 init paths: EDT grow has rounded corners, EDT shrink peels a ring") {
    val n = 3
    val imgs = spark.createDataset(GridImages.snakeImages(n).toSeq)
    val polys = spark.createDataset(GridImages.snakePolys(n).toSeq)
    val polysA = polys.filter(col("poly_id") % 3 === 0).as[PolyRow]
    val polysB = polys.filter(col("poly_id") % 3 === 1).as[PolyRow]
    val grow = Snakes.msSnake(imgs, polysA, buf1 = 4.0, buf2 = 2.5, iterations = 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val expGrow = (for (i <- 0 until n) yield {
      val (x0, y0, x1, y1) = GridImages.snakePolyA(i.toLong)
      for {
        x <- x0 - 3 to x1 + 3; y <- y0 - 3 to y1 + 3
        dx = math.max(0, math.max(x0 - x, x - x1))
        dy = math.max(0, math.max(y0 - y, y - y1))
        if dx * dx + dy * dy <= 6.25
      } yield (f"g$i%03d", i * 3L, x, y)
    }).flatten.toSet
    assert(grow == expGrow)
    val shrink = Snakes.msSnake(imgs, polysB, buf1 = 4.0, buf2 = -1.5, iterations = 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val expShrink = (for (i <- 0 until n) yield {
      val (x0, y0, x1, y1) = GridImages.snakePolyB(i.toLong)
      for { x <- x0 + 1 to x1 - 1; y <- y0 + 1 to y1 - 1 }
        yield (f"g$i%03d", i * 3L + 1, x, y)
    }).flatten.toSet
    assert(shrink == expShrink)
  }
}
