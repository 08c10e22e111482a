package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.gen.GridImages
import graft.operators.Kass

/** Kass active contour: inverse correctness, step parity against an
  * independent per-iteration linear-SOLVE implementation (different
  * algorithm, not a code copy), and the analytic 4-point circulant
  * replay that the q_kass oracle runs in SQL. */
class KassSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark

  private def matmul(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
    m.map(row => row.zip(v).map { case (a, b) => a * b }.sum)

  private def solve(m0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val m = m0.map(_.clone()); val b = b0.clone()
    for (col <- 0 until n) {
      val piv = (col until n).maxBy(r => math.abs(m(r)(col)))
      val t = m(piv); m(piv) = m(col); m(col) = t
      val tb = b(piv); b(piv) = b(col); b(col) = tb
      for (r <- col + 1 until n) {
        val f = m(r)(col) / m(col)(col)
        for (j <- col until n) m(r)(j) -= f * m(col)(j)
        b(r) -= f * b(col)
      }
    }
    val x = new Array[Double](n)
    for (r <- (n - 1) to 0 by -1) {
      var s = b(r)
      for (j <- r + 1 until n) s -= m(r)(j) * x(j)
      x(r) = s / m(r)(r)
    }
    x
  }

  test("energy-matrix inverse is an actual inverse for every BC") {
    for (bc <- Seq("periodic", "fixed", "free"); n <- Seq(5, 9)) {
      val m = Kass.energyMatrix(n, alpha = 0.7, beta = 0.3, bc = bc)
      for (i <- 0 until n) m(i)(i) += 0.9
      val inv = Kass.invert(m)
      for (i <- 0 until n; j <- 0 until n) {
        val e = (0 until n).map(k => m(i)(k) * inv(k)(j)).sum
        assert(math.abs(e - (if (i == j) 1.0 else 0.0)) < 1e-10, s"$bc $n ($i,$j)")
      }
    }
  }

  test("evolve equals an independent solve-per-iteration implementation") {
    val w = 30; val h = 22
    val img = Array.tabulate(w * h)(p => GridImages.value(3, 0, p % w, p / w))
    val init = Array.tabulate(12) { k =>
      val t = 2 * math.Pi * k / 12
      (10.0 + 6.0 * math.sin(t), 14.0 + 9.0 * math.cos(t))
    }
    for (bc <- Seq("periodic", "fixed", "free");
         (wl, we) <- Seq((0.0, 1.0), (0.5, 2.0), (0.0, 0.0))) {
      val got = Kass.evolve(img, w, h, init, alpha = 0.05, beta = 0.2,
        wLine = wl, wEdge = we, gamma = 0.5, maxPxMove = 1.0,
        iterations = 15, convergence = 0.0, bc = bc)
      // independent: rebuild the energy image the same way, but step by
      // SOLVING (A + gamma I) z = gamma x + f each iteration
      val m = Kass.energyMatrix(init.length, 0.05, 0.2, bc)
      for (i <- init.indices) m(i)(i) += 0.5
      // energy image: wEdge * sobel/8 magnitude + wLine * img
      def v(x: Int, y: Int) =
        img(math.min(h - 1, math.max(0, y)) * w + math.min(w - 1, math.max(0, x))).toDouble
      val energy = Array.tabulate(w * h) { p =>
        val x = p % w; val y = p / w
        val sx = (v(x + 1, y - 1) + 2 * v(x + 1, y) + v(x + 1, y + 1)
          - v(x - 1, y - 1) - 2 * v(x - 1, y) - v(x - 1, y + 1)) / 8.0
        val sy = (v(x - 1, y + 1) + 2 * v(x, y + 1) + v(x + 1, y + 1)
          - v(x - 1, y - 1) - 2 * v(x, y - 1) - v(x + 1, y - 1)) / 8.0
        we * math.hypot(sx, sy) + wl * img(p)
      }
      def g(p: Int, axis: Int): Double = {
        val x = p % w; val y = p / w
        if (axis == 0) {
          if (y == 0) energy(p + w) - energy(p)
          else if (y == h - 1) energy(p) - energy(p - w)
          else (energy(p + w) - energy(p - w)) / 2
        } else {
          if (x == 0) energy(p + 1) - energy(p)
          else if (x == w - 1) energy(p) - energy(p - 1)
          else (energy(p + 1) - energy(p - 1)) / 2
        }
      }
      def sample(rr: Double, cc: Double, axis: Int): Double = {
        val r1 = math.min(math.max(rr, 0.0), h - 1.0)
        val c1 = math.min(math.max(cc, 0.0), w - 1.0)
        val r0 = math.min(h - 2, math.max(0, r1.toInt))
        val c0 = math.min(w - 2, math.max(0, c1.toInt))
        val fr = r1 - r0; val fc = c1 - c0
        g(r0 * w + c0, axis) * (1 - fr) * (1 - fc) +
          g(r0 * w + c0 + 1, axis) * (1 - fr) * fc +
          g((r0 + 1) * w + c0, axis) * fr * (1 - fc) +
          g((r0 + 1) * w + c0 + 1, axis) * fr * fc
      }
      var r = init.map(_._1); var c = init.map(_._2)
      val n = init.length
      for (_ <- 0 until 15) {
        val fr = new Array[Double](n); val fc = new Array[Double](n)
        if (wl != 0 || we != 0) {
          for (i <- 0 until n) { fr(i) = sample(r(i), c(i), 0); fc(i) = sample(r(i), c(i), 1) }
          if (bc == "fixed") { fr(0) = 0; fc(0) = 0; fr(n - 1) = 0; fc(n - 1) = 0 }
          if (bc == "free") { fr(0) *= 2; fc(0) *= 2; fr(n - 1) *= 2; fc(n - 1) *= 2 }
        }
        val rn = solve(m, r.zip(fr).map { case (a, b) => 0.5 * a + b })
        val cn = solve(m, c.zip(fc).map { case (a, b) => 0.5 * a + b })
        for (i <- 0 until n) {
          var dr = math.tanh(rn(i) - r(i)); var dc = math.tanh(cn(i) - c(i))
          if (bc == "fixed" && (i == 0 || i == n - 1)) { dr = 0; dc = 0 }
          r(i) += dr; c(i) += dc
        }
      }
      for (i <- 0 until n) {
        assert(math.abs(got(i)._1 - r(i)) < 1e-8, s"$bc ($wl,$we) r$i")
        assert(math.abs(got(i)._2 - c(i)) < 1e-8, s"$bc ($wl,$we) c$i")
      }
    }
  }

  test("flat-image 4-point periodic snake equals the analytic circulant replay") {
    // alpha=2, beta=0.5, gamma=1 -> circulant eigenvalues 1, 7, 17, 7;
    // the q_kass oracle replays this same recurrence in SQL
    val d0 = (1.0 / 1 + 2.0 / 7 + 1.0 / 17) / 4
    val d1 = (1.0 / 1 - 1.0 / 17) / 4
    val d2 = (1.0 / 1 - 2.0 / 7 + 1.0 / 17) / 4
    val d = Array(d0, d1, d2, d1)
    val img = Array.fill(40 * 30)(10f)
    val init = Array((20.25, 4.75), (20.25, 30.25), (7.75, 30.25), (7.75, 4.75))
    val got = Kass.evolve(img, 40, 30, init, alpha = 2.0, beta = 0.5,
      wLine = 0.0, wEdge = 0.0, gamma = 1.0, maxPxMove = 1.0,
      iterations = 6, convergence = 0.1, bc = "periodic")
    var r = init.map(_._1); var c = init.map(_._2)
    for (_ <- 0 until 6) {
      val rn = Array.tabulate(4)(i => (0 until 4).map(j => d((i - j + 4) % 4) * r(j)).sum)
      val cn = Array.tabulate(4)(i => (0 until 4).map(j => d((i - j + 4) % 4) * c(j)).sum)
      r = r.zip(rn).map { case (a, b) => a + math.tanh(b - a) }
      c = c.zip(cn).map { case (a, b) => a + math.tanh(b - a) }
    }
    for (i <- 0 until 4) {
      assert(math.abs(got(i)._1 - r(i)) < 1e-9)
      assert(math.abs(got(i)._2 - c(i)) < 1e-9)
    }
  }

  test("convergence early-stop fires and is deterministic") {
    val img = Array.fill(20 * 20)(5f)
    val init = Array.tabulate(8) { k =>
      val t = 2 * math.Pi * k / 8
      (10.0 + 4 * math.sin(t), 10.0 + 4 * math.cos(t))
    }
    def run() = Kass.evolve(img, 20, 20, init, alpha = 1.0, beta = 0.0,
      wLine = 0, wEdge = 0, gamma = 0.1, iterations = 2500,
      convergence = 0.1, bc = "periodic")
    val a = run(); val b = run()
    assert(a.toSeq == b.toSeq)
    // converged: all points nearly coincide at the centroid region
    val rs = a.map(_._1); val cs = a.map(_._2)
    assert(rs.max - rs.min < 1.0 && cs.max - cs.min < 1.0)
  }
}
