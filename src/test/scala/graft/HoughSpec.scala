package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.gen.GridImages
import graft.operators.{Edge, Hough}

/** Hough transform: relational accumulator + NMS peaks vs a naive Scala
  * accumulator, closed-form peak sets on the canny step fixture, and the
  * full segmentation tail vs the closed-form grid cells. */
class HoughSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("accumulator equals a naive per-pixel vote loop (incl. diagonal theta)") {
    val imgs = GridImages.images(3, bands = 1)
    val ds = spark.createDataset(imgs.toSeq)
    val thetas = Seq(0.0, math.Pi / 4, math.Pi / 2)
    val masks = ds.collect().map { im =>
      val v = graft.core.PixelCodec.decode(im.bytes, im.fmt, im.w, im.h).bands(0)
      im.image_id -> (v, im.w, im.h)
    }.toMap
    // bright = v > 60 — a sparse pseudorandom mask
    val edgePx = Hough.edgePixels(ds, thresh = 60.0)
    val acc = Hough.accumulate(edgePx, thetas, rhoBin = 2.0).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    val naive = collection.mutable.Map.empty[(String, Int, Int), Long]
    masks.foreach { case (id, (v, w, h)) =>
      for (p <- v.indices if v(p) > 60.0; ti <- thetas.indices) {
        val x = p % w; val y = p / w
        val rho = x * math.cos(thetas(ti)) + y * math.sin(thetas(ti))
        val ri = math.floor(rho / 2.0 + 0.5).toInt
        val k = (id, ti, ri)
        naive(k) = naive.getOrElse(k, 0L) + 1
      }
    }
    assert(acc == naive.toMap)
  }

  test("peaks on the canny step fixture match the closed-form 5-peak set") {
    val n = 6
    val ds = spark.createDataset(GridImages.edgeImages(n).toSeq)
    val edges = Edge.canny(ds, lowT = 20, highT = 40, sigma = 0)
    val acc = Hough.accumulate(Hough.edgePixels(edges),
      thetas = Seq(0.0, math.Pi / 2), rhoBin = 1.0)
    val got = Hough.peaks(acc, minVotes = 30, nTheta = 0, nRho = 1).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val expect = (0 until n).flatMap { i =>
      val id = f"g$i%03d"
      val c1 = GridImages.edgeC1(i); val c3 = GridImages.edgeC3(i)
      val k = GridImages.edgeK(i)
      Seq((id, 0, c1 - 1, 48L), (id, 0, c1, 48L), (id, 0, c3, 48L),
        (id, 1, k - 1, 82L - c3), (id, 1, k, 82L - c3))
    }.toSet
    assert(got == expect)
  }

  test("drawLine: inclusive endpoints, 8-connected, expected diagonal") {
    val w = 10; val h = 8
    val m = new Array[Boolean](w * h)
    Hough.drawLine(m, w, h, 1, 1, 7, 4)
    val pts = m.zipWithIndex.collect { case (true, p) => (p % w, p / w) }.toSet
    assert(pts.contains((1, 1)) && pts.contains((7, 4)))
    // 8-connectivity of consecutive x columns
    for (x <- 1 to 7) assert(pts.exists(_._1 == x), s"column $x not covered")
    val m2 = new Array[Boolean](w * h)
    Hough.drawLine(m2, w, h, 3, 0, 3, 7)
    assert((0 until 8).forall(y => m2(y * w + 3)))
  }

  test("burnLine clips geometrically: a 45-degree line keeps its slope") {
    val w = 20; val h = 20
    val m = new Array[Boolean](w * h)
    // x cos(pi/4) + y sin(pi/4) = 10 is the anti-diagonal x + y = 14.14;
    // the box-clipped segment runs (0,14) -> (14,0). The old endpoint
    // clamp distorted the slope and burned toward (19,0).
    Hough.burnLine(m, w, h, math.Pi / 4, 10.0)
    val pts = m.zipWithIndex.collect { case (true, p) => (p % w, p / w) }.toSet
    assert(pts.contains((0, 14)) && pts.contains((14, 0)))
    assert(pts.forall { case (x, y) => math.abs(x + y - 14) <= 1 }, pts)
    assert(!pts.contains((19, 0)))
    // a line that misses the box entirely burns nothing
    val m2 = new Array[Boolean](w * h)
    Hough.burnLine(m2, w, h, math.Pi / 4, 40.0) // x + y = 56.6 > 2*19
    assert(!m2.exists(identity))
  }

  test("segments: an image with zero peaks is one whole-image segment") {
    // reference chain: no lines burned -> invert -> all-ones -> label
    // yields one full-extent component; an inner join would drop it
    val ds = spark.createDataset(GridImages.lineImages(2).toSeq)
    val thetas = Seq(0.0, math.Pi / 2)
    val acc = Hough.accumulate(Hough.edgePixels(ds, thresh = 50.0), thetas, 1.0)
    val pk = Hough.peaks(acc, minVotes = 1000000, nTheta = 0, nRho = 1)
    assert(pk.isEmpty)
    val got = Hough.segments(ds, pk, thetas, rhoBin = 1.0, minArea = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getInt(5))).toSet
    val (w, h) = (GridImages.W, GridImages.H)
    assert(got == (0 until 2).map(i =>
      (f"g$i%03d", w.toLong * h, 0, 0, w - 1, h - 1)).toSet)
  }

  test("segments on the line fixture equal the closed-form grid cells") {
    val n = 6
    val ds = spark.createDataset(GridImages.lineImages(n).toSeq)
    val thetas = Seq(0.0, math.Pi / 2)
    val acc = Hough.accumulate(Hough.edgePixels(ds, thresh = 50.0), thetas, 1.0)
    val pk = Hough.peaks(acc, minVotes = 40, nTheta = 0, nRho = 1)
    val got = Hough.segments(ds, pk, thetas, rhoBin = 1.0, minArea = 20).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5))).toSet
    val expect = (0 until n).flatMap { i =>
      val id = f"g$i%03d"
      val a = GridImages.lineA(i); val b = GridImages.lineB(i)
      val xs = (0 to 5).map {
        case 0 => (0, a - 1)
        case j => (a + 16 * (j - 1) + 1, if (j == 5) 79 else a + 16 * j - 1)
      }
      val ys = (0 to 4).map {
        case 0 => (0, b - 1)
        case j => (b + 12 * (j - 1) + 1, if (j == 4) 47 else b + 12 * j - 1)
      }
      for {
        (x0, x1) <- xs; (y0, y1) <- ys
        area = (x1 - x0 + 1).toLong * (y1 - y0 + 1)
        if area >= 20
      } yield (id, area, x0, y0, x1, y1)
    }.toSet
    assert(got == expect)
  }
}
