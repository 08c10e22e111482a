package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.gen.GridImages
import graft.operators.{Hough, Ransac}

/** RANSAC strip lines: the engine vs (a) the closed-form burned set of
  * the planted-vertical fixture, (b) an independent naive exhaustive
  * implementation on pseudorandom masks, (c) determinism of the sampled
  * path. */
class RansacSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("burned lines on the planted fixture equal column a at the edge rows") {
    val n = 4
    val ds = spark.createDataset(GridImages.ransacImages(n).toSeq)
    val got = Ransac.lines(ds, binwidth = 40, orient = "col", thresh = 50.0)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    val expect = (for {
      i <- 0 until n
      s <- 0 to 1
    } yield {
      val a = GridImages.ransacA(i, s)
      val rows = (0 until 48).filter(y =>
        (0 until 80).exists(x => x / 40 == s && GridImages.ransacBright(i, x, y)))
      rows.map(y => (f"g$i%03d", s, a, y))
    }).flatten.toSet
    assert(got == expect)
  }

  test("exhaustive fit equals an independent naive argmax on pseudorandom masks") {
    val imgs = GridImages.images(3, bands = 1)
    val ds = spark.createDataset(imgs.toSeq)
    // pseudorandom mask; exhaustiveMax = MaxValue forces the all-pairs
    // path so parity with the naive argmax holds at any density
    val edgePx = Hough.edgePixels(ds, thresh = 90.0)
    val got = Ransac.fit(edgePx, binwidth = 40, orient = "col", residual = 1.0,
        exhaustiveMax = Int.MaxValue)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getLong(6))).toMap
    // naive: recompute from decoded pixels with fresh loops
    val naive = collection.mutable.Map.empty[(String, Int), (Int, Int, Int, Int, Long)]
    imgs.foreach { im =>
      val v = graft.core.PixelCodec.decode(im.bytes, im.fmt, im.w, im.h).bands(0)
      for (s <- 0 until (im.w + 39) / 40) {
        val pts = (for {
          y <- 0 until im.h; x <- 0 until im.w
          if x / 40 == s && v(y * im.w + x) > 90.0
        } yield (x, y)).sortBy(p => p._2 * im.w + p._1)
        var best: Option[(Long, Int, Int)] = None
        for (a <- pts.indices; b <- pts.indices if a < b
             if pts(a)._2 != pts(b)._2) {
          val (xa, ya) = pts(a); val (xb, yb) = pts(b)
          val cnt = pts.count { case (x, y) =>
            val cross = (xb - xa).toDouble * (y - ya) - (yb - ya).toDouble * (x - xa)
            cross * cross <= 1.0 * ((xb - xa).toDouble * (xb - xa) + (yb - ya).toDouble * (yb - ya))
          }.toLong
          if (best.forall(_._1 < cnt)) best = Some((cnt, a, b))
        }
        best.foreach { case (cnt, a, b) =>
          naive((im.image_id, s)) = (pts(a)._1, pts(a)._2, pts(b)._1, pts(b)._2, cnt)
        }
      }
    }
    assert(got == naive.toMap)
  }

  test("sampled path (n > exhaustiveMax) is deterministic in the seed") {
    val ds = spark.createDataset(GridImages.images(2, bands = 1).toSeq)
    val edgePx = Hough.edgePixels(ds, thresh = 40.0) // dense: > 64 pts/strip
    def run() = Ransac.fit(edgePx, binwidth = 40, exhaustiveMax = 16,
      maxTrials = 500, seed = 7L).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getLong(6))).toSet
    assert(run() == run())
  }
}
