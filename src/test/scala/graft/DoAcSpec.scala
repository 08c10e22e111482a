package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.gen.GridImages
import graft.operators.Snakes

/**
 * do_ac (utilities.py:296-395) — the threshold-init ACWE composition.
 *
 * Derivation pinned here (the q_do_ac oracle only enumerates finals):
 * on the doAc fixture, init = (v < 75) selects blob1 + its value-74
 * penumbra ring, blob2, and the two specks. Step 1: c0 = 90 exactly
 * (everything outside init is background) and c1 <= ~20 (the inside is
 * blob-value dominated), so each ring pixel (v = 74, on the contour)
 * satisfies (74-c1)^2 > (74-90)^2 and flips OUT, while every blob/speck
 * contour pixel (v = 10) satisfies (10-c1)^2 < (10-90)^2 and stays.
 * From step 2 on, c1 = 10 exactly and every contour test is strict the
 * same way, so the evolution is stationary on exactly
 * blob1 ∪ blob2 ∪ specks. The polygonize + area>4 tail then drops the
 * 1-px and 2-px specks (and, via the mask=True rule, never emits the
 * background region).
 */
class DoAcSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SparkTestSession.spark

  private def imgs(n: Int) =
    spark.createDataset(GridImages.doAcImages(n).toSeq)(
      org.apache.spark.sql.Encoders.product[ImageRow])

  test("doAc: ring shed + stationary blobs; area filter drops specks") {
    val rows = Snakes.doAc(imgs(4), thresh = 75.0, iterations = 3,
      smoothing = 0).collect().groupBy(_.image_id)
    assert(rows.size == 4)
    for (i <- 0 until 4) {
      val rs = rows(f"g$i%03d").sortBy(_.pixel_count)
      assert(rs.length == 2, s"image $i: expected the two blobs")
      val b1 = GridImages.snakeB1(i.toLong); val b2 = GridImages.snakeB2(i.toLong)
      val a1 = (b1._3 - b1._1 + 1).toLong * (b1._4 - b1._2 + 1)
      val a2 = (b2._3 - b2._1 + 1).toLong * (b2._4 - b2._2 + 1)
      assert(rs.map(_.pixel_count).toSet == Set(a1, a2), s"image $i areas")
      // bbox of each surviving region = the blob's pixel-edge rectangle
      val got = rs.map { r =>
        val xs = r.ring.map(_.x); val ys = r.ring.map(_.y)
        (xs.min - GridImages.xMin(i.toLong), GridImages.yMax(i.toLong) - ys.max,
          xs.max - GridImages.xMin(i.toLong), GridImages.yMax(i.toLong) - ys.min)
      }.toSet
      val want = Set(
        (b1._1.toDouble, b1._2.toDouble, b1._3 + 1.0, b1._4 + 1.0),
        (b2._1.toDouble, b2._2.toDouble, b2._3 + 1.0, b2._4 + 1.0))
      assert(got == want, s"image $i bboxes")
    }
  }

  test("doAc threshOnly: penumbra kept (one region with blob1), no ACWE") {
    val rows = Snakes.doAc(imgs(2), thresh = 75.0, iterations = 3,
      smoothing = 0, threshOnly = true).collect().groupBy(_.image_id)
    for (i <- 0 until 2) {
      val rs = rows(f"g$i%03d")
      assert(rs.length == 2, s"image $i: blob1+ring and blob2")
      val b1 = GridImages.snakeB1(i.toLong)
      val w1 = b1._3 - b1._1 + 1; val h1 = b1._4 - b1._2 + 1
      val ringArea = w1.toLong * h1 + 2 * (w1 + h1) + 4
      assert(rs.map(_.pixel_count).toSet.contains(ringArea),
        s"image $i: blob1 region must include its penumbra under threshOnly")
    }
  }

  test("doAc area filter boundary: tiny areaThresh keeps the specks") {
    val rs = Snakes.doAc(imgs(1), thresh = 75.0, iterations = 3,
      smoothing = 0, areaThresh = 0.5).collect()
    assert(rs.length == 4, "blob1, blob2, 1-px speck, 2-px domino")
    assert(rs.map(_.pixel_count).sorted.take(2).toSeq == Seq(1L, 2L))
  }
}
